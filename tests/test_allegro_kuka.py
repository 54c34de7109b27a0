"""AllegroKuka Reorientation tests: scene statics, staged reward gating,
tolerance curriculum persistence (reference allegro_kuka_base.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.tasks.allegro_kuka import TABLE_TOP, OBJ_SIZE


def make(num_envs=4, **env_kw):
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(
        ["task=AllegroKukaReorientation", f"num_envs={num_envs}"]
    )["task"]
    cfg["env"].update(env_kw)
    return task_map["AllegroKukaReorientation"](cfg)


def test_contract_and_cube_rests_on_table():
    env = make()
    assert env.num_obs == 117 and env.num_acts == 23
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 117)
    step = jax.jit(env.step)
    for _ in range(25):
        state, obs, rew, done, ex = step(state, jnp.zeros((4, 23)))
    assert np.isfinite(np.asarray(obs)).all()
    cz = np.asarray(state.sim.q[:, env.oq + 2])
    assert np.allclose(cz, TABLE_TOP + OBJ_SIZE / 2, atol=5e-3)
    assert "true_objective" in ex


def test_keypoint_reward_gated_on_lifting():
    env = make(num_envs=1)
    state, obs = env.reset(jax.random.PRNGKey(1))
    task = jax.tree.map(lambda x: x[0], state.task)
    q = state.sim.q[0]
    qd = state.sim.qd[0]
    kin = None  # reward uses kin only for fingertips -> build via env
    from isaacgymenvs_tpu.engine import dynamics as dyn

    kin = dyn.forward_kinematics(env.model, q, qd)
    # not lifted: keypoint reward contributes 0 even if kp dist improved
    task = dict(task)
    task["closest_kp_dist"] = jnp.asarray(10.0)
    task["lifted"] = jnp.asarray(False)
    r_unlifted, _, t1 = env.reward_done(
        obs[0], q, qd, kin, None, task, jnp.zeros(23), jnp.asarray(1)
    )
    task2 = dict(task)
    task2["lifted"] = jnp.asarray(True)
    task2["closest_tip_dist"] = jnp.zeros(4)  # kill approach reward
    r_lifted, _, t2 = env.reward_done(
        obs[0], q, qd, kin, None, task2, jnp.zeros(23), jnp.asarray(1)
    )
    # lifted branch earns the (large) keypoint delta, unlifted does not
    assert float(r_lifted) > float(r_unlifted) + 100.0


def test_tolerance_curriculum_persists_across_resets():
    env = make(num_envs=4, episodeLength=3)
    state, obs = env.reset(jax.random.PRNGKey(2))
    tighter = jnp.full(4, 0.02)
    state = state.replace(task={**state.task, "tolerance": tighter})
    step = jax.jit(env.step)
    for _ in range(8):  # several episode boundaries
        state, obs, rew, done, ex = step(state, jnp.zeros((4, 23)))
    # resample_init carried the tightened tolerance through resets
    assert np.allclose(np.asarray(state.task["tolerance"]), 0.02)


def test_regrasping_success_ends_episode_and_carries_successes():
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(["task=AllegroKukaRegrasping", "num_envs=4"])["task"]
    env = task_map["AllegroKukaRegrasping"](cfg)
    assert env.num_keypoints == 1 and env.num_obs == 99
    state, obs = env.reset(jax.random.PRNGKey(3))
    # fake a success flag + accumulated successes, then force a reset
    task = dict(state.task)
    task["last_success"] = jnp.array([True, False, False, False])
    task["successes"] = jnp.array([3.0, 2.0, 0.0, 0.0])
    state = state.replace(
        task=task, reset_buf=jnp.array([True, True, False, False])
    )
    step = jax.jit(env.step)
    state, obs, rew, done, ex = step(state, jnp.zeros((4, 23)))
    succ = np.asarray(state.task["successes"])
    # env 0 reset after a success -> count carried; env 1 reset after a
    # failure -> count cleared
    assert succ[0] == 3.0 and succ[1] == 0.0


def test_initial_state_bank_roundtrip(tmp_path):
    """saveStates/loadInitialStates (reference allegro_kuka_base.py:95-101,
    1493-1600): accumulate rollout snapshots, dump to a bank file, then a
    loadInitialStates env resets from bank rows instead of random spawns."""
    bank = str(tmp_path / "kuka_states.npz")
    env = make(num_envs=2, saveStates=True, saveStatesFile=bank)
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(25):  # > 20 snapshots so the dump sampling rule fires
        state, obs, rew, done, ex = step(state, jnp.zeros((2, 23)))
        env.accumulate_env_states(state)
    n = env.dump_env_states(rng=0)
    assert n == 2 * 2  # 25//10 = 2 snapshots per env
    # append-on-dump: a second accumulation grows the same file
    for _ in range(25):
        state, obs, rew, done, ex = step(state, jnp.zeros((2, 23)))
        env.accumulate_env_states(state)
    n2 = env.dump_env_states(rng=1)
    assert n2 == 8

    env2 = make(num_envs=4, loadInitialStates=True, loadStatesFile=bank)
    state2, obs2 = env2.reset(jax.random.PRNGKey(2))
    data = np.load(bank)
    q2 = np.asarray(state2.sim.q)  # (4, nq)
    for e in range(4):
        dmin = np.abs(data["q"] - q2[e][None]).max(axis=-1).min()
        assert dmin < 1e-5, f"env {e} q not from bank (min dev {dmin})"
    assert np.isfinite(np.asarray(obs2)).all()


def test_save_states_wired_into_train_loop(tmp_path, monkeypatch):
    """saveStates=True + saveStatesFile wires snapshot accumulation into
    PPO.train (one per epoch) and dumps through the task's sampling rule
    at exit (reference auto-accumulates in post_physics_step and dumps at
    reset; the TPU cadence is per-epoch — learn/ppo.py train loop)."""
    from isaacgymenvs_tpu.learn import PPO

    bank = str(tmp_path / "bank.npz")
    env = make(num_envs=2, saveStates=True, saveStatesFile=bank)
    calls = {"acc": 0, "dump": 0}
    real_acc = env.accumulate_env_states
    monkeypatch.setattr(
        env, "accumulate_env_states",
        lambda s: (calls.__setitem__("acc", calls["acc"] + 1), real_acc(s)),
    )
    monkeypatch.setattr(
        env, "dump_env_states",
        lambda *a, **k: calls.__setitem__("dump", calls["dump"] + 1),
    )
    agent = PPO(env, {"config": {"horizon_length": 4, "minibatch_size": 8,
                                 "mini_epochs": 1, "max_epochs": 2}}, seed=0)
    agent.train(max_epochs=2, log_every=100)
    assert calls["acc"] == 2      # one snapshot per epoch
    assert calls["dump"] == 1     # final dump at exit
    assert len(env._episode_q) == 2
