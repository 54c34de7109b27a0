"""Env-contract tests (SURVEY.md section 4 item c): obs dims, reset
semantics, reward finiteness, timeout flag semantics matching the
reference vec_task.py:393-394."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.tasks import task_map


def make(name, num_envs=8, **env_kw):
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config([f"task={name}", f"num_envs={num_envs}"])["task"]
    cfg["env"].update(env_kw)
    return task_map[name](cfg)


@pytest.mark.parametrize(
    "name,num_obs,num_acts",
    [
        ("Cartpole", 4, 1),
        ("Ant", 60, 8),
        ("Humanoid", 108, 21),
        ("Anymal", 48, 12),
        ("BallBalance", 24, 3),
        ("Ingenuity", 13, 6),
        ("Quadcopter", 21, 12),
        ("ShadowHand", 211, 20),
        ("AllegroHand", 88, 16),
        ("AllegroHandDextremeADR", 47, 16),
        ("AllegroKukaReorientation", 117, 23),
        ("AllegroKukaRegrasping", 99, 23),
        ("AllegroKukaThrow", 99, 23),
        ("AnymalTerrain", 188, 12),
        ("HumanoidAMP", 105, 28),
        ("FactoryTaskNutBoltPick", 20, 12),
        ("FrankaCabinet", 23, 9),
        ("FrankaCubeStack", 19, 7),
        ("Trifinger", 41, 9),
    ],
)
def test_env_contract(name, num_obs, num_acts):
    env = make(name)
    assert env.num_obs == num_obs and env.num_acts == num_acts
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, num_obs)
    step = jax.jit(env.step)
    # RANDOM actions, not zeros: exercises the control path + contact
    # dynamics off the resting manifold (VERDICT round-1 test-depth gap)
    key = jax.random.PRNGKey(7)
    for _ in range(3):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (8, num_acts), minval=-1.0, maxval=1.0)
        state, obs, rew, done, extras = step(state, a)
    assert obs.shape == (8, num_obs)
    assert rew.shape == (8,) and done.shape == (8,)
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()
    assert np.isfinite(np.asarray(state.sim.q)).all()
    assert "time_outs" in extras


def test_timeout_semantics():
    env = make("Cartpole", num_envs=4, episodeLength=5)
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    # done fires when progress >= episodeLength - 1, i.e. at the 4th step
    for i in range(1, 5):
        state, obs, rew, done, extras = step(state, jnp.zeros((4, 1)))
        if i < 4:
            assert not bool(np.asarray(done).any())
    assert bool(np.asarray(done).all())
    assert bool(np.asarray(extras["time_outs"]).all())
    # next step: envs auto-reset -> progress back to 0
    state, obs, rew, done, extras = step(state, jnp.zeros((4, 1)))
    assert np.asarray(state.progress).max() == 0
    assert not bool(np.asarray(done).any())


def test_partial_reset_only_touches_done_envs():
    env = make("Cartpole", num_envs=4)
    state, obs = env.reset(jax.random.PRNGKey(2))
    # force env 0 terminal by driving cart out of bounds
    q = state.sim.q.at[0, 0].set(10.0)
    state = state.replace(sim=state.sim.replace(q=q))
    step = jax.jit(env.step)
    state, obs, rew, done, extras = step(state, jnp.zeros((4, 1)))
    assert bool(done[0]) and not bool(np.asarray(done[1:]).any())
    assert float(rew[0]) == -2.0  # death reward (cartpole.py:189-190)
    q_before = np.asarray(state.sim.q).copy()
    state2, obs2, _, _, _ = step(state, jnp.zeros((4, 1)))
    # env 0 was re-sampled into the init distribution; others integrated
    assert abs(float(state2.sim.q[0, 0])) < 0.2
    assert int(state2.progress[0]) == 0 and int(state2.progress[1]) == 2


def test_ant_settles_and_stays_finite():
    env = make("Ant", num_envs=8)
    state, obs = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(4)
    for i in range(30):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (8, 8), minval=-1, maxval=1)
        state, obs, rew, done, extras = step(state, a)
    assert np.isfinite(np.asarray(state.sim.q)).all()
    assert np.isfinite(np.asarray(rew)).all()
    z = np.asarray(state.sim.q)[:, 2]
    assert (z > 0.1).all() and (z < 1.0).all()


def test_dict_obs_api():
    """Dict-observation view (reference ComplexObsRLGPUEnv /
    EnvDextreme dict spaces, adr_vec_task.py:173-220): tasks with an
    obs_spec re-dict the flat vector; plain tasks fall back to
    {"obs": ...}."""
    from isaacgymenvs_tpu.utils.config import load_config
    from isaacgymenvs_tpu.tasks import task_map

    cfg = load_config(["task=AllegroHandDextremeADR", "num_envs=4"])["task"]
    env = task_map["AllegroHandDextremeADR"](cfg)
    space = env.observation_dict_space
    assert space is not None and sum(space.values()) == env.num_obs
    state, od = env.reset_dict(jax.random.PRNGKey(0))
    assert set(od) == set(space)
    for k, n in space.items():
        assert od[k].shape == (4, n)
    state, od, rew, done, extras = jax.jit(env.step_dict)(
        state, jnp.zeros((4, env.num_acts))
    )
    assert od["last_actions"].shape == (4, space["last_actions"])
    # reconstruction: dict slices concatenate back to the flat obs
    state2, flat = env.reset(jax.random.PRNGKey(0))
    rd = env.obs_dict(flat)
    spec = env.obs_spec()
    rebuilt = jnp.concatenate(
        [rd[k] for k in sorted(spec, key=lambda k: spec[k][0])], axis=-1
    )
    assert np.allclose(np.asarray(rebuilt), np.asarray(flat))

    plain = make("Cartpole", num_envs=2)
    assert plain.observation_dict_space is None
    _, od = plain.reset_dict(jax.random.PRNGKey(1))
    assert list(od) == ["obs"] and od["obs"].shape == (2, 4)
