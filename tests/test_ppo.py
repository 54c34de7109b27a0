"""Learner tests: running stats correctness + Cartpole learning smoke
(SURVEY.md section 4 item e)."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.learn import PPO, RunningMeanStd, rms_normalize, rms_update
from isaacgymenvs_tpu.tasks import task_map


def test_running_mean_std_matches_numpy():
    rms = RunningMeanStd.create((3,))
    rng = np.random.RandomState(0)
    chunks = [rng.randn(50, 3) * 2.0 + 5.0 for _ in range(4)]
    for c in chunks:
        rms = rms_update(rms, jnp.asarray(c))
    allx = np.concatenate(chunks)
    np.testing.assert_allclose(np.asarray(rms.mean), allx.mean(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rms.var), allx.var(0), rtol=1e-3)
    y = np.asarray(rms_normalize(rms, jnp.asarray(allx)))
    assert abs(y.mean()) < 0.02 and abs(y.std() - 1.0) < 0.02


def test_cartpole_learns():
    cfg = {
        "env": {"numEnvs": 128, "clipObservations": 5.0, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    train_params = {
        "network": {"mlp": {"units": [32, 32], "activation": "elu"}},
        "config": {
            "horizon_length": 16,
            "minibatch_size": 2048,
            "mini_epochs": 8,
            "critic_coef": 4,
            "reward_shaper": {"scale_value": 0.1},
            "max_epochs": 35,
        },
    }
    ppo = PPO(env, train_params, seed=3)
    ts, metrics = ppo.train(log_every=100)
    # untrained return is ~1-3; a learning policy passes 10 within 35 epochs
    assert metrics["mean_episode_return"] > 10.0
    assert np.isfinite(metrics["kl"]) and np.isfinite(metrics["a_loss"])


def test_checkpoint_roundtrips_env_task_and_adr_state(tmp_path):
    """Resume must not reset curricula: save() writes env task state +
    ADR population state and restore() re-hydrates both into EnvState
    (reference vec_task.py:196-204 set_env_state +
    adr_vec_task.py:368-399,516 adr_load_from_checkpoint; round-1
    VERDICT item 5)."""
    cfg = {
        "env": {"numEnvs": 8, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Ant"](cfg)
    tp = {
        "network": {"mlp": {"units": [16]}},
        "config": {"horizon_length": 4, "minibatch_size": 16,
                   "mini_epochs": 1},
    }
    ppo = PPO(env, tp, seed=0)
    ts = ppo.init()
    # perturb curriculum-like task state + attach a fake ADR pytree
    mutated_task = jax.tree.map(lambda x: x + 1.0, ts.env_state.task)
    fake_adr = {"ranges": jnp.arange(4.0), "queue": jnp.ones((2, 3))}
    ts = ts.replace(
        env_state=ts.env_state.replace(task=mutated_task, adr=fake_adr)
    )
    path = str(tmp_path / "ck.ckpt")
    ppo.save(path, ts, epoch=7, frames=123)

    # fresh state: ADR-gated restore OFF -> task restores, adr does not
    ts2 = ppo.init().replace(
        env_state=ppo.init().env_state.replace(
            adr={"ranges": jnp.zeros(4), "queue": jnp.zeros((2, 3))}
        )
    )
    env.adr_load_from_checkpoint = False
    ts2r, epoch = ppo.restore(path, ts2)
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(ts2r.env_state.task),
                    jax.tree.leaves(mutated_task)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert float(np.asarray(ts2r.env_state.adr["ranges"]).max()) == 0.0

    # gate ON -> evolved ADR ranges restore too
    env.adr_load_from_checkpoint = True
    ts3r, _ = ppo.restore(path, ts2)
    np.testing.assert_allclose(
        np.asarray(ts3r.env_state.adr["ranges"]), np.arange(4.0)
    )


def test_env_extras_auto_logged():
    """Scalar env extras flow into the epoch metrics as env/<key> series
    (the reference's RLGPUAlgoObserver behavior)."""
    from isaacgymenvs_tpu.tasks import task_map

    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(["task=Trifinger", "num_envs=8"])["task"]
    env = task_map["Trifinger"](cfg)  # emits successes/_pos/_quat extras
    agent = PPO(env, {"config": {"horizon_length": 4, "minibatch_size": 16,
                                 "mini_epochs": 1}}, seed=0)
    ts = agent.init()
    ts, metrics = agent._train_epoch(ts)
    env_keys = [k for k in metrics if k.startswith("env/")]
    assert env_keys, metrics.keys()
    import numpy as _np
    assert all(_np.isfinite(float(metrics[k])) for k in env_keys)


class _EpCumWrapper:
    """Env wrapper injecting an extras['episode_cumulative'] term dict
    (the reference producer contract, allegro_kuka_base.py:923-928)."""

    def __init__(self, env):
        self._env = env

    def __getattr__(self, k):
        return getattr(self._env, k)

    def step(self, state, actions):
        state, obs, rew, done, extras = self._env.step(state, actions)
        extras = dict(extras)
        extras["episode_cumulative"] = {"r": rew}
        return state, obs, rew, done, extras


def test_episode_cumulative_stats():
    """extras['episode_cumulative'] terms accumulate per env inside the
    jitted rollout and surface as episode_cumulative/<k> (+_min/_max)
    finished-episode stats (reference rlgames_utils.py:157-172,198-204).
    Using the reward itself as the term makes the invariant exact: the
    mean per-episode cumulative 'r' of episodes finished in a rollout
    must equal that rollout's mean finished-episode return."""
    cfg = {
        "env": {"numEnvs": 32, "clipObservations": 5.0, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = _EpCumWrapper(task_map["Cartpole"](cfg))
    agent = PPO(
        env,
        {"config": {"horizon_length": 64, "minibatch_size": 512,
                    "mini_epochs": 1}},
        seed=3,
    )
    ts = agent.init()
    assert ts.ep_cum is not None and "r" in ts.ep_cum
    # run a few epochs so some episodes finish mid-rollout
    for _ in range(6):
        ts, metrics = agent._train_epoch(ts)
    metrics = {k: float(v) for k, v in metrics.items()}
    assert "episode_cumulative/r" in metrics
    n = metrics["n_episodes"]
    assert n > 0, "need finished episodes for the invariant"
    want = metrics["ep_return_sum"] / n
    np.testing.assert_allclose(
        metrics["episode_cumulative/r"], want, rtol=1e-5
    )
    assert (
        metrics["episode_cumulative_min/r_min"]
        <= metrics["episode_cumulative/r"]
        <= metrics["episode_cumulative_max/r_max"]
    )


def test_allegro_kuka_emits_episode_cumulative():
    """The AllegroKuka family is the reference's episode_cumulative
    producer (allegro_kuka_base.py:923-928): its per-step reward terms
    must flow through to the trainer's epoch metrics."""
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(
        ["task=AllegroKukaReorientation", "num_envs=4"]
    )["task"]
    env = task_map["AllegroKukaReorientation"](cfg)
    agent = PPO(env, {"config": {"horizon_length": 2, "minibatch_size": 8,
                                 "mini_epochs": 1}}, seed=0)
    ts = agent.init()
    assert ts.ep_cum is not None and "lifting_rew" in ts.ep_cum
    ts, metrics = agent._train_epoch(ts)
    assert "episode_cumulative/keypoint_rew" in metrics


def test_set_train_info_frames():
    """Trainer reports its frame counter to the env every epoch
    (reference set_train_info plumbing, vec_task.py:187-194)."""
    cfg = {
        "env": {"numEnvs": 16, "clipObservations": 5.0, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    agent = PPO(
        env,
        {"config": {"horizon_length": 8, "minibatch_size": 128,
                    "mini_epochs": 1, "max_epochs": 2}},
        seed=0,
    )
    agent.train(max_epochs=2)
    assert env.total_train_env_frames == 2 * 8 * 16
