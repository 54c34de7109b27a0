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
