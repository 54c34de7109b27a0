"""SAC + replay-buffer machinery tests."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.learn import SAC, ReplayBuffer, buffer_add_batch, buffer_sample
from isaacgymenvs_tpu.tasks import task_map


def test_replay_buffer_ring():
    buf = ReplayBuffer.create(8, {"x": (2,)})
    buf = buffer_add_batch(buf, {"x": jnp.arange(12.0).reshape(6, 2)})
    assert int(buf.size) == 6 and int(buf.idx) == 6
    buf = buffer_add_batch(buf, {"x": 100 + jnp.arange(8.0).reshape(4, 2)})
    assert int(buf.size) == 8 and int(buf.idx) == 2  # wrapped
    s = buffer_sample(buf, jax.random.PRNGKey(0), 16)
    assert s["x"].shape == (16, 2)


def test_sac_trains_and_updates():
    cfg = {
        "env": {"numEnvs": 32, "clipActions": 1.0, "episodeLength": 100},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    tp = {
        "network": {"mlp": {"units": [32, 32], "activation": "relu"},
                    "log_std_bounds": [-5, 2]},
        "config": {"batch_size": 128, "num_steps_per_episode": 8,
                   "num_warmup_steps": 2, "num_seed_steps": 1,
                   "reward_shaper": {"scale_value": 0.1}},
    }
    agent = SAC(env, tp, seed=0)
    ts = agent.init()
    p0 = jax.device_get(ts.actor_params)
    for _ in range(6):
        ts, m = agent._train_epoch(ts)
    m = jax.device_get(m)
    assert np.isfinite(float(m["c_loss"])) and float(m["c_loss"]) >= 0
    assert float(m["alpha"]) > 0
    # params actually moved
    p1 = jax.device_get(ts.actor_params)
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(np.abs(a - b).sum()), p0, p1),
    )
    assert diff > 0
    # buffer filled
    assert int(ts.buffer.size) == 6 * 8 * 32


def test_sac_checkpoint_roundtrip_and_play(tmp_path):
    cfg = {
        "env": {"numEnvs": 16, "clipActions": 1.0, "episodeLength": 40},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    tp = {
        "network": {"mlp": {"units": [32, 32]}},
        "config": {"batch_size": 64, "num_steps_per_episode": 8,
                   "num_warmup_steps": 2, "replay_buffer_size": 2048},
    }
    agent = SAC(env, tp, seed=0)
    ts = agent.init()
    ts, m = agent._train_epoch(ts)
    path = str(tmp_path / "sac.ckpt")
    agent.save(path, ts)
    ts2 = agent.restore(path, agent.init())
    eq = jax.tree.map(
        lambda a, b: bool((a == b).all()), ts.actor_params, ts2.actor_params
    )
    assert all(jax.tree.leaves(eq))
    ret = agent.play(checkpoint=path, num_episodes=4)
    assert np.isfinite(ret)
