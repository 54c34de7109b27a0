"""Recurrent PPO tests."""
import jax
import numpy as np

from isaacgymenvs_tpu.learn import PPORecurrent
from isaacgymenvs_tpu.tasks import task_map


def test_lstm_ppo_trains_and_resets_state():
    cfg = {
        "env": {"numEnvs": 16, "clipActions": 1.0, "episodeLength": 50},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    tp = {
        "network": {"mlp": {"units": [16]},
                    "rnn": {"units": 32, "before_mlp": False}},
        "config": {"horizon_length": 8, "minibatch_size": 32,
                   "mini_epochs": 2, "seq_length": 4,
                   "reward_shaper": {"scale_value": 0.1}},
    }
    agent = PPORecurrent(env, tp, seed=0)
    ts = agent.init()
    c0 = np.asarray(ts.states[0])
    assert (c0 == 0).all()
    for _ in range(3):
        ts, m = agent._train_epoch(ts)
    m = jax.device_get(m)
    assert np.isfinite(float(m["kl"]))
    # hidden state evolves during rollout
    assert float(np.abs(np.asarray(ts.states[1])).max()) > 0
