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


def test_recurrent_player_threads_carry():
    """test=True on an LSTM checkpoint must evaluate a RECURRENT policy:
    _play_step's action depends on the carry accumulated from history,
    and a done env's carry resets to zero (rl_games BasePlayer rnn-state
    semantics; round-1 ADVICE finding on learn/rnn.py:344)."""
    import jax.numpy as jnp

    cfg = {
        "env": {"numEnvs": 4, "clipActions": 1.0, "episodeLength": 50},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Cartpole"](cfg)
    tp = {
        "network": {"mlp": {"units": [16]},
                    "rnn": {"units": 32, "before_mlp": False}},
        "config": {"horizon_length": 8, "minibatch_size": 16,
                   "mini_epochs": 1, "seq_length": 4},
    }
    agent = PPORecurrent(env, tp, seed=0)
    ts = agent.init()
    obs = ts.obs
    no_done = jnp.zeros(4, bool)
    # build up history: two identical-obs steps from a zero carry
    a1, ts1 = agent._play_step(ts, obs, no_done)
    a2, ts2 = agent._play_step(ts1, obs, no_done)
    # with history the same obs maps to a different action than from
    # the zero carry -> the carry is actually threaded
    assert float(np.abs(np.asarray(a2 - a1)).max()) > 1e-7
    # done envs restart from a zero carry: replaying step 1 after done
    # reproduces the zero-carry action exactly
    a3, _ = agent._play_step(ts2, obs, jnp.ones(4, bool))
    np.testing.assert_allclose(np.asarray(a3), np.asarray(a1), atol=1e-6)
    # carry state advanced in ts
    assert float(np.abs(np.asarray(ts2.states[1])).max()) > 0
