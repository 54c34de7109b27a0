"""AMP stack tests: motion library, HumanoidAMP env, AMP agent."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.learn import AMPAgent
from isaacgymenvs_tpu.tasks import task_map


def make(n=8):
    cfg = {
        "env": {"numEnvs": n, "clipActions": 1.0, "clipObservations": 5.0},
        "sim": {"dt": 1 / 60, "substeps": 2,
                "physx": {"max_active_contacts": 16}},
    }
    return task_map["HumanoidAMP"](cfg)


def test_motion_lib_state_query():
    env = make(2)
    ml = env.motion_lib
    mids = jnp.zeros(4, jnp.int32)
    times = jnp.asarray([0.0, 0.3, 0.7, 1.0])
    rp, rr, dp, dv, rv, rav, kp = ml.get_motion_state(mids, times)
    assert rp.shape == (4, 3) and dp.shape == (4, 28) and kp.shape == (4, 4, 3)
    assert np.isfinite(np.asarray(dp)).all()
    # quaternions stay unit under slerp
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rr), axis=-1), 1.0, atol=1e-5
    )
    # blending at t and t+eps is continuous
    rp2, *_ = ml.get_motion_state(mids, times + 1e-3)
    assert float(np.abs(np.asarray(rp2) - np.asarray(rp)).max()) < 0.05


def test_reference_state_init_matches_motion():
    """RSI: reset poses drawn from the capture should have mocap-like root
    heights (running human: 0.6-1.2)."""
    env = make(16)
    state, obs = env.reset(jax.random.PRNGKey(0))
    z = np.asarray(state.sim.q[:, 2])
    assert (z > 0.5).all() and (z < 1.3).all(), z


def test_amp_obs_history():
    env = make(4)
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    state, obs, rew, done, ex = step(state, jnp.zeros((4, 28)))
    amp = ex["amp_obs"]
    assert amp.shape == (4, 210)
    assert np.isfinite(np.asarray(amp)).all()
    # task reward is identically 1 (style-only, humanoid_amp_base.py:531)
    np.testing.assert_allclose(np.asarray(rew), 1.0)


def test_amp_agent_disc_learns_to_separate():
    env = make(16)
    tp = {
        "network": {"mlp": {"units": [64, 64]}, "disc": {"units": [64, 64]}},
        "config": {"horizon_length": 4, "minibatch_size": 64, "mini_epochs": 2,
                   "amp_minibatch_size": 64, "learning_rate": 1e-3,
                   "lr_schedule": "constant"},
    }
    agent = AMPAgent(env, tp, seed=0)
    ts = agent.init()
    for _ in range(8):
        ts, m = agent._train_epoch(ts)
    m = jax.device_get(m)
    assert np.isfinite(float(m["kl"]))
    assert float(m["disc_reward_mean"]) > 0.0
