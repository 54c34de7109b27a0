"""Factory NutBoltPick tests: scene statics, joint-space-ID control,
keypoint reward, scripted close-and-lift tail (reference
tasks/factory/factory_task_nut_bolt_pick.py + factory_control.py
joint_space_id). The nut is the SDF-voxelized hex mesh (factory_nut_bolt)."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.tasks.factory_nut_bolt import NUT_HEIGHT


def make(num_envs=4, rl_len=None, **env_kw):
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(
        ["task=FactoryTaskNutBoltPick", f"num_envs={num_envs}"]
    )["task"]
    cfg["env"].update(env_kw)
    if rl_len is not None:
        cfg["rl"]["max_episode_length"] = rl_len
    return task_map["FactoryTaskNutBoltPick"](cfg)


def test_contract_and_nut_rests_on_table():
    env = make()
    assert env.num_obs == 20 and env.num_acts == 12
    # episode = RL phase + scripted close (25) + lift (25)
    assert env.max_episode_length == 100 + 25 + 25
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 20)
    step = jax.jit(env.step)
    for _ in range(20):
        state, obs, rew, done, ex = step(state, jnp.zeros((4, 12)))
    assert np.isfinite(np.asarray(obs)).all()
    nz = np.asarray(state.sim.q[:, env.nq + 2])
    # the SDF hex nut rests with its base on the work surface (z=0)
    assert np.abs(nz).max() < 2e-3
    assert "successes" in ex


def test_gravity_comp_holds_and_commands_track():
    env = make()
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    z0 = np.asarray(obs[:, 2]).copy()
    for _ in range(20):
        state, obs, *_ = step(state, jnp.zeros((4, 12)))
    # zero action + gravity compensation -> the arm holds its pose
    assert np.allclose(np.asarray(obs[:, 2]), z0, atol=5e-3)
    a = jnp.zeros((4, 12)).at[:, 2].set(1.0)
    for _ in range(20):
        state, obs, *_ = step(state, a)
    assert (np.asarray(obs[:, 2]) > z0 + 0.05).all()


def test_keypoint_reward_improves_on_approach():
    env = make()
    state, obs = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    state, obs, rew0, *_ = step(state, jnp.zeros((4, 12)))
    # descend toward the nut: keypoint distance shrinks, reward rises
    a = jnp.zeros((4, 12)).at[:, 2].set(-1.0)
    for _ in range(25):
        state, obs, rew, done, ex = step(state, a)
    assert (np.asarray(rew) > np.asarray(rew0)).all()


def test_scripted_tail_closes_then_lifts():
    """close_and_lift folded into the episode tail (reference :146-150):
    policy actions are overridden; the gripper closes during the close
    phase and the fingertip rises during the lift phase; reward is zeroed
    for scripted steps."""
    env = make(rl_len=5)
    assert env.max_episode_length == 5 + 50
    state, obs = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    # a policy action that would normally move the arm sideways
    a = jnp.ones((4, 12)) * 0.5
    for _ in range(6 + 15):  # into the close phase
        state, obs, rew, done, ex = step(state, a)
    grip = np.asarray(state.sim.q[:, np.asarray(env.q_idx[7:])])
    assert grip.max() < 0.02, f"fingers should be closing, got {grip}"
    assert np.allclose(np.asarray(rew), 0.0), "scripted steps reward 0"
    z_before_lift_done = np.asarray(obs[:, 2]).copy()
    for _ in range(30):  # through the lift phase
        state, obs, rew, done, ex = step(state, a)
    assert (np.asarray(obs[:, 2]) > z_before_lift_done + 0.1).all(), (
        "fingertip should have lifted"
    )
