"""Factory NutBoltPick tests: scene statics, joint-space-ID control,
keypoint reward (reference tasks/factory/factory_task_nut_bolt_pick.py +
factory_control.py joint_space_id)."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.tasks.factory_nut_bolt_pick import NUT_HEIGHT


def make(num_envs=4, **env_kw):
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(
        ["task=FactoryTaskNutBoltPick", f"num_envs={num_envs}"]
    )["task"]
    cfg["env"].update(env_kw)
    return task_map["FactoryTaskNutBoltPick"](cfg)


def test_contract_and_nut_rests_on_table():
    env = make()
    assert env.num_obs == 20 and env.num_acts == 12
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 20)
    step = jax.jit(env.step)
    for _ in range(20):
        state, obs, rew, done, ex = step(state, jnp.zeros((4, 12)))
    assert np.isfinite(np.asarray(obs)).all()
    nz = np.asarray(state.sim.q[:, env.nq + 2])
    # the nut settles on its rim at half height
    assert np.allclose(nz, NUT_HEIGHT / 2, atol=2e-3)


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
