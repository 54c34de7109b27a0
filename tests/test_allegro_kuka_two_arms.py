"""AllegroKukaTwoArms tests: scene statics (two arms + wide table),
obs/action contract, goal side bias, handover reward shape (reference
allegro_kuka_two_arms.py + subtasks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.tasks.allegro_kuka import OBJ_SIZE
from isaacgymenvs_tpu.tasks.allegro_kuka_two_arms import TABLE_TOP


def make(name="AllegroKukaTwoArmsReorientation", num_envs=4, **env_kw):
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config([f"task={name}", f"num_envs={num_envs}"])["task"]
    cfg["env"].update(env_kw)
    return task_map[name](cfg)


@pytest.mark.slow
def test_contract_and_cube_rests_on_wide_table():
    env = make()
    # full_state: 160 + 9 * 4 keypoints = 196 (two_arms.py:176-212)
    assert env.num_obs == 196 and env.num_acts == 46
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 196)
    step = jax.jit(env.step)
    for _ in range(25):
        state, obs, rew, done, ex = step(state, jnp.zeros((4, 46)))
    assert np.isfinite(np.asarray(obs)).all()
    cz = np.asarray(state.sim.q[:, env.oq + 2])
    assert np.allclose(cz, TABLE_TOP + OBJ_SIZE / 2, atol=5e-3), cz
    assert "true_objective" in ex


@pytest.mark.slow
def test_goal_biased_toward_one_arm():
    """Goals gather around x = +/-0.75 + [-0.2, 0.2] (handover bias,
    two_arms_reorientation._reset_target :108-120)."""
    env = make(num_envs=64)
    state, obs = env.reset(jax.random.PRNGKey(1))
    gx = np.asarray(state.task["goal_pos"][:, 0])
    assert (np.abs(gx) > 0.5).all(), gx
    assert (gx > 0).any() and (gx < 0).any()


@pytest.mark.slow
def test_fingertip_reward_not_gated_on_lifting():
    """Two-arms fingertip delta reward flows even when lifted (the 2nd
    arm must stay close, two_arms.py:749-758) -- unlike the single-arm
    variant which zeroes it after lifting."""
    from isaacgymenvs_tpu.engine import dynamics as dyn

    env = make(num_envs=1)
    state, obs = env.reset(jax.random.PRNGKey(2))
    task = jax.tree.map(lambda x: x[0], state.task)
    q, qd = state.sim.q[0], state.sim.qd[0]
    kin = dyn.forward_kinematics(env.model, q, qd)
    task = dict(task)
    task["lifted"] = jnp.asarray(True)
    task["closest_tip_dist"] = jnp.full(8, 10.0)  # large improvement
    task["closest_kp_dist"] = jnp.zeros(())  # kill keypoint reward
    r, _, _ = env.reward_done(
        obs[0], q, qd, kin, None, task, jnp.zeros(46), jnp.asarray(1)
    )
    # 8 fingertips each improving by ~(10 - dist) * 50 >> lifting terms
    assert float(r) > 1000.0, float(r)


@pytest.mark.slow
def test_regrasping_two_arms_contract():
    env = make("AllegroKukaTwoArmsRegrasping")
    # 160 + 9 * 1 keypoint = 169
    assert env.num_obs == 169 and env.num_keypoints == 1
    state, obs = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    for _ in range(5):
        state, obs, rew, done, ex = step(state, jnp.zeros((4, 46)))
    assert np.isfinite(np.asarray(obs)).all()
