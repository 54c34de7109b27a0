"""FactoryTaskInsertion / FactoryTaskGears env-only templates (reference
factory_task_insertion.py / factory_task_gears.py: zero obs, zero reward,
real resets + physics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.utils.config import load_config


def make(name, num_envs=4):
    cfg = load_config([f"task={name}", f"num_envs={num_envs}"])["task"]
    return task_map[name](cfg)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["FactoryTaskInsertion", "FactoryTaskGears"])
def test_template_contract(name):
    env = make(name)
    assert env.num_obs == 32 and env.num_acts == 12
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 32)
    # template parity: observations and reward stay zero
    assert not np.asarray(obs).any()
    step = jax.jit(env.step)
    for _ in range(20):
        state, obs, rew, done, ex = step(
            state, jax.random.uniform(jax.random.PRNGKey(1), (4, 12)) - 0.5
        )
    assert not np.asarray(rew).any()
    q = np.asarray(state.sim.q)
    qd = np.asarray(state.sim.qd)
    assert np.isfinite(q).all() and np.isfinite(qd).all()
    # franka holds its reset pose through the joint PD
    q_ref = np.asarray(state.task["q_ref"])
    arm_q = q[:, np.asarray(env.q_idx)]
    assert np.abs(arm_q - q_ref).max() < 0.2, np.abs(arm_q - q_ref).max()
    # dropped objects settle on/above the table, not through it (check
    # the mesh support points, not the actor origin -- the assembly-frame
    # gear meshes sit far off their origin and may settle on a side)
    from isaacgymenvs_tpu import maths
    from isaacgymenvs_tpu.engine import dynamics as dyn

    m = env.model
    cb = np.asarray(m.cpoint_body)
    refs = (
        [env.plug_ref] if name == "FactoryTaskInsertion" else env.gear_refs
    )
    for e in range(4):
        kin = dyn.forward_kinematics(m, state.sim.q[e], jnp.zeros(m.nv))
        for ref in refs:
            sel = np.where(cb == ref.body0)[0]
            w = kin.x[ref.body0] + maths.quat_rotate(
                jnp.broadcast_to(kin.quat[ref.body0], (len(sel), 4)),
                m.cpoint_pos[sel],
            )
            assert float(jnp.min(w[:, 2])) > -0.005
