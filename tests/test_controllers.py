"""Controller-library tests: Jacobian correctness (vs finite differences)
and differential-IK convergence on the Franka arm."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu import controllers, maths
from isaacgymenvs_tpu.engine import dynamics as dyn
from isaacgymenvs_tpu.model import load_urdf
from isaacgymenvs_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def franka():
    m = load_urdf(
        asset_path("urdf/franka_description/robots/franka_panda.urdf"),
        fix_base=True,
    )
    anc = jnp.asarray(dyn.ancestor_matrix(m))
    meta = dyn.kin_meta(m)
    return m, anc, meta


def test_jacobian_matches_finite_difference(franka):
    m, anc, meta = franka
    hand = m.body_names.index("panda_hand")
    q0 = m.qpos0.at[jnp.asarray([m.q_adr[m.dof_body[d]] for d in range(7)])].set(
        jnp.asarray([0.5, -0.8, 0.3, -2.0, 0.1, 1.5, 0.2])
    )
    kin = dyn.forward_kinematics(m, q0, jnp.zeros(m.nv), meta)
    J = controllers.body_jacobian(
        kin, anc, np.asarray(m.dof_body), hand, kin.x[hand]
    )
    eps = 1e-3  # fp32-friendly step
    for d in range(7):
        qa = m.q_adr[m.dof_body[d]]
        qp = q0.at[qa].add(eps)
        kin_p = dyn.forward_kinematics(m, qp, jnp.zeros(m.nv), meta)
        dlin = (kin_p.x[hand] - kin.x[hand]) / eps
        np.testing.assert_allclose(
            np.asarray(J[3:, d]), np.asarray(dlin), atol=5e-3
        )


def test_diff_ik_converges(franka):
    m, anc, meta = franka
    hand = m.body_names.index("panda_hand")
    qidx = jnp.asarray([m.q_adr[m.dof_body[d]] for d in range(7)])
    q = m.qpos0.at[qidx].set(jnp.asarray([0.0, -0.5, 0.0, -1.8, 0.0, 1.4, 0.0]))
    kin = dyn.forward_kinematics(m, q, jnp.zeros(m.nv), meta)
    target_pos = kin.x[hand] + jnp.asarray([0.05, -0.03, 0.04])
    target_rot = kin.quat[hand]

    for method in ("dls", "pinv", "svd"):
        qi = q
        for _ in range(30):
            kin_i = dyn.forward_kinematics(m, qi, jnp.zeros(m.nv), meta)
            err = controllers.pose_error(
                kin_i.x[hand], kin_i.quat[hand], target_pos, target_rot
            )
            J = controllers.body_jacobian(
                kin_i, anc, np.asarray(m.dof_body), hand, kin_i.x[hand]
            )
            dq = controllers.get_delta_dof_pos(err, J, method=method)
            qi = qi.at[qidx].add(0.5 * dq[:7])
        kin_f = dyn.forward_kinematics(m, qi, jnp.zeros(m.nv), meta)
        final = float(jnp.linalg.norm(kin_f.x[hand] - target_pos))
        assert final < 0.005, (method, final)


def test_osc_torque_direction(franka):
    m, anc, meta = franka
    hand = m.body_names.index("panda_hand")
    q = m.qpos0
    kin = dyn.forward_kinematics(m, q, jnp.zeros(m.nv), meta)
    masks = (anc, jnp.asarray(dyn.dof_ancestor_mask(m)))
    M = dyn.mass_matrix(m, kin, masks)
    Minv = dyn.spd_inverse(M + 1e-4 * jnp.eye(m.nv))
    J = controllers.body_jacobian(kin, anc, np.asarray(m.dof_body), hand, kin.x[hand])
    err = jnp.concatenate([jnp.zeros(3), jnp.array([0.1, 0.0, 0.0])])
    tau = controllers.operational_space_control(
        J, Minv, err, jnp.zeros(6), jnp.zeros(m.nv), kp=100.0, kd=10.0
    )
    # resulting joint acceleration should move the hand toward +x
    qdd = Minv @ tau
    xdd = (J @ qdd)[3:]
    assert float(xdd[0]) > 0
