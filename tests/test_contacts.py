"""Constraint-pipeline tests: narrowphase queries, pair contacts,
bilateral anchors (the gymapi-attractor equivalent)."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.engine.contacts import _sphere_vs_geom, _tangent_basis
from isaacgymenvs_tpu.model.spec import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_SPHERE,
)

IDENT = jnp.array([0.0, 0.0, 0.0, 1.0])


def test_sphere_vs_sphere():
    phi, n, x = _sphere_vs_geom(
        jnp.array([0.0, 0.0, 1.4]), 0.5, GEOM_SPHERE,
        jnp.array([0.0, 0.0, 0.0]), IDENT, jnp.array([1.0, 0, 0]),
    )
    assert abs(float(phi) - 0.1) < 1e-6  # 1.0 + 0.5 - 1.4
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(x), [0, 0, 1.0], atol=1e-6)


def test_sphere_vs_box_face_and_inside():
    # resting on the top face
    phi, n, x = _sphere_vs_geom(
        jnp.array([0.1, 0.2, 1.05]), 0.1, GEOM_BOX,
        jnp.zeros(3), IDENT, jnp.array([1.0, 1.0, 1.0]),
    )
    assert abs(float(phi) - 0.05) < 1e-6
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-6)
    # center inside the box -> pushed through the nearest face
    phi, n, x = _sphere_vs_geom(
        jnp.array([0.0, 0.0, 0.9]), 0.1, GEOM_BOX,
        jnp.zeros(3), IDENT, jnp.array([1.0, 1.0, 1.0]),
    )
    assert float(phi) > 0.1  # deeply penetrating
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-6)


def test_sphere_vs_cylinder_cap():
    # ball resting on a tray-like disc
    phi, n, x = _sphere_vs_geom(
        jnp.array([0.2, 0.0, 0.105]), 0.1, GEOM_CYLINDER,
        jnp.zeros(3), IDENT, jnp.array([0.5, 0.01, 0]),
    )
    assert abs(float(phi) - 0.005) < 1e-5
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(x), [0.2, 0, 0.01], atol=1e-5)


def test_sphere_vs_capsule():
    phi, n, x = _sphere_vs_geom(
        jnp.array([0.0, 0.0, 0.55]), 0.25, GEOM_CAPSULE,
        jnp.zeros(3), IDENT, jnp.array([0.2, 0.3, 0]),
    )
    # capsule top at z=0.5; gap 0.05-0.25 -> phi = 0.2+0.25-0.25
    assert abs(float(phi) - 0.2) < 1e-6
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-6)


def test_tangent_basis_orthonormal():
    ns = jnp.asarray(
        [[0, 0, 1.0], [1, 0, 0], [0, 1, 0], [0.577, 0.577, 0.578]]
    )
    ns = ns / jnp.linalg.norm(ns, axis=-1, keepdims=True)
    t1, t2 = _tangent_basis(ns)
    for i in range(4):
        np.testing.assert_allclose(float(jnp.dot(t1[i], ns[i])), 0, atol=1e-6)
        np.testing.assert_allclose(float(jnp.dot(t2[i], ns[i])), 0, atol=1e-6)
        np.testing.assert_allclose(float(jnp.dot(t1[i], t2[i])), 0, atol=1e-6)
        np.testing.assert_allclose(float(jnp.linalg.norm(t1[i])), 1, atol=1e-5)


def test_ball_balance_attractors_hold_feet():
    """The bilateral anchors must pin the lower-leg tips near their world
    targets while the robot is carrying its own weight."""
    from isaacgymenvs_tpu.tasks import task_map
    from isaacgymenvs_tpu.engine import dynamics as dyn

    cfg = {"env": {"numEnvs": 2, "clipActions": 1.0}, "sim": {"dt": 1 / 60, "substeps": 2}}
    env = task_map["BallBalance"](cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(60):
        state, obs, rew, done, ex = step(state, jnp.zeros((2, 3)))
    m = env.model
    kin = dyn.forward_kinematics(m, state.sim.q[0], state.sim.qd[0])
    import isaacgymenvs_tpu.maths as maths

    feet = kin.x[jnp.asarray(np.asarray(m.att_body))] + maths.quat_rotate(
        kin.quat[jnp.asarray(np.asarray(m.att_body))], m.att_offset
    )
    err = np.asarray(feet) - np.asarray(m.att_target)
    assert np.abs(err).max() < 0.02, err
