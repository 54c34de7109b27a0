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


def test_restitution_bounce():
    """A falling sphere with restitution e bounces back at ~e * impact
    speed (Newton restitution above bounce_threshold_velocity); with
    e = 0 it stays inelastic (reference physx rigid_shape_properties
    restitution + bounce_threshold_velocity)."""
    import jax
    from isaacgymenvs_tpu.engine import SimParams, SimState, physics_step
    from isaacgymenvs_tpu.model.spec import FREE, GEOM_SPHERE, ModelBuilder
    from isaacgymenvs_tpu.sdf.builder import add_contact_points

    def drop(e):
        b = ModelBuilder()
        body = b.add_body(
            parent=-1, name="ball", pos=(0, 0, 0), quat=(0, 0, 0, 1),
            jnt_type=FREE, mass=1.0, inertia=np.eye(3) * 1e-3,
        )
        b.qpos0_free[body] = (
            np.array([0, 0, 1.0], np.float32), np.array([0, 0, 0, 1], np.float32)
        )
        b.add_geom(body, GEOM_SPHERE, (0, 0, 0), (0, 0, 0, 1), (0.1, 0, 0), 0.5)
        m = b.finalize()
        # single contact point at the sphere bottom with restitution e
        m, idx = add_contact_points(
            m, body, np.array([[0.0, 0.0, -0.1]], np.float32), friction=0.5
        )
        m = m.replace(
            cpoint_restitution=jnp.zeros(m.ncp).at[idx[0]].set(e)
        )
        params = SimParams(dt=1 / 120, substeps=2, baumgarte_erp=0.1)
        st = SimState(
            q=m.qpos0, qd=jnp.zeros(m.nv).at[2].set(-3.0)  # 3 m/s down
        )
        step = jax.jit(
            lambda s: physics_step(m, s, jnp.zeros(m.nv), params)
        )
        vmax = 0.0
        for _ in range(30):
            out = step(st)
            st = out.state if hasattr(out, "state") else out[0]
            vmax = max(vmax, float(st.qd[2]))
        return vmax

    v_bouncy = drop(0.8)
    v_dead = drop(0.0)
    # impact speed ~3.1 m/s -> rebound ~2.5 m/s at e=0.8
    assert v_bouncy > 1.8, v_bouncy
    assert v_dead < 0.4, v_dead


def test_dof_friction_holds_small_torques():
    """Coulomb joint friction: a horizontal hinge pendulum under a small
    gravity torque barely moves with dof_friction larger than the load,
    and swings freely without it (PhysX DOF friction / MJCF
    frictionloss)."""
    import jax
    from isaacgymenvs_tpu.engine import SimParams, SimState, physics_step
    from isaacgymenvs_tpu.model.spec import HINGE, ModelBuilder

    def run(fric):
        b = ModelBuilder()
        rod = b.add_body(
            parent=-1, name="rod", pos=(0, 0, 1.0), quat=(0, 0, 0, 1),
            jnt_type=HINGE, jnt_axis=(0, 1, 0), joint_name="hinge",
            mass=1.0, ipos=(0.1, 0, 0), inertia=np.eye(3) * 1e-2,
        )
        # tip geom provides a (never-touching) contact point so the
        # constraint assembly is non-empty
        b.add_geom(rod, GEOM_SPHERE, (0.1, 0, 0), (0, 0, 0, 1), (0.02, 0, 0), 0.5)
        m = b.finalize()
        m = m.replace(dof_friction=jnp.full(m.nv, fric))
        params = SimParams(dt=1 / 60, substeps=2)
        st = SimState(q=m.qpos0, qd=jnp.zeros(m.nv))
        step = jax.jit(lambda s: physics_step(m, s, jnp.zeros(m.nv), params))
        amax = 0.0
        for _ in range(60):
            out = step(st)
            st = out.state if hasattr(out, "state") else out[0]
            amax = max(amax, abs(float(st.q[0])))
        return amax

    # gravity torque = m g r ~ 0.98 Nm; friction 5 Nm >> load, 0 = free
    assert run(5.0) < 0.08, run(5.0)
    assert run(0.0) > 0.5, run(0.0)
