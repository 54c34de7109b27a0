"""Physics-engine correctness tests against analytic mechanics
(SURVEY.md section 4 test plan: pendulum energy, Featherstone vs
autodiff-of-Lagrangian, momentum conservation, contact settling)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.engine import (
    SimParams,
    SimState,
    forward_kinematics,
    mass_matrix,
    physics_step,
)
from isaacgymenvs_tpu.engine import dynamics as dyn
from isaacgymenvs_tpu.model import load_mjcf, load_urdf
from isaacgymenvs_tpu.model.spec import FREE, HINGE, ModelBuilder
from isaacgymenvs_tpu.utils.assets import asset_path


def pendulum_model(two_links=False):
    """Point-mass pendulum(s): hinge about y at the parent origin, rod of
    length 1 along -z, all mass at the tip."""
    b = ModelBuilder()
    tip_inertia = np.zeros((3, 3))  # point mass
    b.add_body(
        parent=-1, name="link1", pos=(0, 0, 2.0), quat=(0, 0, 0, 1), jnt_type=HINGE,
        jnt_axis=(0, 1, 0), jnt_pos=(0, 0, 0), joint_name="j1", mass=1.0,
        ipos=(0, 0, -1.0), inertia=tip_inertia,
    )
    if two_links:
        b.add_body(
            parent=0, name="link2", pos=(0, 0, -1.0), quat=(0, 0, 0, 1), jnt_type=HINGE,
            jnt_axis=(0, 1, 0), jnt_pos=(0, 0, 0), joint_name="j2", mass=1.0,
            ipos=(0, 0, -1.0), inertia=tip_inertia,
        )
    return b.finalize()


def free_body_model():
    b = ModelBuilder()
    b.add_body(
        parent=-1, name="box", pos=(0, 0, 0), quat=(0, 0, 0, 1), jnt_type=FREE,
        joint_name="root", mass=2.0, ipos=(0.1, -0.05, 0.2),
        inertia=np.diag([0.1, 0.2, 0.3]),
    )
    return b.finalize()


def _fd(model, q, qd, tau, gravity):
    masks = (
        jnp.asarray(dyn.ancestor_matrix(model)),
        jnp.asarray(dyn.dof_ancestor_mask(model)),
    )
    sq = jnp.asarray(dyn.scalar_dof_q_adr(model))
    params = SimParams(gravity=jnp.asarray(gravity))
    f_ext = jnp.zeros((model.nbody, 6))
    qdd, _, _ = dyn.forward_dynamics(model, q, qd, tau, f_ext, params, masks, sq)
    return qdd


def test_pendulum_gravity_acceleration():
    """At angle theta from vertical: qdd = -(g/L) sin(theta)."""
    m = pendulum_model()
    for theta in [0.0, 0.3, 1.0, np.pi / 2]:
        q = jnp.array([theta])
        qd = jnp.zeros(1)
        qdd = _fd(m, q, qd, jnp.zeros(1), [0.0, 0.0, -9.81])
        # hinge about +y: positive theta tips the rod toward +x... sign from
        # the analytic energy: V = -m g L cos(theta)
        expected = -9.81 * np.sin(theta)
        np.testing.assert_allclose(qdd[0], expected, atol=1e-4)


def test_pendulum_energy_conservation():
    m = pendulum_model()
    params = SimParams(
        dt=1.0 / 60, substeps=2, solver_iterations=4, gravity=jnp.array([0.0, 0, -9.81])
    )
    state = SimState(q=jnp.array([np.pi / 2]), qd=jnp.zeros(1))

    def energy(state):
        kin = forward_kinematics(m, state.q, state.qd)
        masks = (
            jnp.asarray(dyn.ancestor_matrix(m)),
            jnp.asarray(dyn.dof_ancestor_mask(m)),
        )
        M = mass_matrix(m, kin, masks)
        T = 0.5 * state.qd @ M @ state.qd
        V = 9.81 * jnp.sum(m.body_mass * kin.com[:, 2])
        return T + V

    e0 = energy(state)
    step = jax.jit(lambda s: physics_step(m, s, jnp.zeros(1), params).state)
    for _ in range(120):  # 2 seconds
        state = step(state)
    e1 = energy(state)
    assert abs(float(e1 - e0)) / abs(float(e0)) < 0.02


def test_double_pendulum_vs_lagrangian():
    """qdd from the engine must match autodiff of the Lagrangian built from
    the engine's own M(q) and V(q) -- validates bias/Coriolis terms."""
    m = pendulum_model(two_links=True)
    masks = (
        jnp.asarray(dyn.ancestor_matrix(m)),
        jnp.asarray(dyn.dof_ancestor_mask(m)),
    )
    g = jnp.array([0.0, 0.0, -9.81])

    def M_of_q(q):
        kin = forward_kinematics(m, q, jnp.zeros(m.nv))
        return mass_matrix(m, kin, masks)

    def V_of_q(q):
        kin = forward_kinematics(m, q, jnp.zeros(m.nv))
        return -jnp.sum(m.body_mass * (kin.com @ g))

    q = jnp.array([0.4, -0.9])
    qd = jnp.array([1.3, -2.1])
    tau = jnp.array([0.7, -0.2])

    # Euler-Lagrange: M qdd + Mdot qd - 0.5 d(qd^T M qd)/dq + dV/dq = tau
    Mdot = jax.jvp(M_of_q, (q,), (qd,))[1]
    dT_dq = jax.grad(lambda qq: 0.5 * qd @ M_of_q(qq) @ qd)(q)
    dV_dq = jax.grad(V_of_q)(q)
    qdd_ref = jnp.linalg.solve(M_of_q(q), tau - Mdot @ qd + dT_dq - dV_dq)

    qdd = _fd(m, q, qd, tau, g)
    np.testing.assert_allclose(qdd, qdd_ref, atol=1e-3, rtol=1e-3)


def test_free_body_momentum_conservation():
    """Torque-free tumbling body: linear + angular momentum conserved."""
    m = free_body_model()
    params = SimParams(
        dt=1.0 / 120, substeps=1, solver_iterations=4, gravity=jnp.zeros(3)
    )
    q = jnp.array([0.0, 0, 1.0, 0, 0, 0, 1.0])
    qd = jnp.array([0.5, -0.2, 0.3, 2.0, 3.0, 1.0])  # vel + tumbling omega
    state = SimState(q=q, qd=qd)

    def momenta(state):
        kin = forward_kinematics(m, state.q, state.qd)
        from isaacgymenvs_tpu.maths import spatial_inertia_at_origin

        I = spatial_inertia_at_origin(m.body_mass, kin.com, kin.inertia_w)
        h = jnp.einsum("bij,bj->bi", I, kin.v)[0]
        return h  # (L_o, p)

    h0 = momenta(state)
    step = jax.jit(lambda s: physics_step(m, s, jnp.zeros(6), params).state)
    for _ in range(240):
        state = step(state)
    h1 = momenta(state)
    np.testing.assert_allclose(h1, h0, atol=2e-2)
    # and the quaternion stays unit
    np.testing.assert_allclose(
        jnp.linalg.norm(state.q[3:7]), 1.0, atol=1e-4
    )


def test_free_fall_parabola():
    m = free_body_model()
    params = SimParams(dt=1.0 / 60, substeps=2, gravity=jnp.array([0.0, 0, -9.81]))
    state = SimState(q=jnp.array([0.0, 0, 10.0, 0, 0, 0, 1.0]), qd=jnp.zeros(6))
    step = jax.jit(lambda s: physics_step(m, s, jnp.zeros(6), params).state)
    t = 0.0
    for _ in range(60):
        state = step(state)
        t += params.dt
    # symplectic Euler lands slightly below the exact parabola by g*dt*t/2
    z_expected = 10.0 - 0.5 * 9.81 * t * t
    assert abs(float(state.q[2]) - z_expected) < 0.05


def test_cartpole_dynamics_sanity():
    """Cart force accelerates cart; pole reacts (classic cartpole signs)."""
    m = load_urdf(asset_path("urdf/cartpole.urdf"), fix_base=True)
    q = jnp.zeros(2)
    qd = jnp.zeros(2)
    qdd = _fd(m, q, qd, jnp.array([10.0, 0.0]), [0.0, 0.0, -9.81])
    assert float(qdd[0]) > 0.1  # cart accelerates along +y
    # pole is an inverted pendulum: pushing the cart +y swings pole about x
    assert abs(float(qdd[1])) > 1e-3


def test_ant_drops_and_settles():
    """Ant released above ground settles to a stable standing contact."""
    m = load_mjcf(asset_path("mjcf/nv_ant.xml"))
    params = SimParams(
        dt=1.0 / 60, substeps=2, solver_iterations=2,
        gravity=jnp.array([0.0, 0, -9.81]),
    )
    q = jnp.array(m.qpos0)
    q = q.at[2].set(0.55)
    state = SimState(q=q, qd=jnp.zeros(m.nv))
    step = jax.jit(lambda s: physics_step(m, s, jnp.zeros(m.nv), params))
    for _ in range(120):  # 2 sim-seconds
        out = step(state)
        state = out.state
    z = float(state.q[2])
    assert 0.1 < z < 0.6, f"torso height {z} after settling"
    # roughly at rest
    assert float(jnp.max(jnp.abs(state.qd))) < 1.0
    # contact force roughly supports the weight
    total_w = float(jnp.sum(m.body_mass)) * 9.81
    fz = float(jnp.sum(out.body_force[:, 2]))
    assert 0.5 * total_w < fz < 1.5 * total_w
    assert bool(jnp.all(jnp.isfinite(state.q)))
