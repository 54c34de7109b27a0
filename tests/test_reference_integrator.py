"""Golden-trajectory tests: the float32 engine vs the independent float64
NumPy reference dynamics (tests/reference_integrator.py; SURVEY.md 4(b),
BASELINE.json correctness gate -- see the reference module docstring for
the stated error-bound rationale)."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.engine import SimParams, SimState, physics_step
from isaacgymenvs_tpu.model.spec import (
    FREE,
    GEOM_SPHERE,
    HINGE,
    ModelBuilder,
)
from tests import reference_integrator as ref


def _tip_geom(b, body, pos=(0.0, 0.0, 0.0)):
    """Inert sphere geom so the constraint assembly is non-empty."""
    b.add_geom(body, GEOM_SPHERE, pos, (0, 0, 0, 1), (0.01, 0, 0), 0.5)


def _roll(model, q0, qd0, params, n):
    st = SimState(q=jnp.asarray(q0), qd=jnp.asarray(qd0))
    step = jax.jit(
        lambda s: physics_step(model, s, jnp.zeros(model.nv), params)
    )
    qs = [np.asarray(st.q)]
    for _ in range(n):
        st = step(st).state
        qs.append(np.asarray(st.q))
    return np.stack(qs)


def test_pendulum_vs_float64_rk4():
    """1 m point-mass pendulum released at 60 degrees: 2 s trajectory
    within 0.02 rad of float64 RK4 and <1% energy drift."""
    L, m = 1.0, 1.0
    theta0 = np.deg2rad(60.0)
    b = ModelBuilder()
    rod = b.add_body(
        parent=-1, name="rod", pos=(0, 0, 2.0), quat=(0, 0, 0, 1),
        jnt_type=HINGE, jnt_axis=(0, 1, 0), joint_name="h",
        mass=m, ipos=(0, 0, -L), inertia=np.eye(3) * 1e-8,
    )
    _tip_geom(b, rod, (0, 0, -L))
    model = b.finalize()
    # engine hinge angle about +y from the -z rest pose == ref theta
    dt, substeps = 1.0 / 60.0, 4
    n = 120  # 2 s
    params = SimParams(dt=dt, substeps=substeps)
    qs = _roll(model, np.array([theta0]), np.zeros(1), params, n)
    golden = ref.pendulum_trajectory(theta0, 0.0, L, dt, n)
    err = np.abs(qs[:, 0] - golden[:, 0])
    assert err.max() < 0.02, err.max()
    # energy drift of the engine trajectory (finite-difference omega)
    om = np.gradient(qs[:, 0], dt)
    E = 0.5 * m * (L * om) ** 2 + m * ref.G * L * (1 - np.cos(qs[:, 0]))
    E0 = m * ref.G * L * (1 - np.cos(theta0))
    assert np.abs(E[5:-5] - E0).max() / E0 < 0.01


def test_double_pendulum_vs_float64_rk4():
    """Two-link point-mass chain vs the float64 Lagrangian ODE over 0.5 s
    (chaotic system: short horizon, 0.05 rad bound)."""
    l1 = l2 = 0.5
    m1 = m2 = 1.0
    t1, t2 = np.deg2rad(20.0), np.deg2rad(-10.0)
    b = ModelBuilder()
    link1 = b.add_body(
        parent=-1, name="l1", pos=(0, 0, 2.0), quat=(0, 0, 0, 1),
        jnt_type=HINGE, jnt_axis=(0, 1, 0), joint_name="j1",
        mass=m1, ipos=(0, 0, -l1), inertia=np.eye(3) * 1e-8,
    )
    link2 = b.add_body(
        parent=link1, name="l2", pos=(0, 0, -l1), quat=(0, 0, 0, 1),
        jnt_type=HINGE, jnt_axis=(0, 1, 0), joint_name="j2",
        mass=m2, ipos=(0, 0, -l2), inertia=np.eye(3) * 1e-8,
    )
    _tip_geom(b, link2, (0, 0, -l2))
    model = b.finalize()
    dt = 1.0 / 120.0
    n = 60  # 0.5 s
    params = SimParams(dt=dt, substeps=4)
    qs = _roll(model, np.array([t1, t2 - t1]), np.zeros(2), params, n)
    golden = ref.double_pendulum_trajectory(
        [t1, t2, 0.0, 0.0], l1, l2, m1, m2, dt, n
    )
    # engine q2 is RELATIVE to link1; reference angles are absolute
    abs1 = qs[:, 0]
    abs2 = qs[:, 0] + qs[:, 1]
    err = max(
        np.abs(abs1 - golden[:, 0]).max(), np.abs(abs2 - golden[:, 1]).max()
    )
    assert err < 0.05, err


def test_free_body_ballistic_and_spin_vs_closed_form():
    """Free body: translation matches the closed form within the
    first-order bound 0.5*g*dt*t; principal-axis spin attitude within
    1e-3 quaternion distance over 1 s."""
    b = ModelBuilder()
    body = b.add_body(
        parent=-1, name="b", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=1.0, inertia=np.diag([0.02, 0.02, 0.02]),
    )
    b.qpos0_free[body] = (
        np.array([0, 0, 10.0], np.float32),
        np.array([0, 0, 0, 1], np.float32),
    )
    _tip_geom(b, body)
    model = b.finalize().replace(plane_contacts=False)
    dt = 1.0 / 60.0
    n = 60
    v0 = np.array([1.0, 0.5, 2.0])
    w0 = np.array([0.0, 0.0, 4.0])  # principal-axis spin
    qd0 = np.zeros(6)
    # engine free-joint linear dofs store v - w x p (world-origin twist)
    qd0[:3] = v0 - np.cross(w0, np.array([0.0, 0, 10.0]))
    qd0[3:] = w0
    params = SimParams(dt=dt, substeps=2)
    qs = _roll(model, np.asarray(model.qpos0), qd0, params, n)
    t = n * dt
    p_ref, _ = ref.ballistic([0, 0, 10.0], v0, t)
    tol = 0.5 * ref.G * dt * t  # semi-implicit Euler first-order bound
    assert np.abs(qs[-1, :3] - p_ref).max() < tol + 1e-4
    q_ref = ref.spinning_quat(w0, t)
    qq = qs[-1, 3:7]
    d = min(np.linalg.norm(qq - q_ref), np.linalg.norm(qq + q_ref))
    assert d < 1e-2, (qq, q_ref)


def test_bounce_apex_vs_closed_form():
    """Restitution-0.7 sphere dropped from 0.5 m rebounds to within 15%
    of the analytic apex e^2 * h0 (solver bounce + Baumgarte overlap)."""
    from isaacgymenvs_tpu.sdf.builder import add_contact_points

    h0, e, r = 0.5, 0.7, 0.05
    b = ModelBuilder()
    body = b.add_body(
        parent=-1, name="ball", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=0.2, inertia=np.eye(3) * 2e-4,
    )
    b.qpos0_free[body] = (
        np.array([0, 0, h0 + r], np.float32),
        np.array([0, 0, 0, 1], np.float32),
    )
    b.add_geom(body, GEOM_SPHERE, (0, 0, 0), (0, 0, 0, 1), (r, 0, 0), 0.5)
    m = b.finalize()
    m, idx = add_contact_points(
        m, body, np.array([[0.0, 0.0, -r]], np.float32), friction=0.5
    )
    m = m.replace(cpoint_restitution=jnp.zeros(m.ncp).at[idx[0]].set(e))
    params = SimParams(dt=1 / 240, substeps=2, baumgarte_erp=0.05)
    st = SimState(q=m.qpos0, qd=jnp.zeros(m.nv))
    step = jax.jit(lambda s: physics_step(m, s, jnp.zeros(m.nv), params))
    zs = []
    for _ in range(300):
        st = step(st).state
        zs.append(float(st.q[2]))
    zs = np.asarray(zs)
    # first rebound apex after the initial descent
    imp = int(np.argmin(zs[:150]))
    apex = zs[imp:].max() - r
    v_imp = np.sqrt(2 * ref.G * h0)
    want = ref.bounce_apex(v_imp, e)
    assert abs(apex - want) / want < 0.15, (apex, want)
