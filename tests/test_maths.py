"""Unit tests for the quaternion/spatial math library (ports the intent of
the reference's poselib rotation tests, SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu import maths

jax.config.update("jax_enable_x64", False)


def rand_quat(key, n=32):
    q = jax.random.normal(key, (n, 4))
    return maths.quat_unit(q)


def test_quat_mul_identity():
    key = jax.random.PRNGKey(0)
    q = rand_quat(key)
    ident = jnp.tile(jnp.array([0.0, 0, 0, 1]), (q.shape[0], 1))
    np.testing.assert_allclose(maths.quat_mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(maths.quat_mul(ident, q), q, atol=1e-6)


def test_quat_mul_vs_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    qa, qb = rand_quat(k1), rand_quat(k2)
    m = maths.quat_to_matrix(maths.quat_mul(qa, qb))
    m_ref = maths.quat_to_matrix(qa) @ maths.quat_to_matrix(qb)
    np.testing.assert_allclose(m, m_ref, atol=1e-5)


def test_quat_rotate_matches_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    q = rand_quat(k1)
    v = jax.random.normal(k2, (32, 3))
    r1 = maths.quat_rotate(q, v)
    r2 = jnp.einsum("bij,bj->bi", maths.quat_to_matrix(q), v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_quat_rotate_inverse_roundtrip():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    q = rand_quat(k1)
    v = jax.random.normal(k2, (32, 3))
    np.testing.assert_allclose(
        maths.quat_rotate_inverse(q, maths.quat_rotate(q, v)), v, atol=1e-5
    )


def test_quat_angle_axis_roundtrip():
    key = jax.random.PRNGKey(4)
    angle = jax.random.uniform(key, (16,), minval=0.1, maxval=3.0)
    axis = maths.normalize(jax.random.normal(key, (16, 3)))
    q = maths.quat_from_angle_axis(angle, axis)
    a2, ax2 = maths.quat_to_angle_axis(q)
    np.testing.assert_allclose(a2, angle, atol=1e-5)
    np.testing.assert_allclose(ax2, axis, atol=1e-4)


def test_matrix_quat_roundtrip():
    q = rand_quat(jax.random.PRNGKey(5), 64)
    m = maths.quat_to_matrix(q)
    q2 = maths.matrix_to_quat(m)
    # sign-ambiguous; compare rotation action
    np.testing.assert_allclose(maths.quat_to_matrix(q2), m, atol=1e-4)


def test_quat_exp_small_angle():
    phi = jnp.array([[1e-8, 0, 0], [0.3, -0.2, 0.1]])
    q = maths.quat_exp(phi)
    assert jnp.all(jnp.isfinite(q))
    np.testing.assert_allclose(q[0], jnp.array([5e-9, 0, 0, 1.0]), atol=1e-7)
    angle, axis = maths.quat_to_angle_axis(q[1:2])
    np.testing.assert_allclose(angle[0], jnp.linalg.norm(phi[1]), atol=1e-5)


def test_euler_roundtrip():
    roll = jnp.array([0.3, -0.5])
    pitch = jnp.array([0.2, 0.7])
    yaw = jnp.array([1.0, -2.0])
    q = maths.quat_from_euler_xyz(roll, pitch, yaw)
    r2, p2, y2 = maths.get_euler_xyz(q)
    two_pi = 2 * np.pi
    np.testing.assert_allclose(r2 % two_pi, roll % two_pi, atol=1e-5)
    np.testing.assert_allclose(p2 % two_pi, pitch % two_pi, atol=1e-5)
    np.testing.assert_allclose(y2 % two_pi, yaw % two_pi, atol=1e-5)


def test_slerp_endpoints():
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    q0, q1 = rand_quat(k1, 8), rand_quat(k2, 8)
    s0 = maths.quat_slerp(q0, q1, jnp.zeros(8))
    s1 = maths.quat_slerp(q0, q1, jnp.ones(8))
    np.testing.assert_allclose(
        maths.quat_to_matrix(s0), maths.quat_to_matrix(q0), atol=1e-4
    )
    np.testing.assert_allclose(
        maths.quat_to_matrix(s1), maths.quat_to_matrix(q1), atol=1e-4
    )


def test_scale_unscale():
    lo, hi = jnp.array([-1.5, 0.0]), jnp.array([0.5, 2.0])
    x = jnp.array([0.3, -0.7])
    np.testing.assert_allclose(
        maths.unscale(maths.scale(x, lo, hi), lo, hi), x, atol=1e-6
    )


def test_skew_cross():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([-0.5, 0.4, 2.0])
    np.testing.assert_allclose(maths.skew(a) @ b, jnp.cross(a, b), atol=1e-6)


def test_spatial_inertia_momentum():
    """h = I v must reproduce textbook linear/angular momentum."""
    mass = jnp.array(2.0)
    com = jnp.array([0.3, -0.2, 0.5])
    inertia_c = jnp.diag(jnp.array([0.1, 0.2, 0.3]))
    I = maths.spatial_inertia_at_origin(mass, com, inertia_c)
    omega = jnp.array([0.2, -1.0, 0.4])
    v_o = jnp.array([1.0, 0.5, -0.2])
    h = I @ jnp.concatenate([omega, v_o])
    v_com = v_o + jnp.cross(omega, com)
    p_ref = mass * v_com
    L_ref = inertia_c @ omega + jnp.cross(com, p_ref)
    np.testing.assert_allclose(h[3:], p_ref, atol=1e-5)
    np.testing.assert_allclose(h[:3], L_ref, atol=1e-5)


def test_heading_and_up():
    n = 4
    q = maths.quat_from_angle_axis(
        jnp.full((n,), 0.3), jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1))
    )
    inv_start = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (n, 1))
    to_target = jnp.tile(jnp.array([10.0, 0, 0]), (n, 1))
    vec0 = jnp.tile(jnp.array([1.0, 0, 0]), (n, 1))
    vec1 = jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1))
    tq, up_proj, heading_proj, _, _ = maths.compute_heading_and_up(
        q, inv_start, to_target, vec0, vec1, 2
    )
    np.testing.assert_allclose(up_proj, jnp.ones(n), atol=1e-5)
    np.testing.assert_allclose(heading_proj, jnp.cos(0.3) * jnp.ones(n), atol=1e-5)
