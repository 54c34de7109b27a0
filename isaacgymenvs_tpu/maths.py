"""Quaternion / spatial-transform math library (pure jnp).

TPU-native re-design of the reference's TorchScript math kernels
(reference: isaacgymenvs/utils/torch_jit_utils.py:41-280). All functions are
pure, shape-polymorphic over leading batch dims where possible, and trace
cleanly under jit/vmap.

Conventions (matching the reference / Isaac Gym):
  * quaternions are (x, y, z, w) -- LAST component is the scalar part
  * rotations are active: quat_rotate(q, v) rotates v by q
  * angles are radians
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# basic vector helpers
# ---------------------------------------------------------------------------


def normalize(x: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Unit-normalize along the last axis (ref torch_jit_utils.py:66)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def skew(v: jax.Array) -> jax.Array:
    """Cross-product matrix [v]x such that skew(v) @ u == cross(v, u).

    v: (..., 3) -> (..., 3, 3)
    """
    zeros = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            jnp.stack([zeros, -vz, vy], axis=-1),
            jnp.stack([vz, zeros, -vx], axis=-1),
            jnp.stack([-vy, vx, zeros], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# quaternion algebra (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(shape=()) -> jax.Array:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, xyzw layout (ref torch_jit_utils.py:42)."""
    x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.stack([x, y, z, w], axis=-1)


def quat_conjugate(q: jax.Array) -> jax.Array:
    """(ref torch_jit_utils.py:107)"""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_inv(q: jax.Array) -> jax.Array:
    return quat_conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_unit(q: jax.Array) -> jax.Array:
    return normalize(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (ref torch_jit_utils.py:81 quat_apply).

    Works over arbitrary broadcastable batch dims.
    """
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


# alias used pervasively in the reference
quat_apply = quat_rotate


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """(ref torch_jit_utils.py:95)"""
    return quat_rotate(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """(ref torch_jit_utils.py:119)"""
    theta = (angle / 2)[..., None]
    xyz = normalize(axis) * jnp.sin(theta)
    w = jnp.cos(theta)
    return quat_unit(jnp.concatenate([xyz, w], axis=-1))


def quat_to_angle_axis(q: jax.Array):
    """Returns (angle in [0, 2pi), axis). (ref torch_jit_utils.py:423)"""
    sin_theta_sq = jnp.sum(q[..., :3] ** 2, axis=-1)
    sin_theta = jnp.sqrt(sin_theta_sq)
    angle = 2.0 * jnp.arctan2(sin_theta, q[..., 3])
    axis = jnp.where(
        (sin_theta_sq > 1e-12)[..., None],
        q[..., :3] / jnp.maximum(sin_theta, 1e-12)[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), q[..., :3].shape),
    )
    return angle, axis


def quat_exp(phi: jax.Array) -> jax.Array:
    """Exponential map: rotation vector (..., 3) -> quaternion (..., 4).

    Safe at phi ~ 0 (2nd-order Taylor). (ref exp_map_to_quat,
    torch_jit_utils.py:589)
    """
    angle_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle_sq, 1e-24))
    half = 0.5 * angle
    small = angle_sq < 1e-12
    sin_half_over = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([phi * sin_half_over, w], axis=-1)


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate orientation by world-frame angular velocity omega over dt."""
    dq = quat_exp(omega * dt)
    return quat_unit(quat_mul(dq, q))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion (..., 4) xyzw -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) xyzw.

    Branch-free (jit-safe) Shepperd's method via jnp.where over the four cases.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # case w: tr > 0
    sw = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
    qw = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4.0], axis=-1)
    # case x
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    qx = jnp.stack([sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], axis=-1)
    # case y
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    qy = jnp.stack([(m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy, (m02 - m20) / sy], axis=-1)
    # case z
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    qz = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0, (m10 - m01) / sz], axis=-1)

    use_w = tr > 0.0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = jnp.where(
        use_w[..., None], qw, jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz))
    )
    return quat_unit(q)


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical interpolation (ref torch_jit_utils.py:595)."""
    cos_half = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(cos_half < 0, -q1, q1)
    cos_half = jnp.abs(cos_half)
    half = jnp.arccos(jnp.clip(cos_half, -1.0, 1.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    small = sin_half < 1e-4
    t = jnp.asarray(t)
    if t.ndim < q0.ndim:
        t = t[..., None]
    ratio_a = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * half) / jnp.maximum(sin_half, 1e-9))
    ratio_b = jnp.where(small, t, jnp.sin(t * half) / jnp.maximum(sin_half, 1e-9))
    return quat_unit(ratio_a * q0 + ratio_b * q1)


def get_euler_xyz(q: jax.Array):
    """Quaternion -> (roll, pitch, yaw), each wrapped to [0, 2pi)
    (ref torch_jit_utils.py:176)."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0, jnp.sign(sinp) * (jnp.pi / 2.0), jnp.arcsin(jnp.clip(sinp, -1.0, 1.0))
    )

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    two_pi = 2.0 * jnp.pi
    return roll % two_pi, pitch % two_pi, yaw % two_pi


def quat_from_euler_xyz(roll, pitch, yaw) -> jax.Array:
    """(ref torch_jit_utils.py:199)"""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def quat_axis(q: jax.Array, axis: int = 0) -> jax.Array:
    """Rotated basis vector (ref torch_jit_utils.py:656 quat_axis)."""
    basis = jnp.zeros(q.shape[:-1] + (3,)).at[..., axis].set(1.0)
    return quat_rotate(q, basis)


def normalize_angle(x: jax.Array) -> jax.Array:
    """Wrap to (-pi, pi] (ref torch_jit_utils.py:130)."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def calc_heading(q: jax.Array) -> jax.Array:
    """Heading angle about z of the x-axis of q (ref torch_jit_utils.py:638)."""
    ref_dir = jnp.zeros(q.shape[:-1] + (3,)).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def calc_heading_quat(q: jax.Array) -> jax.Array:
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,)).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat_inv(q: jax.Array) -> jax.Array:
    """(ref torch_jit_utils.py:656)"""
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,)).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis)


# ---------------------------------------------------------------------------
# rigid transforms (q, t)
# ---------------------------------------------------------------------------


def tf_apply(q: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
    """(ref torch_jit_utils.py:139)"""
    return quat_rotate(q, v) + t


def tf_vector(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(q, v)


def tf_inverse(q: jax.Array, t: jax.Array):
    """(ref torch_jit_utils.py:134)"""
    q_inv = quat_conjugate(q)
    return q_inv, -quat_rotate(q_inv, t)


def tf_combine(q1, t1, q2, t2):
    """(ref torch_jit_utils.py:148)"""
    return quat_mul(q1, q2), quat_rotate(q1, t2) + t1


# ---------------------------------------------------------------------------
# scaling / clamping helpers (ref torch_jit_utils.py:229-246)
# ---------------------------------------------------------------------------


def tensor_clamp(t, lo, hi):
    return jnp.maximum(jnp.minimum(t, hi), lo)


def scale(x, lower, upper):
    return 0.5 * (x + 1.0) * (upper - lower) + lower


def unscale(x, lower, upper):
    return (2.0 * x - upper - lower) / (upper - lower)


def saturate(x, lower, upper):
    return jnp.clip(x, lower, upper)


# ---------------------------------------------------------------------------
# locomotion helpers (ref torch_jit_utils.py:248-290)
# ---------------------------------------------------------------------------


def compute_heading_and_up(torso_rotation, inv_start_rot, to_target, vec0, vec1, up_idx: int):
    """(ref torch_jit_utils.py:248)"""
    target_dirs = normalize(to_target)
    torso_quat = quat_mul(torso_rotation, inv_start_rot)
    up_vec = quat_rotate(torso_quat, vec1)
    heading_vec = quat_rotate(torso_quat, vec0)
    up_proj = up_vec[..., up_idx]
    heading_proj = jnp.sum(heading_vec * target_dirs, axis=-1)
    return torso_quat, up_proj, heading_proj, up_vec, heading_vec


def compute_rot(torso_quat, velocity, ang_velocity, targets, torso_positions):
    """(ref torch_jit_utils.py:266)"""
    vel_loc = quat_rotate_inverse(torso_quat, velocity)
    angvel_loc = quat_rotate_inverse(torso_quat, ang_velocity)
    roll, pitch, yaw = get_euler_xyz(torso_quat)
    walk_target_angle = jnp.arctan2(
        targets[..., 2] - torso_positions[..., 2], targets[..., 0] - torso_positions[..., 0]
    )
    angle_to_target = walk_target_angle - yaw
    return vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target


# ---------------------------------------------------------------------------
# spatial (6D) algebra -- Featherstone-style, all in WORLD coordinates with
# the WORLD ORIGIN as the common reference point.
#
# motion vector   v = (omega, v_o)      : angular, linear-at-origin
# force  vector   f = (n_o, p)          : torque-about-origin, linear force
# ---------------------------------------------------------------------------


def spatial_cross_motion(v: jax.Array, m: jax.Array) -> jax.Array:
    """v x m  for motion vectors m. v, m: (..., 6)."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate([jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vo, mw)], axis=-1)


def spatial_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
    """v x* f  for force vectors f. v, f: (..., 6)."""
    w, vo = v[..., :3], v[..., 3:]
    n, p = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(vo, p), jnp.cross(w, p)], axis=-1)


def spatial_inertia_at_origin(mass, com_world, inertia_world):
    """6x6 spatial inertia about the world origin.

    mass: (...,), com_world: (..., 3), inertia_world: (..., 3, 3) about the CoM.
    With v = (omega, v_o) and h = (L_o, p):
        p   = m v_o - m [c]x omega
        L_o = (I_c - m [c]x [c]x) omega + m [c]x v_o
    """
    cx = skew(com_world)
    m = mass[..., None, None]
    top_left = inertia_world - m * (cx @ cx)
    top_right = m * cx
    bottom_left = -m * cx
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    bottom_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def quat_to_tan_norm(q: jax.Array) -> jax.Array:
    """6D rotation representation: rotated x-axis (tangent) + z-axis
    (normal) (ref torch_jit_utils quat_to_tan_norm / poselib)."""
    tan = quat_rotate(q, jnp.zeros(q.shape[:-1] + (3,)).at[..., 0].set(1.0))
    norm = quat_rotate(q, jnp.zeros(q.shape[:-1] + (3,)).at[..., 2].set(1.0))
    return jnp.concatenate([tan, norm], axis=-1)
