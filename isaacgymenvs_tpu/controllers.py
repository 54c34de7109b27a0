"""Task-space controller library (pure jnp).

TPU-native re-design of the reference's Factory controller module
(reference isaacgymenvs/tasks/factory/factory_control.py): differential
IK variants (_get_delta_dof_pos :233 -- pinv / trans / dls / svd),
joint-space PD with inertial compensation, task-space impedance, and
operational-space control with the task-space mass matrix
(compute_dof_torque :74-176), plus the analytic body Jacobian (:293 --
here assembled from the engine's world-frame joint subspace). Also used by
FrankaCubeStack's OSC (reference franka_cube_stack.py:601).

All functions are single-env pure; vmap over the env axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import maths
from .engine.dynamics import Kin


def body_jacobian(kin: Kin, anc: jax.Array, dof_body: np.ndarray, body: int,
                  point: jax.Array) -> jax.Array:
    """6 x nv Jacobian of a body-attached world point: rows = (angular,
    linear). Assembled from the world-frame joint subspace S (the engine
    equivalent of acquire_jacobian_tensor, SURVEY.md 2.1)."""
    path = anc[body][dof_body]  # (nv,) 1 for dofs on the root->body path
    S_ang = kin.S[:, :3] * path[:, None]  # (nv, 3)
    # linear velocity of the point from dof d: S_lin_d + S_ang_d x point
    lin = (kin.S[:, 3:] + jnp.cross(kin.S[:, :3], point)) * path[:, None]
    return jnp.concatenate([S_ang.T, lin.T], axis=0)  # (6, nv)


def pose_error(pos, quat, target_pos, target_quat, jacobian_type="geometric"):
    """(6,) task-space error: (angular axis*angle, linear)."""
    dq = maths.quat_mul(target_quat, maths.quat_conjugate(quat))
    angle, axis = maths.quat_to_angle_axis(dq)
    angle = maths.normalize_angle(angle)
    rot_err = axis * angle
    return jnp.concatenate([rot_err, target_pos - pos])


def get_delta_dof_pos(delta_pose, jacobian, method: str = "dls", lam: float = 0.1):
    """Differential IK (reference factory_control.py:233-290).

    delta_pose: (6,) (angular, linear); jacobian: (6, nv) -> (nv,)."""
    J = jacobian
    if method == "pinv":
        return jnp.linalg.pinv(J) @ delta_pose
    if method == "trans":
        return J.T @ delta_pose
    if method == "dls":  # damped least squares (Levenberg-Marquardt)
        A = J @ J.T + (lam**2) * jnp.eye(6)
        return J.T @ jnp.linalg.solve(A, delta_pose)
    if method == "svd":
        u, s, vt = jnp.linalg.svd(J, full_matrices=False)
        s_inv = jnp.where(s > 1e-5, 1.0 / s, 0.0)
        return vt.T @ (s_inv * (u.T @ delta_pose))
    raise ValueError(method)


def joint_space_pd(
    q_err, qd, kp, kd, mass_matrix=None
) -> jax.Array:
    """Joint-space PD, optionally with inertial compensation
    (factory_control.py joint_space_ik/joint_space_id)."""
    tau = kp * q_err - kd * qd
    if mass_matrix is not None:
        tau = mass_matrix @ tau
    return tau


def task_space_impedance(jacobian, pose_err, body_vel, kp, kd) -> jax.Array:
    """tau = J^T (kp*err - kd*xdot) (task_space_impedance)."""
    wrench = kp * pose_err - kd * body_vel
    return jacobian.T @ wrench


def operational_space_control(
    jacobian, mass_matrix_inv, pose_err, body_vel, qd, kp, kd,
    null_kp: float = 10.0, null_kd: float = 1.0, q_err=None,
) -> jax.Array:
    """OSC with the task-space mass matrix (factory_control.py:148-176 and
    franka_cube_stack.py:601 _compute_osc_torques):
        Lambda = (J M^-1 J^T)^-1
        tau = J^T Lambda (kp*err - kd*xdot)  [+ nullspace posture task]
    """
    J = jacobian
    JMJ = J @ mass_matrix_inv @ J.T + 1e-6 * jnp.eye(6)
    lam = jnp.linalg.inv(JMJ)
    wrench = lam @ (kp * pose_err - kd * body_vel)
    tau = J.T @ wrench
    if q_err is not None:
        # dynamically-consistent nullspace projection
        Jbar = mass_matrix_inv @ J.T @ lam
        null_tau = null_kp * q_err - null_kd * qd
        tau = tau + (jnp.eye(J.shape[1]) - J.T @ Jbar.T) @ null_tau
    return tau
