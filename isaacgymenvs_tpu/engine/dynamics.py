"""Articulated rigid-body dynamics in generalized coordinates.

TPU-native replacement for the PhysX articulation pipeline the reference
drives through `gym.simulate` (reference isaacgymenvs/tasks/base/
vec_task.py:382 and SURVEY.md section 2.1). Everything here is a pure
function of (Model, q, qd, forces) designed so `vmap` over an env axis turns
each small per-body op into a wide batched op on the VPU/MXU.

Formulation: Featherstone spatial algebra with ALL quantities expressed in
world coordinates using the WORLD ORIGIN as the common reference point
(RBDA ch.7 "absolute coordinates"). This removes every frame transform from
the sweeps: the mass matrix is a single pair of einsums over (nv, 6)
subspace vectors and (nbody, 6, 6) composite inertias -- ideal for batched
MXU execution -- and the bias force needs one subtree-mask matmul.

  motion vector v = (omega, v_o)  -- angular velocity, linear velocity of the
                                     body-fixed point at the world origin
  force  vector f = (n_o, f)      -- torque about the origin, linear force

Tree sweeps over bodies are unrolled Python loops at trace time (nbody is
10-40), each iteration a batched gather-free op.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import maths
from ..model.spec import FIXED, FREE, HINGE, SLIDE, Model


@struct.dataclass
class SimParams:
    """Simulation operating point (mirrors the reference's sim cfg block,
    e.g. cfg/task/Ant.yaml:42-53: dt, substeps, gravity, solver knobs)."""

    dt: float = 1.0 / 60.0
    substeps: int = struct.field(pytree_node=False, default=2)
    # extra internal integration slices per substep
    solver_iterations: int = struct.field(pytree_node=False, default=1)
    # PGS contact-impulse sweeps (maps to num_position_iterations-class knobs)
    solver_pgs_iterations: int = struct.field(pytree_node=False, default=8)
    gravity: jax.Array = struct.field(
        default_factory=lambda: jnp.array([0.0, 0.0, -9.81])
    )
    baumgarte_erp: float = 0.2  # penetration push-out rate (fraction per step)
    max_depenetration_velocity: float = 10.0  # cfg physx knob (Ant.yaml:55)
    contact_margin: float = 0.0
    limit_stiffness: float = 400.0
    limit_damping: float = 20.0  # made implicit (added to the M diagonal)


@struct.dataclass
class SimState:
    """Generalized state; the TPU equivalent of the reference's global
    dof/root state buffers (acquire_dof_state_tensor etc., SURVEY.md 2.1)."""

    q: jax.Array  # (nq,)
    qd: jax.Array  # (nv,)


class Kin(NamedTuple):
    """Forward-kinematics products (all world frame)."""

    x: jax.Array  # (nbody, 3) body frame origins
    quat: jax.Array  # (nbody, 4)
    com: jax.Array  # (nbody, 3) CoM positions
    inertia_w: jax.Array  # (nbody, 3, 3) rotational inertia about CoM
    S: jax.Array  # (nv, 6) joint motion subspace
    Sdot: jax.Array  # (nv, 6) time derivative of S
    v: jax.Array  # (nbody, 6) spatial velocity (origin-referenced)


# ---------------------------------------------------------------------------
# static topology helpers (host-side, depend only on hashable model metadata)
# ---------------------------------------------------------------------------


def ancestor_matrix(model: Model) -> np.ndarray:
    """A[i, j] = 1 iff body j is an ancestor of (or equal to) body i."""
    n = model.nbody
    A = np.zeros((n, n), np.float32)
    for i in range(n):
        j = i
        while j != -1:
            A[i, j] = 1.0
            j = model.body_parent[j]
    return A


def dof_ancestor_mask(model: Model) -> np.ndarray:
    """L[i, j] = 1 iff dof j belongs to an ancestor-or-self body of dof i's
    body AND j <= i (lower-triangular inclusion used to assemble M)."""
    A = ancestor_matrix(model)
    nv = model.nv
    L = np.zeros((nv, nv), np.float32)
    for i in range(nv):
        for j in range(i + 1):
            if A[model.dof_body[i], model.dof_body[j]]:
                L[i, j] = 1.0
    return L


def scalar_dof_q_adr(model: Model) -> np.ndarray:
    """q index per dof for scalar (hinge/slide) dofs, -1 for free dofs."""
    out = np.full(model.nv, -1, np.int64)
    for i in range(model.nbody):
        if model.jnt_type[i] in (HINGE, SLIDE):
            out[model.v_adr[i]] = model.q_adr[i]
    return out


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------


def forward_kinematics(model: Model, q: jax.Array, qd: jax.Array) -> Kin:
    """Single tree sweep computing frames, joint subspaces, velocities.

    Pure; call under vmap for the env batch.
    """
    xs = [None] * model.nbody
    qs = [None] * model.nbody
    v = [None] * model.nbody
    S_rows = [None] * model.nv
    Sdot_rows = [None] * model.nv

    zero3 = jnp.zeros(3)
    ident = jnp.array([0.0, 0.0, 0.0, 1.0])
    e3 = jnp.eye(3)

    for i in range(model.nbody):
        p = model.body_parent[i]
        if p == -1:
            xp, qp, vp = zero3, ident, jnp.zeros(6)
        else:
            xp, qp, vp = xs[p], qs[p], v[p]
        w_p, vo_p = vp[:3], vp[3:]

        # frame after the fixed parent offset, before the joint
        X_x = xp + maths.quat_rotate(qp, model.body_pos[i])
        X_q = maths.quat_mul(qp, model.body_quat[i])

        jt = model.jnt_type[i]
        qa, va = model.q_adr[i], model.v_adr[i]

        if jt == FREE:
            xi = q[qa : qa + 3]
            qi = maths.quat_unit(q[qa + 3 : qa + 7])
            vel_lin = qd[va : va + 3]  # world velocity of body origin
            omega = qd[va + 3 : va + 6]  # world angular velocity
            # S columns: translations (0, e), rotations (e, p x e)
            for k in range(3):
                S_rows[va + k] = jnp.concatenate([zero3, e3[k]])
                Sdot_rows[va + k] = jnp.zeros(6)
            for k in range(3):
                S_rows[va + 3 + k] = jnp.concatenate([e3[k], jnp.cross(xi, e3[k])])
                Sdot_rows[va + 3 + k] = jnp.concatenate(
                    [zero3, jnp.cross(vel_lin, e3[k])]
                )
            vi = jnp.concatenate(
                [omega, vel_lin - jnp.cross(omega, xi)]
            )  # v_o = pdot - w x p
        elif jt == HINGE:
            theta = q[qa]
            axis_b = model.jnt_axis[i]
            jq = maths.quat_from_angle_axis(theta, axis_b)
            qi = maths.quat_mul(X_q, jq)
            anchor = X_x + maths.quat_rotate(X_q, model.jnt_pos[i])
            xi = anchor - maths.quat_rotate(qi, model.jnt_pos[i])
            ax_w = maths.quat_rotate(X_q, axis_b)  # axis fixed in parent & child
            S_i = jnp.concatenate([ax_w, jnp.cross(anchor, ax_w)])
            # axis/anchor move with the parent body
            ax_dot = jnp.cross(w_p, ax_w)
            v_anchor = vo_p + jnp.cross(w_p, anchor)
            Sdot_i = jnp.concatenate(
                [ax_dot, jnp.cross(v_anchor, ax_w) + jnp.cross(anchor, ax_dot)]
            )
            S_rows[va] = S_i
            Sdot_rows[va] = Sdot_i
            vi = vp + S_i * qd[va]
        elif jt == SLIDE:
            ax_w = maths.quat_rotate(X_q, model.jnt_axis[i])
            xi = X_x + ax_w * q[qa]
            qi = X_q
            S_i = jnp.concatenate([zero3, ax_w])
            Sdot_rows[va] = jnp.concatenate([zero3, jnp.cross(w_p, ax_w)])
            S_rows[va] = S_i
            vi = vp + S_i * qd[va]
        else:  # FIXED
            xi, qi, vi = X_x, X_q, vp

        xs[i], qs[i], v[i] = xi, qi, vi

    x = jnp.stack(xs)
    quat = jnp.stack(qs)
    vel = jnp.stack(v)
    S = jnp.stack(S_rows) if model.nv else jnp.zeros((0, 6))
    Sdot = jnp.stack(Sdot_rows) if model.nv else jnp.zeros((0, 6))

    R = maths.quat_to_matrix(quat)
    com = x + jnp.einsum("bij,bj->bi", R, model.body_ipos)
    inertia_w = jnp.einsum("bij,bjk,blk->bil", R, model.body_inertia, R)
    return Kin(x=x, quat=quat, com=com, inertia_w=inertia_w, S=S, Sdot=Sdot, v=vel)


# ---------------------------------------------------------------------------
# dynamics
# ---------------------------------------------------------------------------


def mass_matrix(model: Model, kin: Kin, masks) -> jax.Array:
    """CRBA in world/origin coordinates.

    M[i, j] = S_i^T I^C_{body(i)} S_j for j an ancestor dof of i. With every
    S in the same coordinates this collapses to two einsums + a mask.
    """
    anc, dof_mask = masks
    I_o = maths.spatial_inertia_at_origin(model.body_mass, kin.com, kin.inertia_w)
    # composite inertia: IC[b] = sum_{k in subtree(b)} I_o[k]
    # subtree(b) = {k : b is ancestor-or-self of k} -> anc[k, b] = 1
    IC = jnp.einsum("kb,kij->bij", anc, I_o)
    dof_body = np.asarray(model.dof_body)
    F = jnp.einsum("dij,dj->di", IC[dof_body], kin.S)  # (nv, 6)
    W = F @ kin.S.T  # (nv, nv)
    Ml = W * dof_mask
    M = Ml + Ml.T - jnp.diag(jnp.diag(Ml))
    return M + jnp.diag(model.armature)


def bias_force(
    model: Model,
    kin: Kin,
    qd: jax.Array,
    gravity: jax.Array,
    f_ext: jax.Array,
    masks,
) -> jax.Array:
    """C(q, qd) - S^T f_ext : generalized bias so that M qdd = tau - C.

    f_ext: (nbody, 6) external spatial forces (origin-referenced), e.g.
    contacts. Gravity enters as a uniform spatial acceleration field.
    """
    anc, _ = masks
    I_o = maths.spatial_inertia_at_origin(model.body_mass, kin.com, kin.inertia_w)
    # velocity-product acceleration: zeta_b = sum_{d in path(b)} Sdot_d qd_d
    # path(b) dofs live on ancestor-or-self bodies: P[b, d] = anc[b, body(d)]
    dof_body = np.asarray(model.dof_body)
    P = anc[:, dof_body]  # (nbody, nv)
    zeta = P @ (kin.Sdot * qd[:, None])  # (nbody, 6)
    a_grav = jnp.concatenate([jnp.zeros(3), gravity])
    net = (
        jnp.einsum("bij,bj->bi", I_o, zeta - a_grav)
        + maths.spatial_cross_force(kin.v, jnp.einsum("bij,bj->bi", I_o, kin.v))
        - f_ext
    )
    # C_d = S_d . sum_{k in subtree(body(d))} net_k ; subtree sums via anc^T
    F_sub = anc.T @ net  # (nbody, 6): F_sub[b] = sum over subtree(b)
    return jnp.sum(kin.S * F_sub[dof_body], axis=-1)


def passive_force(model: Model, q: jax.Array, qd: jax.Array, params: SimParams, sq_adr):
    """Joint springs / limit penalties as (tau, D) where D is the diagonal
    velocity coefficient handled IMPLICITLY (added as h*D to M), making
    joint + limit damping unconditionally stable.

    Mirrors PhysX DOF properties (stiffness/damping/limits) the reference
    configures via set_actor_dof_properties (e.g. cartpole.py:112-116).
    """
    q_scalar = jnp.where(sq_adr >= 0, q[jnp.maximum(sq_adr, 0)], 0.0)
    q0_scalar = jnp.where(sq_adr >= 0, model.qpos0[jnp.maximum(sq_adr, 0)], 0.0)
    tau = -model.dof_stiffness * (q_scalar - q0_scalar)
    over = jnp.maximum(q_scalar - model.dof_limit_upper, 0.0)
    under = jnp.maximum(model.dof_limit_lower - q_scalar, 0.0)
    violating = (over > 0) | (under > 0)
    tau = tau + model.dof_limited * (-params.limit_stiffness * (over - under))
    D = model.dof_damping + model.dof_limited * jnp.where(
        violating, params.limit_damping, 0.0
    )
    return tau, D


def forward_dynamics(
    model: Model,
    q: jax.Array,
    qd: jax.Array,
    tau: jax.Array,
    f_ext: jax.Array,
    params: SimParams,
    masks,
    sq_adr,
    kin: Kin | None = None,
    h: float = 0.0,
):
    """qdd = (M + h D)^{-1} (tau + tau_passive - D qd - C).

    h > 0 enables implicit joint/limit damping (semi-implicit Euler in qd).
    Also returns minv_mul: rhs -> (M + h D)^{-1} rhs for the contact solver.
    """
    if kin is None:
        kin = forward_kinematics(model, q, qd)
    M = mass_matrix(model, kin, masks)
    C = bias_force(model, kin, qd, params.gravity, f_ext, masks)
    tau_p, D = passive_force(model, q, qd, params, sq_adr)
    Mh = M + h * jnp.diag(D)
    # dense symmetric-PD solve; nv is small (8-40)
    L, lower = jax.scipy.linalg.cho_factor(Mh, lower=True)
    qdd = jax.scipy.linalg.cho_solve((L, lower), tau + tau_p - D * qd - C)

    def minv_mul(rhs):
        return jax.scipy.linalg.cho_solve((L, lower), rhs)

    return qdd, minv_mul, kin


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


def integrate_positions(model: Model, q: jax.Array, qd_new: jax.Array, dt) -> jax.Array:
    """Position update of semi-implicit Euler (velocities already updated by
    the dynamics + contact-impulse solve); quaternion exponential for the
    free-joint rotation."""
    q_new = q
    for i in range(model.nbody):
        jt = model.jnt_type[i]
        qa, va = model.q_adr[i], model.v_adr[i]
        if jt == FREE:
            pos = q[qa : qa + 3] + dt * qd_new[va : va + 3]
            quat = maths.quat_integrate(
                maths.quat_unit(q[qa + 3 : qa + 7]), qd_new[va + 3 : va + 6], dt
            )
            q_new = q_new.at[qa : qa + 3].set(pos).at[qa + 3 : qa + 7].set(quat)
        elif jt in (HINGE, SLIDE):
            q_new = q_new.at[qa].set(q[qa] + dt * qd_new[va])
    return q_new
