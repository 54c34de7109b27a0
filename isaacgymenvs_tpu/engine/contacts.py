"""Contact generation + impulse solver (PGS, PhysX-style).

TPU-native replacement for the PhysX rigid-contact pipeline the reference
drives through gym.simulate (solver_type/num_position_iterations/
contact_offset knobs in cfg/task/*.yaml:48-61). Contact CANDIDATES are a
static list of points precomputed per geom at parse time (sphere centers,
capsule endpoints, box corners -- Model.cpoint_*) against the ground plane
z=0, so contact generation is branch-free dense math with no broadphase and
no dynamic shapes.

The solver is velocity-level projected block Gauss-Seidel over contact
impulses (normal complementarity + Coulomb friction-disk projection), i.e.
the same family as PhysX PGS; Baumgarte stabilization pushes penetration
out at a bounded velocity (mirroring max_depenetration_velocity). Being
impulse-based it is unconditionally stable, so no penalty-stiffness tuning
per model. The sweep is unrolled at trace time: every op is batched over
the env axis under vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..model.spec import Model
from .dynamics import Kin, SimParams


class ContactData(NamedTuple):
    J: jax.Array  # (ncp, 3, nv) point Jacobians (rows: x, y, z point velocity)
    phi: jax.Array  # (ncp,) penetration depth (>0 means penetrating)
    mu: jax.Array  # (ncp,) friction coefficients
    x: jax.Array  # (ncp, 3) world contact points


def contact_data(
    model: Model,
    kin: Kin,
    anc: jax.Array,
    plane_friction: jax.Array | float = 1.0,
) -> ContactData:
    """Candidate contact points vs the ground plane + their Jacobians."""
    bodies = np.asarray(model.cpoint_body)
    bq = kin.quat[bodies]
    bx = kin.x[bodies]
    x = bx + maths.quat_rotate(bq, model.cpoint_pos)  # (ncp, 3)
    phi = model.cpoint_radius - x[:, 2]

    # point Jacobian: dof d contributes S_lin_d + S_ang_d x r to the point
    # velocity, masked to dofs on the path root->body.
    dof_body = np.asarray(model.dof_body)
    P = anc[bodies][:, dof_body]  # (ncp, nv) path mask
    S_ang = kin.S[:, :3]  # (nv, 3)
    S_lin = kin.S[:, 3:]
    # velocity of world point x from dof d: S_lin_d + S_ang_d x x
    contrib = S_lin[None, :, :] + jnp.cross(
        jnp.broadcast_to(S_ang[None, :, :], (x.shape[0],) + S_ang.shape),
        x[:, None, :],
    )  # (ncp, nv, 3)
    J = (contrib * P[:, :, None]).transpose(0, 2, 1)  # (ncp, 3, nv)
    mu = model.cpoint_friction * plane_friction
    return ContactData(J=J, phi=phi, mu=mu, x=x)


class SolveOut(NamedTuple):
    qd: jax.Array  # (nv,) corrected velocity
    impulse: jax.Array  # (ncp, 3) contact impulses (x, y, z world)
    x: jax.Array  # (ncp, 3) contact points
    qfrc: jax.Array  # (nv,) generalized contact impulse J^T lam


def _project_cone(lam: jax.Array, mu: jax.Array, active: jax.Array) -> jax.Array:
    """Project (ncp, 3) impulses onto the Coulomb friction cone (disk
    linearization): lam_n >= 0, |lam_t| <= mu * lam_n; inactive -> 0."""
    ln = jnp.maximum(lam[:, 2], 0.0)
    lt = lam[:, :2]
    lt_norm = jnp.sqrt(jnp.sum(lt * lt, axis=-1) + 1e-12)
    scale = jnp.minimum(1.0, mu * ln / lt_norm)
    out = jnp.concatenate([lt * scale[:, None], ln[:, None]], axis=-1)
    return jnp.where(active[:, None], out, 0.0)


def solve_contacts(
    model: Model,
    con: ContactData,
    minv_mul,  # callable: (nv, k) -> M^{-1} @ rhs
    qd_free: jax.Array,
    h,
    params: SimParams,
) -> SolveOut:
    """Contact-impulse solve: velocity-level QP on the Delassus operator.

    min_lam 1/2 lam^T A lam + lam^T b  s.t. lam in friction cone, where
    A = J M^{-1} J^T and b = J qd_free - v_target (Baumgarte push-out on
    the normal rows, mirroring max_depenetration_velocity). Two solvers:

      * 'apgd' (default): accelerated projected gradient (FISTA) -- each
        iteration is ONE batched matvec on A + an elementwise cone
        projection. Under vmap this is an (envs, 3ncp, 3ncp) x
        (envs, 3ncp) matmul: ideal MXU work, and the trace is O(iters)
        regardless of contact count. Same convex-relaxation family as
        Chrono's APGD solver.
      * 'pgs': projected block Gauss-Seidel (the PhysX-style sweep),
        expressed as a fori_loop over contacts so the trace stays small.

    Applies qd = qd_free + M^{-1} J^T lam.
    """
    ncp = con.J.shape[0]
    nv = con.J.shape[2]
    Jf = con.J.reshape(ncp * 3, nv)
    MinvJT = minv_mul(Jf.T)  # (nv, 3*ncp)
    A = Jf @ MinvJT + 1e-6 * jnp.eye(ncp * 3)  # Delassus operator
    b = (Jf @ qd_free).reshape(ncp, 3)

    active = con.phi > -params.contact_margin
    # Baumgarte: push out at erp*phi/h, capped (max_depenetration_velocity)
    vn_target = jnp.minimum(
        params.baumgarte_erp * jnp.maximum(con.phi, 0.0) / h,
        params.max_depenetration_velocity,
    )
    b = b.at[:, 2].add(-vn_target)

    if params.solver == "apgd":
        lam = _solve_apgd(A, b, con.mu, active, params)
    else:
        lam = _solve_pgs(A, b, con.mu, active, params)

    lam_flat = lam.reshape(ncp * 3)
    qd = qd_free + MinvJT @ lam_flat
    return SolveOut(qd=qd, impulse=lam, x=con.x, qfrc=Jf.T @ lam_flat)


def _solve_apgd(A, b, mu, active, params: SimParams) -> jax.Array:
    ncp = b.shape[0]
    n = ncp * 3
    bf = b.reshape(n)
    # Lipschitz upper bound: inf-norm row sum of A (cheap, safe)
    L = jnp.maximum(jnp.max(jnp.sum(jnp.abs(A), axis=1)), 1e-8)
    step = 1.0 / L

    # FISTA momentum coefficients, precomputed host-side (static length)
    iters = params.solver_apgd_iterations
    t = [1.0]
    for _ in range(iters):
        t.append(0.5 * (1.0 + float(np.sqrt(1.0 + 4.0 * t[-1] ** 2))))
    betas = jnp.asarray(
        [(t[k] - 1.0) / t[k + 1] for k in range(iters)], jnp.float32
    )

    def it(carry, beta):
        lam, y = carry
        g = A @ y + bf
        lam_new = _project_cone(
            (y - step * g).reshape(ncp, 3), mu, active
        ).reshape(n)
        y = lam_new + beta * (lam_new - lam)
        return (lam_new, y), None

    lam0 = jnp.zeros(n)
    (lam, _), _ = jax.lax.scan(it, (lam0, lam0), betas)
    return lam.reshape(ncp, 3)


def _solve_pgs(A, b, mu, active, params: SimParams) -> jax.Array:
    """Block Gauss-Seidel sweep as a fori_loop (small trace, sequential)."""
    ncp = b.shape[0]
    A4 = A.reshape(ncp, 3, ncp, 3)
    diag_nn = jnp.stack([A4[c, 2, c, 2] for c in range(ncp)])
    inv_dnn = 1.0 / diag_nn
    Dt = jnp.stack([A4[c, :2, c, :2] for c in range(ncp)])  # (ncp, 2, 2)
    det = Dt[:, 0, 0] * Dt[:, 1, 1] - Dt[:, 0, 1] * Dt[:, 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    Dt_inv = (
        jnp.stack(
            [
                jnp.stack([Dt[:, 1, 1], -Dt[:, 0, 1]], axis=-1),
                jnp.stack([-Dt[:, 1, 0], Dt[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[:, None, None]
    )

    def contact_update(c, lam):
        r = jnp.einsum("ikl,kl->i", A4[c], lam) + b[c]
        ln = jnp.maximum(lam[c, 2] - r[2] * inv_dnn[c], 0.0)
        dn = ln - lam[c, 2]
        r_t = r[:2] + A4[c, :2, c, 2] * dn
        lt = lam[c, :2] - Dt_inv[c] @ r_t
        lt_norm = jnp.sqrt(jnp.sum(lt * lt) + 1e-12)
        lt = lt * jnp.minimum(1.0, mu[c] * ln / lt_norm)
        new_c = jnp.where(active[c], jnp.array([lt[0], lt[1], ln]), jnp.zeros(3))
        return lam.at[c].set(new_c)

    def sweep(lam, _):
        return jax.lax.fori_loop(0, ncp, contact_update, lam), None

    lam, _ = jax.lax.scan(
        sweep, jnp.zeros((ncp, 3)), None, length=params.solver_pgs_iterations
    )
    return lam


def body_contact_wrench(model: Model, out: SolveOut, kin: Kin, h):
    """Per-body contact force/torque (world, about the body origin) -- the
    TPU equivalent of force sensors / net_contact_force tensors
    (reference ant.py:174-178 create_asset_force_sensor)."""
    bodies = np.asarray(model.cpoint_body)
    F = out.impulse / h  # impulses -> average forces over the substep
    body_force = jax.ops.segment_sum(F, bodies, num_segments=model.nbody)
    torque = jnp.cross(out.x - kin.x[bodies], F)
    body_torque = jax.ops.segment_sum(torque, bodies, num_segments=model.nbody)
    return body_force, body_torque
