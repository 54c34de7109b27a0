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


def solve_contacts(
    model: Model,
    con: ContactData,
    minv_mul,  # callable: (nv, k) -> M^{-1} @ rhs
    qd_free: jax.Array,
    h,
    params: SimParams,
) -> SolveOut:
    """Projected block Gauss-Seidel over contact impulses.

    Solves for impulses lam (ncp, 3; z = normal) such that post-impulse
    point velocities satisfy vn >= vn_target (Baumgarte push-out) and
    |lam_t| <= mu * lam_n, then applies qd = qd_free + M^{-1} J^T lam.
    """
    ncp = con.J.shape[0]
    nv = con.J.shape[2]
    Jf = con.J.reshape(ncp * 3, nv)
    MinvJT = minv_mul(Jf.T)  # (nv, 3*ncp)
    A = Jf @ MinvJT  # (3*ncp, 3*ncp) Delassus operator
    A = A + 1e-6 * jnp.eye(ncp * 3)
    A = A.reshape(ncp, 3, ncp, 3)
    b = (Jf @ qd_free).reshape(ncp, 3)

    active = con.phi > -getattr(params, "contact_margin", 0.0)
    # Baumgarte: push out at beta*phi/h, capped (max_depenetration_velocity)
    vn_target = jnp.minimum(
        params.baumgarte_erp * jnp.maximum(con.phi, 0.0) / h,
        params.max_depenetration_velocity,
    )

    diag = jnp.stack([A[c, :, c, :] for c in range(ncp)])  # (ncp, 3, 3)
    inv_dnn = 1.0 / diag[:, 2, 2]
    # 2x2 tangential block inverses
    Dt = diag[:, :2, :2]
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

    lam = jnp.zeros((ncp, 3))

    def sweep(lam, _):
        for c in range(ncp):
            # residual velocity at contact c given current impulses
            r = jnp.einsum("ikl,kl->i", A[c], lam) + b[c]  # (3,)
            # normal update
            ln = jnp.maximum(lam[c, 2] - (r[2] - vn_target[c]) * inv_dnn[c], 0.0)
            dn = ln - lam[c, 2]
            r_t = r[:2] + A[c, :2, c, 2] * dn
            lt = lam[c, :2] - Dt_inv[c] @ r_t
            # friction-disk projection
            lt_norm = jnp.sqrt(jnp.sum(lt * lt) + 1e-12)
            cap = con.mu[c] * ln
            lt = lt * jnp.minimum(1.0, cap / lt_norm)
            new_c = jnp.where(active[c], jnp.array([lt[0], lt[1], ln]), jnp.zeros(3))
            lam = lam.at[c].set(new_c)
        return lam, None

    lam, _ = jax.lax.scan(sweep, lam, None, length=params.solver_pgs_iterations)

    qd = qd_free + MinvJT @ lam.reshape(ncp * 3)
    return SolveOut(qd=qd, impulse=lam, x=con.x)


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
