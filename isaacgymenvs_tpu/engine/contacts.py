"""Constraint generation + impulse solver.

TPU-native replacement for the PhysX rigid-contact pipeline the reference
drives through gym.simulate (solver_type/num_position_iterations/
contact_offset knobs in cfg/task/*.yaml:48-61). Three constraint sources,
all assembled into ONE Delassus system solved together:

  1. point-vs-ground-plane contacts: static candidate points precomputed
     per geom at parse time (sphere centers, capsule endpoints, box
     corners -- Model.cpoint_*), so contact generation is branch-free
     dense math with no broadphase and no dynamic shapes;
  2. geom-pair contacts: a STATIC list of (sphere, other-geom) pairs
     declared on the Model (Model.pair_*) with analytic narrowphase
     (sphere vs sphere/box/cylinder/capsule) -- the TPU answer to PhysX
     broadphase for the few cross-actor interactions tasks care about
     (ball-on-tray, object-in-hand);
  3. bilateral point constraints (Model.att_*): rigid 3-DOF anchors, the
     equivalent of gymapi attractors (reference ball_balance.py:305-320).

Every constraint contributes 3 rows in its local frame (t1, t2, n);
unilateral rows get Coulomb friction-cone projection, bilateral rows are
unprojected. The default solver is APGD (FISTA on the convex contact QP):
each iteration is one batched matvec + an elementwise projection, so under
vmap it runs as (envs, 3nc, 3nc) x (envs, 3nc) MXU matmuls and the trace
is O(iterations) regardless of constraint count. PGS (PhysX-style
sequential sweep) is kept as an option.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..model.spec import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_SPHERE,
    Model,
)
from .dynamics import Kin, SimParams


def num_constraints(model: Model) -> int:
    """Static total constraint-row groups for this model."""
    n = 0
    if model.ncp and model.plane_contacts:
        n += model.ncp
    n += len(model.pair_geom_a)
    n += len(model.ppair_point)
    n += len(model.spair_point)
    n += len(model.att_body)
    return n


class ConstraintData(NamedTuple):
    J: jax.Array  # (nc, 3, nv) rows: (t1, t2, n) relative-velocity Jacobian
    phi: jax.Array  # (nc,) penetration depth (>0 penetrating); 0 for bilateral
    err: jax.Array  # (nc, 3) anchor error in constraint frame (bilateral only)
    mu: jax.Array  # (nc,)
    bilateral: jax.Array  # (nc,) 1.0 -> no cone projection
    active: jax.Array  # (nc,) bool
    x: jax.Array  # (nc, 3) world application points
    frame: jax.Array  # (nc, 3, 3) rows t1, t2, n (world)
    rest: jax.Array  # (nc,) restitution coefficient (0 = inelastic)
    body_a: np.ndarray  # (nc,) static: body receiving +impulse
    body_b: np.ndarray  # (nc,) static: body receiving -impulse (-1 = world)


def _point_jacobian(kin: Kin, anc: jax.Array, dof_body: np.ndarray, bodies, x):
    """J st. J qd = world velocity of point x attached to `bodies`.
    bodies: static (k,) ints; x: (k, 3) world points -> (k, 3, nv)."""
    P = anc[bodies][:, dof_body]  # (k, nv) path mask
    S_ang = kin.S[:, :3]
    S_lin = kin.S[:, 3:]
    contrib = S_lin[None, :, :] + jnp.cross(
        jnp.broadcast_to(S_ang[None, :, :], (x.shape[0],) + S_ang.shape),
        x[:, None, :],
    )  # (k, nv, 3)
    return (contrib * P[:, :, None]).transpose(0, 2, 1)


def _tangent_basis(n: jax.Array):
    """Branchless orthonormal tangents for unit normals n (k, 3)."""
    ref = jnp.where(
        (jnp.abs(n[:, 2:3]) < 0.9),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _sphere_vs_geom(center, radius, gtype: int, gpos, gquat, gsize):
    """Analytic closest-point query of a sphere against one geom (world).
    Returns (phi, normal pointing from geom INTO sphere, contact point)."""
    d = maths.quat_rotate_inverse(gquat, center - gpos)  # sphere center, geom frame
    if gtype == GEOM_SPHERE:
        dist = jnp.linalg.norm(d)
        n_l = d / jnp.maximum(dist, 1e-9)
        phi = gsize[0] + radius - dist
        surf = n_l * gsize[0]
    elif gtype == GEOM_CAPSULE:
        z = jnp.clip(d[2], -gsize[1], gsize[1])
        seg = jnp.array([0.0, 0.0, 1.0]) * z
        rel = d - seg
        dist = jnp.linalg.norm(rel)
        n_l = rel / jnp.maximum(dist, 1e-9)
        phi = gsize[0] + radius - dist
        surf = seg + n_l * gsize[0]
    else:  # BOX or CYLINDER: clamp-to-volume with inside handling
        if gtype == GEOM_BOX:
            half = jnp.array([gsize[0], gsize[1], gsize[2]])
            c = jnp.clip(d, -half, half)
            inside = jnp.all(jnp.abs(d) < half)
            # inside: push out through the nearest face
            gaps = half - jnp.abs(d)  # (3,)
            k = jnp.argmin(gaps)
            sign = jnp.sign(d[k])
            c_in = d.at[k].set(sign * half[k])
            n_in = jnp.zeros(3).at[k].set(sign)
            pen_in = gaps[k]
        else:  # CYLINDER: radius gsize[0], half-height gsize[1]
            r_xy = jnp.linalg.norm(d[:2])
            scale = jnp.minimum(1.0, gsize[0] / jnp.maximum(r_xy, 1e-9))
            c = jnp.concatenate([d[:2] * scale, jnp.clip(d[2:3], -gsize[1], gsize[1])])
            inside = (r_xy < gsize[0]) & (jnp.abs(d[2]) < gsize[1])
            gap_r = gsize[0] - r_xy
            gap_z = gsize[1] - jnp.abs(d[2])
            radial_dir = jnp.where(
                r_xy > 1e-6,
                jnp.concatenate([d[:2] / jnp.maximum(r_xy, 1e-9), jnp.zeros(1)]),
                jnp.array([1.0, 0.0, 0.0]),
            )
            use_r = gap_r < gap_z
            c_in = jnp.where(
                use_r,
                jnp.concatenate([radial_dir[:2] * gsize[0], d[2:3]]),
                jnp.concatenate([d[:2], jnp.sign(d[2:3]) * gsize[1]]),
            )
            n_in = jnp.where(use_r, radial_dir, jnp.array([0.0, 0.0, 1.0]) * jnp.sign(d[2]))
            pen_in = jnp.minimum(gap_r, gap_z)
        rel = d - c
        dist = jnp.linalg.norm(rel)
        n_out = rel / jnp.maximum(dist, 1e-9)
        phi_out = radius - dist
        phi = jnp.where(inside, radius + pen_in, phi_out)
        n_l = jnp.where(inside, n_in, n_out)
        surf = jnp.where(inside, c_in, c)
    n_w = maths.quat_rotate(gquat, n_l)
    x_w = gpos + maths.quat_rotate(gquat, surf)
    return phi, n_w, x_w



def _cp_rest(model, sel):
    """Per-candidate-point restitution (None leaf = all zeros)."""
    if model.cpoint_restitution is None:
        return jnp.zeros(len(sel))
    return model.cpoint_restitution[np.asarray(sel)]


def constraint_data(
    model: Model,
    kin: Kin,
    anc: jax.Array,
    plane_friction: jax.Array | float = 1.0,
    terrain=None,
) -> ConstraintData:
    """Assemble all constraint rows (plane contacts + pair contacts +
    bilateral anchors). Static counts; pure; vmap over envs."""
    dof_body = np.asarray(model.dof_body)
    nv = model.nv

    Js, phis, errs, mus, bils, acts, xs, frames = [], [], [], [], [], [], [], []
    rsts = []
    bodies_a, bodies_b = [], []

    # --- 1. candidate points vs ground (plane or heightfield) ----------
    if model.ncp and model.plane_contacts:
        bodies = np.asarray(model.cpoint_body)
        bq = kin.quat[bodies]
        bx = kin.x[bodies]
        x = bx + maths.quat_rotate(bq, model.cpoint_pos)  # (ncp, 3)
        k = len(bodies)
        Jp = _point_jacobian(kin, anc, dof_body, bodies, x)  # world frame rows x,y,z
        if terrain is None:
            phi = model.cpoint_radius - x[:, 2]
            frame = jnp.broadcast_to(jnp.eye(3), (k, 3, 3))
            J = Jp  # frame = world: t1=x, t2=y, n=z
        else:
            # contact points cluster around the robot: one (32, 32)
            # patch slice + dense tent-weight contraction replaces 4
            # pointwise grid gathers per point (see Terrain.sample_patch)
            h, n = terrain.sample_grad_patch(
                jnp.mean(x[:, :2], axis=0), x[:, :2], P=32
            )
            # distance along the surface normal (slope-corrected)
            phi = model.cpoint_radius - (x[:, 2] - h) * n[:, 2]
            t1, t2 = _tangent_basis(n)
            frame = jnp.stack([t1, t2, n], axis=1)
            J = jnp.einsum("kij,kjv->kiv", frame, Jp)
        Js.append(J)
        phis.append(phi)
        errs.append(jnp.zeros((k, 3)))
        mus.append(model.cpoint_friction * plane_friction)
        rsts.append(_cp_rest(model, np.arange(model.ncp)))
        bils.append(jnp.zeros(k))
        acts.append(jnp.ones(k, bool))
        xs.append(x)
        frames.append(frame)
        bodies_a.append(bodies)
        bodies_b.append(np.full(k, -1))

    # --- 2. geom-pair contacts (sphere vs other) -----------------------
    for ga, gb in zip(model.pair_geom_a, model.pair_geom_b):
        ba, bb = model.geom_body[ga], model.geom_body[gb]
        pa = kin.x[ba] + maths.quat_rotate(kin.quat[ba], model.geom_pos[ga])
        radius = model.geom_size[ga][0]
        pb = kin.x[bb] + maths.quat_rotate(kin.quat[bb], model.geom_pos[gb])
        qb = maths.quat_mul(kin.quat[bb], model.geom_quat[gb])
        phi, n, x = _sphere_vs_geom(
            pa, radius, model.geom_type[gb], pb, qb, model.geom_size[gb]
        )
        t1, t2 = _tangent_basis(n[None])
        C = jnp.stack([t1[0], t2[0], n])  # (3, 3)
        Ja = _point_jacobian(kin, anc, dof_body, np.array([ba]), x[None])[0]
        Jb = _point_jacobian(kin, anc, dof_body, np.array([bb]), x[None])[0]
        Js.append((C @ (Ja - Jb))[None])
        phis.append(phi[None])
        errs.append(jnp.zeros((1, 3)))
        mu = 0.5 * (model.geom_friction[ga] + model.geom_friction[gb])
        mus.append(mu[None])
        rsts.append(jnp.zeros(1))
        bils.append(jnp.zeros(1))
        acts.append(jnp.ones(1, bool))
        xs.append(x[None])
        frames.append(C[None])
        bodies_a.append(np.array([ba]))
        bodies_b.append(np.array([bb]))

    # --- 2b. candidate-point-vs-geom pairs (hand-object style) ---------
    if len(model.ppair_point):
        pts = np.asarray(model.ppair_point)
        geoms = np.asarray(model.ppair_geom)
        for gb in np.unique(geoms):
            sel = pts[geoms == gb]
            bodies = np.asarray(model.cpoint_body)[sel]
            bb = model.geom_body[int(gb)]
            centers = kin.x[bodies] + maths.quat_rotate(
                kin.quat[bodies], model.cpoint_pos[sel]
            )  # (k, 3)
            radii = model.cpoint_radius[sel]
            pb = kin.x[bb] + maths.quat_rotate(kin.quat[bb], model.geom_pos[gb])
            qb = maths.quat_mul(kin.quat[bb], model.geom_quat[gb])
            phi, n, x = jax.vmap(
                _sphere_vs_geom, in_axes=(0, 0, None, None, None, None)
            )(centers, radii, model.geom_type[int(gb)], pb, qb, model.geom_size[gb])
            t1, t2 = _tangent_basis(n)
            C = jnp.stack([t1, t2, n], axis=1)  # (k, 3, 3)
            Ja = _point_jacobian(kin, anc, dof_body, bodies, x)
            Jb = _point_jacobian(
                kin, anc, dof_body, np.full(len(sel), bb), x
            )
            k = len(sel)
            Js.append(jnp.einsum("kij,kjv->kiv", C, Ja - Jb))
            phis.append(phi)
            errs.append(jnp.zeros((k, 3)))
            mus.append(
                0.5 * (model.cpoint_friction[sel] + model.geom_friction[gb])
            )
            rsts.append(_cp_rest(model, sel))
            bils.append(jnp.zeros(k))
            acts.append(jnp.ones(k, bool))
            xs.append(x)
            frames.append(C)
            bodies_a.append(bodies)
            bodies_b.append(np.full(k, bb))

    # --- 2c. candidate-point-vs-SDF-grid pairs (Factory/IndustReal) ----
    # Mesh-vertex-vs-SDF narrowphase, the same contact model as PhysX's
    # SDF collision mode (reference docs/factory.md:101-131): candidate
    # points sampled on body A's mesh query the voxelized signed-distance
    # grid rigidly attached to body B -- a trilinear gather, no BVH.
    if len(model.spair_point):
        from ..sdf.builder import SdfGrid, sdf_gradient, sdf_query

        pts = np.asarray(model.spair_point)
        grids = np.asarray(model.spair_sdf)
        for g in np.unique(grids):
            sel = pts[grids == g]
            bodies = np.asarray(model.cpoint_body)[sel]
            bb = model.sdf_body[int(g)]
            grid = SdfGrid(
                values=model.sdf_values[int(g)],
                origin=model.sdf_origin[int(g)],
                spacing=model.sdf_spacing[int(g)],
            )
            x = kin.x[bodies] + maths.quat_rotate(
                kin.quat[bodies], model.cpoint_pos[sel]
            )  # (k, 3) world
            radii = model.cpoint_radius[sel]
            # world -> grid-body frame
            d = maths.quat_rotate_inverse(kin.quat[bb], x - kin.x[bb])
            dist = sdf_query(grid, d)
            grad = sdf_gradient(grid, d)
            n_l = grad / jnp.maximum(
                jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9
            )
            n = maths.quat_rotate(kin.quat[bb], n_l)  # world, out of B
            phi = radii - dist
            t1, t2 = _tangent_basis(n)
            C = jnp.stack([t1, t2, n], axis=1)  # (k, 3, 3)
            Ja = _point_jacobian(kin, anc, dof_body, bodies, x)
            Jb = _point_jacobian(
                kin, anc, dof_body, np.full(len(sel), bb), x
            )
            k = len(sel)
            Js.append(jnp.einsum("kij,kjv->kiv", C, Ja - Jb))
            phis.append(phi)
            errs.append(jnp.zeros((k, 3)))
            mus.append(model.cpoint_friction[sel])
            rsts.append(_cp_rest(model, sel))
            bils.append(jnp.zeros(k))
            acts.append(jnp.ones(k, bool))
            xs.append(x)
            frames.append(C)
            bodies_a.append(bodies)
            bodies_b.append(np.full(k, bb))

    # --- 3. bilateral point anchors (attractors) -----------------------
    if len(model.att_body):
        bodies = np.asarray(model.att_body)
        k = len(bodies)
        x = kin.x[bodies] + maths.quat_rotate(kin.quat[bodies], model.att_offset)
        err_w = model.att_target - x  # world error (drive to zero)
        Jp = _point_jacobian(kin, anc, dof_body, bodies, x)
        Js.append(Jp)
        phis.append(jnp.zeros(k))
        errs.append(err_w)  # frame = world
        mus.append(jnp.zeros(k))
        rsts.append(jnp.zeros(k))
        bils.append(jnp.ones(k))
        acts.append(jnp.ones(k, bool))
        xs.append(x)
        frames.append(jnp.broadcast_to(jnp.eye(3), (k, 3, 3)))
        bodies_a.append(bodies)
        bodies_b.append(np.full(k, -1))

    if not Js:  # constraint-free model (e.g. a free body in vacuum)
        return ConstraintData(
            J=jnp.zeros((0, 3, nv)),
            phi=jnp.zeros(0),
            err=jnp.zeros((0, 3)),
            mu=jnp.zeros(0),
            bilateral=jnp.zeros(0),
            active=jnp.zeros(0, bool),
            x=jnp.zeros((0, 3)),
            frame=jnp.zeros((0, 3, 3)),
            rest=jnp.zeros(0),
            body_a=np.zeros(0, np.int64),
            body_b=np.zeros(0, np.int64),
        )
    return ConstraintData(
        J=jnp.concatenate(Js),
        phi=jnp.concatenate(phis),
        err=jnp.concatenate(errs),
        mu=jnp.concatenate(mus),
        bilateral=jnp.concatenate(bils),
        active=jnp.concatenate(acts),
        x=jnp.concatenate(xs),
        frame=jnp.concatenate(frames),
        rest=jnp.concatenate(rsts),
        body_a=np.concatenate(bodies_a),
        body_b=np.concatenate(bodies_b),
    )


# backwards-compatible alias (plane-only call sites)
contact_data = constraint_data


class SolveOut(NamedTuple):
    qd: jax.Array  # (nv,) corrected velocity
    impulse: jax.Array  # (nc, 3) impulses in constraint frames
    x: jax.Array  # (nc, 3) application points
    qfrc: jax.Array  # (nv,) generalized constraint impulse J^T lam


def _project(lam: jax.Array, mu: jax.Array, active, bilateral) -> jax.Array:
    """Friction-cone projection for unilateral rows; identity for
    bilateral rows; zero for inactive rows."""
    ln = jnp.maximum(lam[:, 2], 0.0)
    lt = lam[:, :2]
    lt_norm = jnp.sqrt(jnp.sum(lt * lt, axis=-1) + 1e-12)
    scale = jnp.minimum(1.0, mu * ln / lt_norm)
    proj = jnp.concatenate([lt * scale[:, None], ln[:, None]], axis=-1)
    out = jnp.where(bilateral[:, None] > 0, lam, proj)
    return jnp.where(active[:, None], out, 0.0)


def solve_contacts(
    model: Model,
    con: ConstraintData,
    minv_mul,  # callable: (nv, k) -> M^{-1} @ rhs
    qd_free: jax.Array,
    h,
    params: SimParams,
    warm: jax.Array | None = None,
) -> SolveOut:
    """Impulse solve over the assembled constraint rows: velocity-level QP
    min 1/2 lam^T A lam + lam^T b over the product of friction cones
    (x R^3 for bilateral rows), A = J M^{-1} J^T. See module docstring.

    If params.max_active_contacts in (0, ncon): only the top-K most-
    penetrating rows (bilateral rows always included) enter the Delassus
    system -- the TPU-shaped analogue of narrowphase culling. Static
    shapes, branch-free gather/scatter. `warm` (ncon, 3) warm-starts the
    iterative solver with the previous substep's impulses.
    """
    nc_full = con.J.shape[0]
    nv = con.J.shape[2]
    if nc_full == 0:  # constraint-free model
        return SolveOut(
            qd=qd_free,
            impulse=jnp.zeros((0, 3)),
            x=con.x,
            qfrc=jnp.zeros(nv),
        )
    cap = params.max_active_contacts
    active_full = con.active & (
        (con.phi > -params.contact_margin) | (con.bilateral > 0)
    )

    if cap and cap < nc_full:
        # selection key: bilateral rows always win, then PREDICTED depth at
        # the end of the slice (phi - min(v_n,0)*h). Depth-only selection
        # starves fast-approaching speculative rows of slots (steady
        # grasp-squeeze rows crowd them out) and lets thin features tunnel;
        # prediction is PhysX's speculative-contact selection rule.
        vn = jnp.einsum("cv,v->c", con.J[:, 2, :], qd_free)
        key = con.phi - jnp.minimum(vn, 0.0) * h
        key = jnp.where(con.bilateral > 0, jnp.inf, key)
        key = jnp.where(active_full, key, -jnp.inf)
        _, sel = jax.lax.top_k(key, cap)
        J = con.J[sel]
        phi = con.phi[sel]
        err = con.err[sel]
        mu = con.mu[sel]
        bilateral = con.bilateral[sel]
        active = active_full[sel]
        frame = con.frame[sel]
        rest = con.rest[sel]
        warm_sel = warm[sel] if warm is not None else None
    else:
        sel = None
        J, phi, err, mu = con.J, con.phi, con.err, con.mu
        bilateral, active, frame = con.bilateral, active_full, con.frame
        rest = con.rest
        warm_sel = warm

    nc = J.shape[0]
    Jf = J.reshape(nc * 3, nv)
    MinvJT = minv_mul(Jf.T)  # (nv, 3*nc)
    A = Jf @ MinvJT + 1e-6 * jnp.eye(nc * 3)
    b = (Jf @ qd_free).reshape(nc, 3)

    # Baumgarte: push out at erp*phi/h, capped (max_depenetration_velocity).
    # Separated-but-in-margin rows must ALLOW approach at up to gap/h --
    # otherwise the unilateral constraint acts as a wall at the margin-
    # activation distance and ratchets grasps open (v_n >= phi/h, phi < 0).
    vn_target = jnp.where(
        phi > 0,
        jnp.minimum(
            params.baumgarte_erp * phi / h, params.max_depenetration_velocity
        ),
        phi / h,
    )
    # Newton restitution: when a touching row impacts faster than the
    # bounce threshold, the post-solve normal velocity targets -e*v_n^-
    # (PhysX restitution + bounce_threshold_velocity semantics); combined
    # with Baumgarte by taking the larger outward target
    vn_pre = b[:, 2]
    bounce = (
        (rest > 0.0)
        & (phi > -params.contact_margin)
        & (vn_pre < -params.bounce_threshold_velocity)
    )
    vn_target = jnp.where(
        bounce, jnp.maximum(vn_target, -rest * vn_pre), vn_target
    )
    b = b.at[:, 2].add(-vn_target)
    # bilateral anchors: drive the full 3D error to zero
    v_err = jnp.einsum("cij,cj->ci", frame, err) * (
        params.baumgarte_erp_attractor / h
    )
    b = b - v_err * bilateral[:, None]

    if params.solver == "apgd":
        lam = _solve_apgd(A, b, mu, active, bilateral, params, warm_sel)
    else:
        lam = _solve_pgs(A, b, mu, active, bilateral, params)

    lam_flat = lam.reshape(nc * 3)
    qd = qd_free + MinvJT @ lam_flat
    qfrc = Jf.T @ lam_flat
    if sel is not None:
        impulse = jnp.zeros((nc_full, 3)).at[sel].set(lam)
    else:
        impulse = lam
    return SolveOut(qd=qd, impulse=impulse, x=con.x, qfrc=qfrc)


def _group_mats(nc: int):
    """Static selection/expansion matrices between flat constraint rows
    (nc*3, contact-major t1,t2,n) and per-contact scalars (nc,).

    The projection is phrased as tiny matmuls with these so the APGD
    iteration NEVER reshapes (n,) <-> (nc, 3): on TPU that reshape is a
    full relayout (3-lane minor dim pads to 128) and measured ~0.15 ms per
    iteration at 4096 envs; the matmuls are MXU-trivial."""
    n = nc * 3
    Gn = np.zeros((nc, n), np.float32)
    Gn[np.arange(nc), 2 + 3 * np.arange(nc)] = 1.0  # select normal rows
    Gt = np.zeros((nc, n), np.float32)  # sum over the 2 tangent rows
    Gt[np.arange(nc), 3 * np.arange(nc)] = 1.0
    Gt[np.arange(nc), 1 + 3 * np.arange(nc)] = 1.0
    tmask = Gt.sum(0)  # (n,) 1 on tangent rows
    nmask = Gn.sum(0)  # (n,) 1 on normal rows
    return jnp.asarray(Gn), jnp.asarray(Gt), jnp.asarray(tmask), jnp.asarray(nmask)


def _project_flat(y, mu, active_f, bilateral, Gn, Gt, tmask, nmask):
    """Friction-cone projection on flat (nc*3,) vectors (see _group_mats)."""
    lnc = Gn @ y  # (nc,) normal components
    ln = jnp.where(bilateral > 0, lnc, jnp.maximum(lnc, 0.0))
    lt_norm = jnp.sqrt(Gt @ (y * y * tmask) + 1e-12)
    scale = jnp.where(
        bilateral > 0, 1.0, jnp.minimum(1.0, mu * ln / lt_norm)
    )
    out = y * (Gt.T @ scale) * tmask + Gn.T @ ln
    return out * active_f


def _solve_apgd(
    A, b, mu, active, bilateral, params: SimParams, warm=None
) -> jax.Array:
    nc = b.shape[0]
    n = nc * 3
    bf = b.reshape(n)
    Gn, Gt, tmask, nmask = _group_mats(nc)
    Gc = Gn + Gt  # (nc, n) full per-contact membership
    active_f = Gc.T @ active.astype(jnp.float32)  # (n,)
    # Per-contact Jacobi preconditioning: under extreme mass ratios (e.g.
    # a 5e-6 kg m^2 nut against a robot arm) the raw Delassus operator's
    # Lipschitz constant is set by the lightest body, freezing progress on
    # contacts with heavy effective mass. Scaling each contact's 3 rows by
    # 1/sqrt(mean block diagonal) equalizes them, and the friction cone is
    # invariant under a uniform per-contact scale, so the projection is
    # unchanged in the scaled variables.
    diag = jnp.diagonal(A)
    d_c = (Gc @ diag) / 3.0  # (nc,)
    s_c = 1.0 / jnp.sqrt(jnp.maximum(d_c, 1e-12))
    s = Gc.T @ s_c  # (n,) row scales
    A = A * s[:, None] * s[None, :]
    bf = bf * s
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

    def proj(y):
        return _project_flat(y, mu, active_f, bilateral, Gn, Gt, tmask, nmask)

    def it(carry, beta):
        lam, y = carry
        g = A @ y + bf
        lam_new = proj(y - step * g)
        y = lam_new + beta * (lam_new - lam)
        return (lam_new, y), None

    if warm is None:
        lam0 = jnp.zeros(n)
    else:
        lam0 = proj(warm.reshape(n) / s)  # into scaled variables
    (lam, _), _ = jax.lax.scan(it, (lam0, lam0), betas)
    return (lam * s).reshape(nc, 3)


def _solve_pgs(A, b, mu, active, bilateral, params: SimParams) -> jax.Array:
    """Block Gauss-Seidel sweep as a fori_loop (small trace, sequential)."""
    nc = b.shape[0]
    A4 = A.reshape(nc, 3, nc, 3)
    diag_nn = jnp.stack([A4[c, 2, c, 2] for c in range(nc)])
    inv_dnn = 1.0 / diag_nn
    Dt = jnp.stack([A4[c, :2, c, :2] for c in range(nc)])  # (nc, 2, 2)
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
        ln_raw = lam[c, 2] - r[2] * inv_dnn[c]
        ln = jnp.where(bilateral[c] > 0, ln_raw, jnp.maximum(ln_raw, 0.0))
        dn = ln - lam[c, 2]
        r_t = r[:2] + A4[c, :2, c, 2] * dn
        lt = lam[c, :2] - Dt_inv[c] @ r_t
        lt_norm = jnp.sqrt(jnp.sum(lt * lt) + 1e-12)
        cap = jnp.where(bilateral[c] > 0, 1e30, mu[c] * ln)
        lt = lt * jnp.minimum(1.0, cap / lt_norm)
        new_c = jnp.where(active[c], jnp.array([lt[0], lt[1], ln]), jnp.zeros(3))
        return lam.at[c].set(new_c)

    def sweep(lam, _):
        return jax.lax.fori_loop(0, nc, contact_update, lam), None

    lam, _ = jax.lax.scan(
        sweep, jnp.zeros((nc, 3)), None, length=params.solver_pgs_iterations
    )
    return lam


def accumulate_body_wrench(model: Model, con: ConstraintData, out: SolveOut, kin: Kin, h):
    F = jnp.einsum("cji,cj->ci", con.frame, out.impulse / h)  # world forces
    nb = model.nbody
    body_force = jnp.zeros((nb, 3))
    body_torque = jnp.zeros((nb, 3))
    ba = con.body_a
    torque_a = jnp.cross(out.x - kin.x[ba], F)
    body_force = body_force.at[ba].add(F)
    body_torque = body_torque.at[ba].add(torque_a)
    bb = con.body_b
    valid_b = bb >= 0
    if valid_b.any():
        idx = np.where(valid_b)[0]
        bbv = bb[idx]
        body_force = body_force.at[bbv].add(-F[idx])
        body_torque = body_torque.at[bbv].add(
            -jnp.cross(out.x[idx] - kin.x[bbv], F[idx])
        )
    return body_force, body_torque
