"""Fused whole-physics-step TPU kernel (Pallas).

The vmap-of-small-ops engine (`physics_step` in step.py) emits hundreds of
tiny XLA fusions per substep; each carries fixed launch overhead and pads
its small minor dims to (8, 128) tiles, and the APGD iteration re-reads the
dense Delassus matrix from HBM every iteration (measured 73 ms of a 227 ms
10-step Ant trace).  This module re-expresses ONE WHOLE physics step
(all substeps) as a single Pallas kernel over tiles of envs:

  layout      every per-env scalar row is laid out (feature_rows, TILE)
              with envs on the 128-wide lane axis -- no padded minor dims;
  residency   the mass matrix, its inverse, the contact Jacobian and the
              Delassus operator live in VMEM across ALL solver iterations;
  unrolling   bodies/dofs/contacts are unrolled at trace time from the
              static Model topology (same trick as the vmap engine), so
              the kernel is specialized per model and branch-free.

Algorithm matches engine/step.py + engine/contacts.py semantics (world-
origin Featherstone CRBA -> implicit drives -> plane contacts -> APGD cone
QP with warm start -> semi-implicit Euler), with one documented divergence:
the SPD solve uses a vectorized Gauss-Jordan inverse instead of unrolled
Cholesky (same result up to fp rounding, far fewer ops in lane layout).

Reference mapping: this is the TPU replacement for the PhysX GPU solver the
reference drives via gym.simulate (isaacgymenvs/tasks/base/vec_task.py:382,
cfg/task/Ant.yaml:43-53) -- the "hot inner loops as Pallas kernels" item of
SURVEY.md section 7.

Supported feature set (see `fused_supported`): plane contacts from
candidate points, point-vs-geom pair contacts (sphere/box), top-K
active-set selection (max_active_contacts, matching the vmap engine's
predicted-depth lax.top_k rule), scalar/free/fixed joints, tendons,
implicit PD drives, external body wrenches, joint limits, bilateral
anchors, Newton restitution, per-env model leaves (DR) including the
actor-scale/inertia geometry leaves (body_ipos, body_inertia,
cpoint_pos, geom_size), heightfield terrain via entry-sampled per-point
planes (terrain_dyn), and SDF pair contacts via entry-sampled contact
planes (sdf_dyn).  Geom-geom pairs fall back to the vmap engine.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import maths as _maths
from ..model.spec import FIXED, FREE, HINGE, SLIDE, Model
from . import dynamics as _dyn
from .dynamics import SimParams

TILE = 128  # envs per kernel instance (lane width; Mosaic lane minimum)

# VMEM budget for the per-tile solver residents (Delassus rows3^2 +
# contact jacobian 3*nv*rows3 + Minv/M 3*nv^2, f32, 128 lanes), a
# heuristic screen only -- Mosaic itself schedules against the physical
# core VMEM (vmem_limit below raised to 100M; ShadowHand's top-K chain
# peaks ~23 MiB and compiles). 20 MiB admits the IndustReal family
# (152 candidate rows under a cap of 32 -> 17.1 MiB residents) while
# still rejecting plainly uncompilable uncapped hand-object models.
_VMEM_BUDGET_BYTES = 20 * 2**20


class FusedOut(NamedTuple):
    """Batched step outputs, env-leading (N, ...) like the vmap path."""

    q: jax.Array  # (N, nq)
    qd: jax.Array  # (N, nv)
    body_force: jax.Array  # (N, nbody, 3)
    body_torque: jax.Array  # (N, nbody, 3)
    dof_force: jax.Array  # (N, nv)


def fused_supported(model: Model, params: SimParams, terrain) -> bool:
    """True when the fused kernel covers this model's feature set."""
    npp = len(model.ppair_point)
    n_plane = model.ncp if model.plane_contacts else 0
    natt = len(model.att_body)
    pp_types_ok = all(
        # SPHERE, BOX, CYLINDER; MESH rides the same cylinder
        # fall-through as contacts._sphere_vs_geom's else branch
        # (bounding half-extents -- FrankaCabinet's drawer handle)
        model.geom_type[g] in (0, 2, 3, 5)
        for g in model.ppair_geom
    )
    cap = params.max_active_contacts
    nsp = len(model.spair_point)
    nct = n_plane + npp + nsp + natt
    nv = model.nv
    if cap and cap < nct:
        # top-K path: the Delassus system shrinks to 3*cap rows; the full
        # contact jacobian plus the rank/one-hot selection masks stay
        # resident alongside it. Bilateral rows always win a slot, so the
        # cap must leave room for unilateral candidates too.
        if cap <= natt:
            return False
        rows3 = 3 * cap
        sel_rows = nv * 3 * nct + cap * nct + 32 * nct + 6 * nct
    else:
        rows3 = 3 * nct
        sel_rows = 0
    resident_bytes = (
        (rows3 * rows3 + 3 * nv * rows3 + 3 * nv * nv + sel_rows) * TILE * 4
    )
    # heightfield terrain: supported through per-control-step plane data
    # (_terr_* dyn inputs sampled at the step's entry positions -- see
    # the plane-row branch in _substep_fn); needs ground candidates
    terrain_ok = terrain is None or bool(model.ncp and model.plane_contacts)
    # SDF pairs ride entry-sampled world planes (sdf_dyn) like terrain
    return (
        terrain_ok
        and resident_bytes <= _VMEM_BUDGET_BYTES
        and params.solver == "apgd"
        and not model.pair_geom_a
        and pp_types_ok
    )


# ---------------------------------------------------------------------------
# component-first helpers: vectors are python lists of (rows, T) arrays
# ---------------------------------------------------------------------------


def _cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _qmul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return [
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ]


def _qrot(q, v):
    """Rotate vector v (3 comps) by quaternion q (4 comps, xyzw)."""
    xyz, w = q[:3], q[3]
    t = [2.0 * c for c in _cross(xyz, v)]
    u = _cross(xyz, t)
    return [v[k] + w * t[k] + u[k] for k in range(3)]


def _qnormalize(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    inv = 1.0 / jnp.maximum(n, 1e-9)
    return [c * inv for c in q]


def _qexp(phi):
    """Rotation vector -> quaternion, Taylor-safe at 0 (maths.quat_exp)."""
    a2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2]
    angle = jnp.sqrt(jnp.maximum(a2, 1e-24))
    half = 0.5 * angle
    small = a2 < 1e-12
    s = jnp.where(small, 0.5 - a2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - a2 / 8.0, jnp.cos(half))
    return [phi[0] * s, phi[1] * s, phi[2] * s, w]


# ---------------------------------------------------------------------------
# static model extraction (host, numpy)
# ---------------------------------------------------------------------------


class _Spec(NamedTuple):
    nbody: int
    nq: int
    nv: int
    nc: int
    parent: np.ndarray
    jnt_type: np.ndarray
    q_adr: np.ndarray
    v_adr: np.ndarray
    dof_body: np.ndarray
    body_pos: np.ndarray  # (nbody, 3)
    body_quat: np.ndarray
    body_ipos: np.ndarray
    body_inertia: np.ndarray  # (nbody, 3, 3)
    body_mass: np.ndarray
    jnt_axis: np.ndarray
    jnt_pos: np.ndarray
    armature: np.ndarray
    dof_damping: np.ndarray
    dof_friction: np.ndarray
    dof_stiffness: np.ndarray
    dof_limit_lower: np.ndarray
    dof_limit_upper: np.ndarray
    dof_limited: np.ndarray
    qpos0: np.ndarray
    sq_adr: np.ndarray  # per-dof q index (-1 = free dof)
    dof_mask: np.ndarray  # (nv, nv) lower ancestor mask
    anc: np.ndarray  # (nbody, nbody) ancestor-or-self
    int_mat: np.ndarray  # (nq, nv)
    # plane contacts
    cp_body: np.ndarray
    cp_pos: np.ndarray
    cp_radius: np.ndarray
    cp_mu: np.ndarray
    path_mask: np.ndarray  # (nc, nv) contact-path dof mask
    body_of_contact: np.ndarray  # (nbody, nc) 0/1 accumulation matrix
    # point-vs-geom pair contacts (hand-object style, ppair_*): static
    # per-row data; BOX/SPHERE geoms only (fused_supported gates)
    pp_nc: int
    pp_pos: np.ndarray  # (npp, 3) point in body-A frame
    pp_radius: np.ndarray  # (npp,)
    pp_mu: np.ndarray  # (npp,)
    pp_gtype: np.ndarray  # (npp,) geom type per row
    pp_gpos: np.ndarray  # (npp, 3) geom offset in body-B frame
    pp_gquat: np.ndarray  # (npp, 4)
    pp_gsize: np.ndarray  # (npp, 3)
    pp_pick_pt: np.ndarray  # (npp, ncp_model) one-hot candidate point
    pp_geom_fric: np.ndarray  # (npp,) geom-side friction (const under DR)
    pp_pick_a: np.ndarray  # (npp, nbody) one-hot point body
    pp_pick_b: np.ndarray  # (npp, nbody) one-hot geom body
    pp_pick_geom: np.ndarray  # (npp, ngeom) one-hot geom (dyn geom_size)
    pp_path: np.ndarray  # (nv, npp) SIGNED dof path mask (A - B)
    pp_boc_a: np.ndarray  # (nbody, npp) +force accumulation
    pp_boc_b: np.ndarray  # (nbody, npp)
    # candidate-point-vs-SDF pairs (Factory/IndustReal, contacts.py 2c):
    # the SDF field itself is entry-sampled outside the kernel (sdf_dyn)
    # into per-row world planes; rows sit between pp and att rows
    sp_n: int
    sp_pos: np.ndarray  # (nsp, 3) point in body-A frame
    sp_mu: np.ndarray  # (nsp,)
    sp_pick_pt: np.ndarray  # (nsp, ncp_model) one-hot candidate point
    sp_pick_a: np.ndarray  # (nsp, nbody) one-hot point body
    sp_path: np.ndarray  # (nv, nsp) SIGNED dof path mask (A - B)
    sp_boc_a: np.ndarray  # (nbody, nsp) +force accumulation
    sp_boc_b: np.ndarray  # (nbody, nsp)
    rest: np.ndarray  # (nc + npp + nsp,) per-row Newton restitution
    # bilateral point anchors (attractors, contacts.py source 3)
    att_n: int
    att_pick: np.ndarray  # (natt, nbody) one-hot anchor body
    att_offset: np.ndarray  # (natt, 3) anchor point in body frame
    att_target: np.ndarray  # (natt, 3) world target
    att_path: np.ndarray  # (nv, natt) dof path mask
    att_boc: np.ndarray  # (nbody, natt) force accumulation
    # tendons
    tendon_coef: np.ndarray | None
    tendon_range: np.ndarray | None
    tendon_stiffness: np.ndarray | None
    tendon_damping: np.ndarray | None
    free_bodies: tuple


def _extract(model: Model) -> _Spec:
    g = lambda x: np.asarray(jax.device_get(x), np.float32)
    anc = _dyn.ancestor_matrix(model)
    dof_mask = _dyn.dof_ancestor_mask(model)
    meta = _dyn.kin_meta(model)
    sq = _dyn.scalar_dof_q_adr(model)
    nc = model.ncp if (model.ncp and model.plane_contacts) else 0
    if nc:
        cp_body = np.asarray(model.cpoint_body)
        path_mask = anc[cp_body][:, np.asarray(model.dof_body)].astype(np.float32)
        boc = np.zeros((model.nbody, nc), np.float32)
        boc[cp_body, np.arange(nc)] = 1.0
        cp_pos, cp_radius, cp_mu = (
            g(model.cpoint_pos),
            g(model.cpoint_radius),
            g(model.cpoint_friction),
        )
    else:
        cp_body = np.zeros(0, np.int64)
        path_mask = np.zeros((0, model.nv), np.float32)
        boc = np.zeros((model.nbody, 0), np.float32)
        cp_pos = np.zeros((0, 3), np.float32)
        cp_radius = np.zeros(0, np.float32)
        cp_mu = np.zeros(0, np.float32)
    npp = len(model.ppair_point)
    if npp:
        pts = np.asarray(model.ppair_point)
        geoms = np.asarray(model.ppair_geom)
        # match contacts.constraint_data's row order (grouped by unique
        # geom, stable within a group): under top-K selection, exact-tie
        # rows (e.g. 4 cube corners at identical phi) break by row index,
        # so the fused and vmap engines must index rows identically
        order = np.argsort(geoms, kind="stable")
        pts, geoms = pts[order], geoms[order]
        pa = np.asarray(model.cpoint_body)[pts]
        pb = np.asarray(model.geom_body)[geoms]
        pp_pos = g(model.cpoint_pos)[pts]
        pp_radius = g(model.cpoint_radius)[pts]
        pp_mu = 0.5 * (
            g(model.cpoint_friction)[pts] + g(model.geom_friction)[geoms]
        )
        # MESH (5) -> CYLINDER (3): the vmap narrowphase's else-branch
        # fall-through, matched exactly (fused_supported gates types)
        pp_gtype = np.asarray(model.geom_type)[geoms]
        pp_gtype = np.where(pp_gtype == 5, 3, pp_gtype)
        pp_gpos = g(model.geom_pos)[geoms]
        pp_gquat = g(model.geom_quat)[geoms]
        pp_gsize = g(model.geom_size)[geoms]
        pick_a = np.zeros((npp, model.nbody), np.float32)
        pick_a[np.arange(npp), pa] = 1.0
        pick_b = np.zeros((npp, model.nbody), np.float32)
        pick_b[np.arange(npp), pb] = 1.0
        pick_pt = np.zeros((npp, model.ncp), np.float32)
        pick_pt[np.arange(npp), pts] = 1.0
        pick_geom = np.zeros((npp, len(model.geom_type)), np.float32)
        pick_geom[np.arange(npp), geoms] = 1.0
        pp_geom_fric = g(model.geom_friction)[geoms]
        dof_body_arr = np.asarray(model.dof_body)
        pp_path = (
            anc[pa][:, dof_body_arr].astype(np.float32)
            - anc[pb][:, dof_body_arr].astype(np.float32)
        ).T  # (nv, npp) signed
        boc_a = np.zeros((model.nbody, npp), np.float32)
        boc_a[pa, np.arange(npp)] = 1.0
        boc_b = np.zeros((model.nbody, npp), np.float32)
        boc_b[pb, np.arange(npp)] = 1.0
    else:
        pp_pos = np.zeros((0, 3), np.float32)
        pp_radius = np.zeros(0, np.float32)
        pp_mu = np.zeros(0, np.float32)
        pp_gtype = np.zeros(0, np.int64)
        pp_gpos = np.zeros((0, 3), np.float32)
        pp_gquat = np.zeros((0, 4), np.float32)
        pp_gsize = np.zeros((0, 3), np.float32)
        pick_a = np.zeros((0, model.nbody), np.float32)
        pick_b = np.zeros((0, model.nbody), np.float32)
        pick_pt = np.zeros((0, model.ncp), np.float32)
        pick_geom = np.zeros((0, len(model.geom_type)), np.float32)
        pp_geom_fric = np.zeros(0, np.float32)
        pp_path = np.zeros((model.nv, 0), np.float32)
        boc_a = np.zeros((model.nbody, 0), np.float32)
        boc_b = np.zeros((model.nbody, 0), np.float32)
    nsp = len(model.spair_point)
    if nsp:
        # match contacts.constraint_data source 2c row order exactly:
        # grouped by unique SDF grid (sorted), stable within a group
        pts_sp = np.asarray(model.spair_point)
        order_sp = np.argsort(np.asarray(model.spair_sdf), kind="stable")
        pts_o = pts_sp[order_sp]
        sp_a = np.asarray(model.cpoint_body)[pts_o]
        sp_b = np.asarray(model.sdf_body)[
            np.asarray(model.spair_sdf)[order_sp]
        ]
        sp_pos = g(model.cpoint_pos)[pts_o]
        sp_mu = g(model.cpoint_friction)[pts_o]
        sp_pick_pt = np.zeros((nsp, model.ncp), np.float32)
        sp_pick_pt[np.arange(nsp), pts_o] = 1.0
        sp_pick_a = np.zeros((nsp, model.nbody), np.float32)
        sp_pick_a[np.arange(nsp), sp_a] = 1.0
        dof_body_arr = np.asarray(model.dof_body)
        sp_path = (
            anc[sp_a][:, dof_body_arr].astype(np.float32)
            - anc[sp_b][:, dof_body_arr].astype(np.float32)
        ).T  # (nv, nsp) signed
        sp_boc_a = np.zeros((model.nbody, nsp), np.float32)
        sp_boc_a[sp_a, np.arange(nsp)] = 1.0
        sp_boc_b = np.zeros((model.nbody, nsp), np.float32)
        sp_boc_b[sp_b, np.arange(nsp)] = 1.0
    else:
        pts_o = np.zeros(0, np.int64)
        sp_pos = np.zeros((0, 3), np.float32)
        sp_mu = np.zeros(0, np.float32)
        sp_pick_pt = np.zeros((0, model.ncp), np.float32)
        sp_pick_a = np.zeros((0, model.nbody), np.float32)
        sp_path = np.zeros((model.nv, 0), np.float32)
        sp_boc_a = np.zeros((model.nbody, 0), np.float32)
        sp_boc_b = np.zeros((model.nbody, 0), np.float32)
    rst = (
        np.asarray(jax.device_get(model.cpoint_restitution), np.float32)
        if model.cpoint_restitution is not None
        else np.zeros(model.ncp, np.float32)
    )
    rest_rows = np.concatenate(
        [
            rst[: model.ncp] if nc else np.zeros(0, np.float32),
            rst[np.asarray(model.ppair_point)[
                np.argsort(np.asarray(model.ppair_geom), kind="stable")
            ]] if npp else np.zeros(0, np.float32),
            rst[pts_o] if nsp else np.zeros(0, np.float32),
        ]
    )
    natt = len(model.att_body)
    if natt:
        ab = np.asarray(model.att_body)
        att_pick = np.zeros((natt, model.nbody), np.float32)
        att_pick[np.arange(natt), ab] = 1.0
        att_path = anc[ab][:, np.asarray(model.dof_body)].astype(np.float32).T
        att_boc = np.zeros((model.nbody, natt), np.float32)
        att_boc[ab, np.arange(natt)] = 1.0
        att_offset = g(model.att_offset)
        att_target = g(model.att_target)
    else:
        att_pick = np.zeros((0, model.nbody), np.float32)
        att_path = np.zeros((model.nv, 0), np.float32)
        att_boc = np.zeros((model.nbody, 0), np.float32)
        att_offset = np.zeros((0, 3), np.float32)
        att_target = np.zeros((0, 3), np.float32)
    has_t = model.tendon_coef is not None and model.tendon_coef.shape[0]
    return _Spec(
        nbody=model.nbody,
        nq=model.nq,
        nv=model.nv,
        nc=nc,
        parent=np.asarray(model.body_parent),
        jnt_type=np.asarray(model.jnt_type),
        q_adr=np.asarray(model.q_adr),
        v_adr=np.asarray(model.v_adr),
        dof_body=np.asarray(model.dof_body),
        body_pos=g(model.body_pos),
        body_quat=g(model.body_quat),
        body_ipos=g(model.body_ipos),
        body_inertia=g(model.body_inertia),
        body_mass=g(model.body_mass),
        jnt_axis=g(model.jnt_axis),
        jnt_pos=g(model.jnt_pos),
        armature=g(model.armature),
        dof_damping=g(model.dof_damping),
        dof_friction=(
            g(model.dof_friction)
            if model.dof_friction is not None
            else np.zeros(model.nv, np.float32)
        ),
        dof_stiffness=g(model.dof_stiffness),
        dof_limit_lower=g(model.dof_limit_lower),
        dof_limit_upper=g(model.dof_limit_upper),
        dof_limited=g(model.dof_limited),
        qpos0=g(model.qpos0),
        sq_adr=sq,
        dof_mask=dof_mask,
        anc=anc,
        int_mat=meta.int_mat,
        cp_body=cp_body,
        cp_pos=cp_pos,
        cp_radius=cp_radius,
        cp_mu=cp_mu,
        path_mask=path_mask,
        body_of_contact=boc,
        pp_nc=npp,
        pp_pos=pp_pos,
        pp_radius=pp_radius,
        pp_mu=pp_mu,
        pp_gtype=pp_gtype,
        pp_gpos=pp_gpos,
        pp_gquat=pp_gquat,
        pp_gsize=pp_gsize,
        pp_pick_pt=pick_pt,
        pp_pick_geom=pick_geom,
        sp_n=nsp,
        sp_pos=sp_pos,
        sp_mu=sp_mu,
        sp_pick_pt=sp_pick_pt,
        sp_pick_a=sp_pick_a,
        sp_path=sp_path,
        sp_boc_a=sp_boc_a,
        sp_boc_b=sp_boc_b,
        pp_geom_fric=pp_geom_fric,
        pp_pick_a=pick_a,
        pp_pick_b=pick_b,
        pp_path=pp_path,
        pp_boc_a=boc_a,
        pp_boc_b=boc_b,
        rest=rest_rows,
        att_n=natt,
        att_pick=att_pick,
        att_offset=att_offset,
        att_target=att_target,
        att_path=att_path,
        att_boc=att_boc,
        tendon_coef=g(model.tendon_coef) if has_t else None,
        tendon_range=g(model.tendon_range) if has_t else None,
        tendon_stiffness=g(model.tendon_stiffness) if has_t else None,
        tendon_damping=g(model.tendon_damping) if has_t else None,
        free_bodies=meta.free_bodies,
    )


# ---------------------------------------------------------------------------
# the substep math (pure jnp on (rows, T) arrays; Mosaic-compatible ops only)
# ---------------------------------------------------------------------------


def _dotc(const_mat: np.ndarray, x: jax.Array) -> jax.Array:
    """(a, b) const @ (b, T) -> (a, T)."""
    return jax.lax.dot_general(
        jnp.asarray(const_mat),
        x,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fk(s: _Spec, q, qd):
    """Per-body unrolled FK. q (nq, T), qd (nv, T).

    Returns X, Q, V (lists per body of comp lists), S/Sdot (6 x (nv, T)).
    World/origin spatial coordinates exactly as dynamics.forward_kinematics.
    """
    T = q.shape[-1]
    zero = jnp.zeros((1, T))
    one = jnp.ones((1, T))
    X, Qt, V = [], [], []
    S_rows = [None] * s.nv  # each: list of 6 comps, (1, T)
    Sd_rows = [None] * s.nv
    for i in range(s.nbody):
        p = s.parent[i]
        if p == -1:
            xp = [zero] * 3
            qp = [zero, zero, zero, one]
            vp = [zero] * 6
        else:
            xp, qp, vp = X[p], Qt[p], V[p]
        w_p, vo_p = vp[:3], vp[3:]
        bp = [float(s.body_pos[i, k]) * one for k in range(3)]
        bq = [float(s.body_quat[i, k]) * one for k in range(4)]
        X_x = [xp[k] + r for k, r in enumerate(_qrot(qp, bp))]
        X_q = _qmul(qp, bq)
        jt = s.jnt_type[i]
        qa, va = int(s.q_adr[i]), int(s.v_adr[i])
        if jt == FREE:
            xi = [q[qa + k][None] for k in range(3)]
            qi = _qnormalize([q[qa + 3 + k][None] for k in range(4)])
            vel_lin = [qd[va + k][None] for k in range(3)]
            omega = [qd[va + 3 + k][None] for k in range(3)]
            cwx = _cross(omega, xi)
            vi = omega + [vel_lin[k] - cwx[k] for k in range(3)]
            # rows 0-2: translations (0, e_k); rows 3-5: rotations (e_k, x cross e_k)
            for k in range(3):
                row = [zero] * 6
                row[3 + k] = one
                S_rows[va + k] = row
                Sd_rows[va + k] = [zero] * 6
            ex = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
            for k in range(3):
                cxe = _cross(xi, ex[k])
                S_rows[va + 3 + k] = ex[k] + cxe
                cve = _cross(vel_lin, ex[k])
                Sd_rows[va + 3 + k] = [zero] * 3 + cve
        elif jt in (HINGE, SLIDE):
            ax = [float(s.jnt_axis[i, k]) * one for k in range(3)]
            jp = [float(s.jnt_pos[i, k]) * one for k in range(3)]
            sq_i = q[qa][None]
            sqd = qd[va][None]
            ax_w = _qrot(X_q, ax)
            if jt == HINGE:
                half = 0.5 * sq_i
                sin_h, cos_h = jnp.sin(half), jnp.cos(half)
                jq = [ax[k] * sin_h for k in range(3)] + [cos_h]
                qi = _qmul(X_q, jq)
                anchor = [X_x[k] + r for k, r in enumerate(_qrot(X_q, jp))]
                xi = [anchor[k] - r for k, r in enumerate(_qrot(qi, jp))]
                Srow = ax_w + _cross(anchor, ax_w)
                ax_dot = _cross(w_p, ax_w)
                v_anchor = [vo_p[k] + c for k, c in enumerate(_cross(w_p, anchor))]
                cva = _cross(v_anchor, ax_w)
                cad = _cross(anchor, ax_dot)
                Sdrow = ax_dot + [cva[k] + cad[k] for k in range(3)]
            else:  # SLIDE
                qi = X_q
                xi = [X_x[k] + ax_w[k] * sq_i for k in range(3)]
                Srow = [zero] * 3 + ax_w
                Sdrow = [zero] * 3 + _cross(w_p, ax_w)
            vi = [vp[k] + Srow[k] * sqd for k in range(6)]
            S_rows[va] = Srow
            Sd_rows[va] = Sdrow
        else:  # FIXED
            xi, qi, vi = X_x, X_q, vp
        X.append(xi)
        Qt.append(qi)
        V.append(vi)
    S = [jnp.concatenate([S_rows[d][k] for d in range(s.nv)], 0) for k in range(6)]
    Sdot = [
        jnp.concatenate([Sd_rows[d][k] for d in range(s.nv)], 0) for k in range(6)
    ]
    return X, Qt, V, S, Sdot


def _stackb(lst_of_comp, k):
    """Stack component k of a per-body list -> (nbody, T)."""
    return jnp.concatenate([b[k] for b in lst_of_comp], 0)


def _spatial_inertia(s: _Spec, Xb, Qb, m_dyn=None, ipos_dyn=None,
                     inertia_dyn=None):
    """World-origin 6x6 spatial inertia entries Io[r][k]: (nbody, T) each.

    Mirrors maths.spatial_inertia_at_origin: with c = world CoM,
    Io = [[Iw - m cx cx, m cx], [-m cx, m I]]. `m_dyn` (nbody, T)
    overrides the static body masses; `ipos_dyn` (3 comps of (nbody, T))
    the CoM offsets; `inertia_dyn` (9 comp-major blocks of (nbody, T))
    the body-frame inertia tensors -- the per-env DR leaves, exactly
    like the vmap path under batched-Model DR.
    """
    x, y, z, w = (Qb[k] for k in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]
    if ipos_dyn is not None:
        ipos = ipos_dyn
    else:
        ipos = [jnp.asarray(s.body_ipos[:, k:k + 1]) for k in range(3)]
    com = [
        Xb[k] + sum(R[k][j] * ipos[j] for j in range(3)) for k in range(3)
    ]
    # Iw = R I R^T (I const per body unless DR-batched)
    if inertia_dyn is not None:
        Ib = [[inertia_dyn[a * 3 + b] for b in range(3)] for a in range(3)]
    else:
        Ib = [[jnp.asarray(s.body_inertia[:, a:a + 1, b].copy()) for b in range(3)] for a in range(3)]
    RI = [[sum(R[a][c] * Ib[c][b] for c in range(3)) for b in range(3)] for a in range(3)]
    Iw = [[sum(RI[a][c] * R[b][c] for c in range(3)) for b in range(3)] for a in range(3)]
    m = m_dyn if m_dyn is not None else jnp.asarray(s.body_mass[:, None])
    cx, cy, cz = com
    # m * cx_mat @ cx_mat  (cx_mat = skew(c))
    c2 = cx * cx + cy * cy + cz * cz
    Io = [[None] * 6 for _ in range(6)]
    for a in range(3):
        for b in range(3):
            # -m (cxcx)[a,b] = m (c.c delta_ab - c_a c_b)
            corr = m * ((c2 if a == b else 0.0) - com[a] * com[b])
            Io[a][b] = Iw[a][b] + corr
    # top-right m*skew(c); bottom-left -m*skew(c); bottom-right m I
    sk = [[0.0, -cz, cy], [cz, 0.0, -cx], [-cy, cx, 0.0]]
    zero = jnp.zeros_like(cx)
    for a in range(3):
        for b in range(3):
            v = sk[a][b]
            val = zero if isinstance(v, float) else m * v
            Io[a][3 + b] = val
            Io[3 + a][b] = -val
            Io[3 + a][3 + b] = m * (1.0 if a == b else 0.0) * jnp.ones_like(cx)
    return Io, com


def _substep_fn(s: _Spec, p: SimParams, h: float, gravity: np.ndarray,
                has_xfrc: bool, has_qt: bool):
    """Build the single-substep function for this model.

    The returned substep takes a `dyn` dict of per-env (rows, T) leaf
    overrides (DYN_LEAVES + "gravity") replacing the corresponding
    static-model constants -- the fused path for domain-randomized
    models (the vmap engine's batched Model leaves)."""
    children = [[] for _ in range(s.nbody)]
    for i in range(s.nbody):
        if s.parent[i] != -1:
            children[s.parent[i]].append(i)
    rev_topo = list(range(s.nbody))[::-1]
    dof_of_body = [
        [d for d in range(s.nv) if s.dof_body[d] == b] for b in range(s.nbody)
    ]
    n3 = (s.nc + s.pp_nc + s.sp_n + s.att_n) * 3
    erp, erp_att = p.baumgarte_erp, p.baumgarte_erp_attractor
    # q index per dof for scalar gathers (free dofs -> 0, masked)
    sel_q = np.zeros((s.nv, s.nq), np.float32)
    for d in range(s.nv):
        if s.sq_adr[d] >= 0:
            sel_q[d, s.sq_adr[d]] = 1.0
    iters = p.solver_apgd_iterations
    t_seq = [1.0]
    for _ in range(iters):
        t_seq.append(0.5 * (1.0 + float(np.sqrt(1.0 + 4.0 * t_seq[-1] ** 2))))
    betas = [(t_seq[k] - 1.0) / t_seq[k + 1] for k in range(iters)]

    def _bc3(arr2d: np.ndarray, T: int) -> jax.Array:
        """Lane-tiled 3-D constant (a, b, T): Mosaic rejects reshapes/
        broadcasts of captured (a, b, 1) constants, so materialize the
        lane axis host-side (these masks are small)."""
        a = np.asarray(arr2d, np.float32)
        return jnp.asarray(np.broadcast_to(a[:, :, None], (*a.shape, T)).copy())

    def _blocks(arr, n, k):
        """Comp-major (k*n, T) dyn rows -> k static slices of (n, T)."""
        return [arr[i * n:(i + 1) * n] for i in range(k)]

    def substep(q, qd, qfrc, xfrc, q_target, warm, dyn=None):
        dyn = dyn or {}
        T = q.shape[-1]
        Xl, Ql, Vl, S, Sdot = _fk(s, q, qd)
        Xb = [_stackb(Xl, k) for k in range(3)]
        Qb = [_stackb(Ql, k) for k in range(4)]
        Vb = [_stackb(Vl, k) for k in range(6)]
        Io, com = _spatial_inertia(
            s, Xb, Qb, dyn.get("body_mass"),
            _blocks(dyn["body_ipos"], s.nbody, 3)
            if "body_ipos" in dyn else None,
            _blocks(dyn["body_inertia"], s.nbody, 9)
            if "body_inertia" in dyn else None,
        )
        # per-env contact-point positions (actor-scale DR): comp blocks
        # over the FULL model cpoint array (plane rows use [0..nc) in
        # order; pair rows pick with pp_pick_pt)
        ncp_model = s.pp_pick_pt.shape[1]  # full model cpoint count
        cpp = (
            _blocks(dyn["cpoint_pos"], ncp_model, 3)
            if "cpoint_pos" in dyn else None
        )

        # composite inertia via reverse-topological accumulation:
        # IC[b] = Io[b] + sum_children IC[child]; store per-body slices.
        ICb = [[[Io[r][k][b:b + 1] for k in range(6)] for r in range(6)]
               for b in range(s.nbody)]
        for b in rev_topo:
            pb = s.parent[b]
            if pb != -1:
                for r in range(6):
                    for k in range(6):
                        ICb[pb][r][k] = ICb[pb][r][k] + ICb[b][r][k]
        # F[d] = IC[body(d)] @ S[d] : 6 comps of (nv, T)
        ICd = [
            [jnp.concatenate([ICb[s.dof_body[d]][r][k] for d in range(s.nv)], 0)
             for k in range(6)]
            for r in range(6)
        ]
        F = [sum(ICd[r][k] * S[k] for k in range(6)) for r in range(6)]
        # M = (F . S) on ancestor pairs, symmetrized
        Ml = sum(F[r][:, None, :] * S[r][None, :, :] for r in range(6))
        Ml = Ml * _bc3(s.dof_mask, T)
        eye3 = _bc3(np.eye(s.nv, dtype=np.float32), T)
        M = Ml + jnp.swapaxes(Ml, 0, 1) - Ml * eye3

        # bias force: zeta (velocity-product acc) by path accumulation
        zeta_b = []
        for i in range(s.nbody):
            pb = s.parent[i]
            zet = [jnp.zeros((1, T))] * 6 if pb == -1 else list(zeta_b[pb])
            for d in dof_of_body[i]:
                qd_d = qd[d][None]
                zet = [zet[k] + Sdot[k][d][None] * qd_d for k in range(6)]
            zeta_b.append(zet)
        zeta = [jnp.concatenate([z[k] for z in zeta_b], 0) for k in range(6)]
        if "gravity" in dyn:
            gdyn = dyn["gravity"]  # (3, T)
            x_in = [zeta[k] for k in range(3)] + [
                zeta[3 + k] - gdyn[k:k + 1] for k in range(3)
            ]
        else:
            a_grav = [0.0, 0.0, 0.0] + [float(g) for g in gravity]
            x_in = [zeta[k] - a_grav[k] for k in range(6)]
        net = [sum(Io[r][k] * x_in[k] for k in range(6)) for r in range(6)]
        # + v x* (Io v)
        Iov = [sum(Io[r][k] * Vb[k] for k in range(6)) for r in range(6)]
        wv, vo = Vb[:3], Vb[3:]
        nIov, pIov = Iov[:3], Iov[3:]
        c1 = _cross(wv, nIov)
        c2 = _cross(vo, pIov)
        c3 = _cross(wv, pIov)
        for k in range(3):
            net[k] = net[k] + c1[k] + c2[k]
            net[3 + k] = net[3 + k] + c3[k]
        if has_xfrc:
            for k in range(6):
                net[k] = net[k] - xfrc[k * s.nbody:(k + 1) * s.nbody]
        # subtree sums: F_sub = anc^T @ net; dof gather as one-hot matmul
        # (fancy-index gathers are scatter/gather lowering hazards in Mosaic)
        ancT = s.anc.T.astype(np.float32)
        dof_pick = np.zeros((s.nv, s.nbody), np.float32)
        dof_pick[np.arange(s.nv), s.dof_body] = 1.0
        F_sub_d = [_dotc(dof_pick @ ancT, net[k]) for k in range(6)]
        C = sum(S[k] * F_sub_d[k] for k in range(6))

        # passive forces (implicit spring/damping, limits, tendons)
        q_scalar = _dotc(sel_q, q)
        setpoint = (
            _dotc(sel_q, q_target) if has_qt
            else jnp.asarray((sel_q @ s.qpos0)[:, None])
        )
        kstiff = dyn.get(
            "dof_stiffness", jnp.asarray(s.dof_stiffness[:, None])
        )
        kdamp = dyn.get("dof_damping", jnp.asarray(s.dof_damping[:, None]))
        limited = jnp.asarray(s.dof_limited[:, None])
        lo = dyn.get(
            "dof_limit_lower", jnp.asarray(s.dof_limit_lower[:, None])
        )
        hi = dyn.get(
            "dof_limit_upper", jnp.asarray(s.dof_limit_upper[:, None])
        )
        tau_p = -kstiff * (q_scalar - setpoint)
        over = jnp.maximum(q_scalar - hi, 0.0)
        under = jnp.maximum(lo - q_scalar, 0.0)
        violating = ((over > 0) | (under > 0)).astype(jnp.float32)
        tau_p = tau_p + limited * (-p.limit_stiffness * (over - under))
        D = kdamp + limited * violating * p.limit_damping
        if "dof_friction" in dyn or np.any(s.dof_friction):
            # regularized Coulomb joint friction folded into the implicit
            # damping diagonal (dynamics.drive_forces semantics)
            kfric = dyn.get(
                "dof_friction", jnp.asarray(s.dof_friction[:, None])
            )
            D = D + kfric / (jnp.abs(qd) + 2e-3)
        K = kstiff + limited * violating * p.limit_stiffness
        if s.tendon_coef is not None:
            t_val = _dotc(s.tendon_coef, q_scalar)
            t_vel = _dotc(s.tendon_coef, qd)
            t_lo = jnp.asarray(s.tendon_range[:, 0:1])
            t_hi = jnp.asarray(s.tendon_range[:, 1:2])
            viol = jnp.maximum(t_val - t_hi, 0.0) + jnp.minimum(t_val - t_lo, 0.0)
            f_t = (
                -dyn.get(
                    "tendon_stiffness",
                    jnp.asarray(s.tendon_stiffness[:, None]),
                ) * viol
                - dyn.get(
                    "tendon_damping",
                    jnp.asarray(s.tendon_damping[:, None]),
                ) * t_vel
            )
            tau_p = tau_p + _dotc(s.tendon_coef.T, f_t)

        # Mh = M + diag(h D + h^2 K); invert by vectorized Gauss-Jordan
        diag_add = (
            dyn.get("armature", jnp.asarray(s.armature[:, None]))
            + h * D + h * h * K
        )
        Mh = M + eye3 * diag_add[:, None, :]
        A_gj = Mh
        Minv = eye3 + jnp.zeros_like(Mh)
        # Gauss-Jordan without scatter: with c = col_j - e_j the update
        # A <- A - c pivA^T handles rows i != j normally AND maps row j to
        # exactly pivA (row_j - (A_jj - 1) * row_j / A_jj = pivA).  The
        # one-hot e_j is built from a traced iota, not a captured 3-D
        # constant (Mosaic rejects lane-moving constant reshapes).
        T_ = A_gj.shape[-1]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (s.nv, 1, T_), 0)
        for j in range(s.nv):
            row_j = A_gj[j]  # (nv, T)
            d = 1.0 / row_j[j:j + 1]  # (1, T)
            pivA = row_j * d  # (nv, T)
            pivI = Minv[j] * d
            colA = A_gj[:, j:j + 1, :]  # (nv, 1, T) -- slice, not gather
            c = colA - (row_iota == j).astype(jnp.float32)
            A_gj = A_gj - c * pivA[None, :, :]
            Minv = Minv - c * pivI[None, :, :]

        rhs = qfrc + tau_p - D * qd - C
        qdd = jnp.sum(Minv * rhs[None, :, :], axis=1)
        qd_free = qd + h * qdd

        nct = s.nc + s.pp_nc + s.sp_n + s.att_n
        if nct == 0:
            qd_new = jnp.clip(qd_free, -p.max_dof_velocity, p.max_dof_velocity)
            q_new = _integrate(s, q, qd_new, h)
            zs = jnp.zeros((s.nbody * 3, T))
            return q_new, qd_new, warm, zs, zs, jnp.zeros((s.nv, T))

        S_ang = [S[k] for k in range(3)]
        S_lin = [S[3 + k] for k in range(3)]

        def point_jac_world(xw, Pm):
            """World-comp point-jacobian rows: 3 comps of (nv, k, T),
            masked (signed) by Pm."""
            out = []
            for k in range(3):
                a, b = (k + 1) % 3, (k + 2) % 3
                crossk = (
                    S_ang[a][:, None, :] * xw[b][None, :, :]
                    - S_ang[b][:, None, :] * xw[a][None, :, :]
                )
                out.append((S_lin[k][:, None, :] + crossk) * Pm)
            return out

        # ---- plane rows: candidate points vs ground (frame = world) ----
        if s.nc:
            cp_pos = (
                [cpp[k][: s.nc] for k in range(3)]
                if cpp is not None
                else [jnp.asarray(s.cp_pos[:, k:k + 1]) for k in range(3)]
            )
            # body->contact gathers as one-hot matmuls (Mosaic: no gather)
            cp_pick = np.zeros((s.nc, s.nbody), np.float32)
            cp_pick[np.arange(s.nc), s.cp_body] = 1.0
            bQ = [_dotc(cp_pick, Qb[k]) for k in range(4)]
            bX = [_dotc(cp_pick, Xb[k]) for k in range(3)]
            rot = _qrot(bQ, cp_pos)
            xc = [bX[k] + rot[k] for k in range(3)]  # (nc, T)
            Pm = _bc3(s.path_mask.T, T)  # (nv, nc, T)
            Jp_w = point_jac_world(xc, Pm)
            terr = "_terr_h" in dyn
            if terr:
                # heightfield ground: per-point plane (height + frame)
                # sampled OUTSIDE the kernel at the control step's entry
                # positions (contacts.constraint_data terrain branch:
                # phi = radius - (x_z - h) * n_z, rows rotated into the
                # [t1, t2, n] surface frame). Within-step slices reuse the
                # entry-sampled plane -- the one documented divergence
                # from the vmap engine, which resamples per slice.
                th = dyn["_terr_h"]  # (nc, T)
                tn = [dyn[f"_terr_n{k}"] for k in range(3)]
                tt1 = [dyn[f"_terr_t1{k}"] for k in range(3)]
                tt2 = [dyn[f"_terr_t2{k}"] for k in range(3)]
                phi_p = jnp.asarray(s.cp_radius[:, None]) - (
                    xc[2] - th
                ) * tn[2]
                Jt1_blocks = [sum(tt1[k][None] * Jp_w[k] for k in range(3))]
                Jt2_blocks = [sum(tt2[k][None] * Jp_w[k] for k in range(3))]
                Jn_blocks = [sum(tn[k][None] * Jp_w[k] for k in range(3))]
            else:
                phi_p = jnp.asarray(s.cp_radius[:, None]) - xc[2]
                # plane frame = world axes: rotated rows ARE the world comps
                Jt1_blocks, Jt2_blocks, Jn_blocks = (
                    [Jp_w[0]], [Jp_w[1]], [Jp_w[2]]
                )
            phi_blocks = [phi_p]
        else:
            Jt1_blocks, Jt2_blocks, Jn_blocks, phi_blocks = [], [], [], []

        # ---- pair rows: candidate points vs analytic geoms on another
        # body (the hand-object narrowphase of contacts.py source 2b),
        # all in component form; geom types are static per row ----
        if s.pp_nc:
            npp = s.pp_nc
            ppt = (
                [_dotc(s.pp_pick_pt, cpp[k]) for k in range(3)]
                if cpp is not None
                else [jnp.asarray(s.pp_pos[:, k:k + 1]) for k in range(3)]
            )
            aQ = [_dotc(s.pp_pick_a, Qb[k]) for k in range(4)]
            aX = [_dotc(s.pp_pick_a, Xb[k]) for k in range(3)]
            rot = _qrot(aQ, ppt)
            xw = [aX[k] + rot[k] for k in range(3)]  # point world (npp, T)
            # geom world pose
            bQg = [_dotc(s.pp_pick_b, Qb[k]) for k in range(4)]
            bXg = [_dotc(s.pp_pick_b, Xb[k]) for k in range(3)]
            gpos = [jnp.asarray(s.pp_gpos[:, k:k + 1]) for k in range(3)]
            gquat = [jnp.asarray(s.pp_gquat[:, k:k + 1]) for k in range(4)]
            Xg = [bXg[k] + o for k, o in enumerate(_qrot(bQg, gpos))]
            Qg = _qmul(bQg, gquat)
            Qg_c = [-Qg[0], -Qg[1], -Qg[2], Qg[3]]  # conjugate
            dvec = _qrot(Qg_c, [xw[k] - Xg[k] for k in range(3)])
            radius = jnp.asarray(s.pp_radius[:, None])
            half = (
                [
                    _dotc(s.pp_pick_geom, g)
                    for g in _blocks(
                        dyn["geom_size"], s.pp_pick_geom.shape[1], 3
                    )
                ]
                if "geom_size" in dyn
                else [jnp.asarray(s.pp_gsize[:, k:k + 1]) for k in range(3)]
            )
            is_box = jnp.asarray(
                (s.pp_gtype[:, None] == 2).astype(np.float32)
            )
            # BOX: clamp-to-volume with inside handling (contacts.py
            # _sphere_vs_geom BOX branch, where-chains instead of argmin)
            c = [jnp.clip(dvec[k], -half[k], half[k]) for k in range(3)]
            rel = [dvec[k] - c[k] for k in range(3)]
            dist_box = jnp.sqrt(
                rel[0] ** 2 + rel[1] ** 2 + rel[2] ** 2 + 1e-18
            )
            gaps = [half[k] - jnp.abs(dvec[k]) for k in range(3)]
            inside = (
                (gaps[0] > 0).astype(jnp.float32)
                * (gaps[1] > 0).astype(jnp.float32)
                * (gaps[2] > 0).astype(jnp.float32)
            )
            g_min = jnp.minimum(gaps[0], jnp.minimum(gaps[1], gaps[2]))
            k0 = ((gaps[0] <= gaps[1]) & (gaps[0] <= gaps[2])).astype(
                jnp.float32
            )
            k1 = ((gaps[1] < gaps[0]) & (gaps[1] <= gaps[2])).astype(
                jnp.float32
            ) * (1.0 - k0)
            k2 = 1.0 - k0 - k1
            ks = [k0, k1, k2]
            sgn = [
                jnp.where(dvec[k] >= 0.0, 1.0, -1.0) for k in range(3)
            ]
            n_in = [ks[k] * sgn[k] for k in range(3)]
            c_in = [
                ks[k] * sgn[k] * half[k] + (1.0 - ks[k]) * dvec[k]
                for k in range(3)
            ]
            inv_dist = 1.0 / jnp.maximum(dist_box, 1e-9)
            n_out = [rel[k] * inv_dist for k in range(3)]
            phi_box = jnp.where(
                inside > 0, radius + g_min, radius - dist_box
            )
            nl_box = [
                jnp.where(inside > 0, n_in[k], n_out[k]) for k in range(3)
            ]
            surf_box = [
                jnp.where(inside > 0, c_in[k], c[k]) for k in range(3)
            ]
            # SPHERE: radial closest point
            dist_sph = jnp.sqrt(
                dvec[0] ** 2 + dvec[1] ** 2 + dvec[2] ** 2 + 1e-18
            )
            inv_sph = 1.0 / jnp.maximum(dist_sph, 1e-9)
            nl_sph = [dvec[k] * inv_sph for k in range(3)]
            phi_sph = half[0] + radius - dist_sph
            surf_sph = [nl_sph[k] * half[0] for k in range(3)]
            # CYLINDER: radius half[0], half-height half[1]
            # (contacts._sphere_vs_geom CYLINDER branch, where-chains)
            dxy = jnp.sqrt(dvec[0] ** 2 + dvec[1] ** 2 + 1e-18)
            sc_c = jnp.minimum(1.0, half[0] / jnp.maximum(dxy, 1e-9))
            c_cyl = [
                dvec[0] * sc_c,
                dvec[1] * sc_c,
                jnp.clip(dvec[2], -half[1], half[1]),
            ]
            inside_c = (
                (dxy < half[0]) & (jnp.abs(dvec[2]) < half[1])
            ).astype(jnp.float32)
            gap_r = half[0] - dxy
            gap_z = half[1] - jnp.abs(dvec[2])
            big = (dxy > 1e-6).astype(jnp.float32)
            inv_dxy = 1.0 / jnp.maximum(dxy, 1e-9)
            rd = [
                big * dvec[0] * inv_dxy + (1.0 - big),
                big * dvec[1] * inv_dxy,
            ]
            use_r = (gap_r < gap_z).astype(jnp.float32)
            sgn_z = jnp.sign(dvec[2])
            c_in_c = [
                use_r * rd[0] * half[0] + (1.0 - use_r) * dvec[0],
                use_r * rd[1] * half[0] + (1.0 - use_r) * dvec[1],
                use_r * dvec[2] + (1.0 - use_r) * sgn_z * half[1],
            ]
            n_in_c = [use_r * rd[0], use_r * rd[1], (1.0 - use_r) * sgn_z]
            pen_in_c = jnp.minimum(gap_r, gap_z)
            rel_c = [dvec[k] - c_cyl[k] for k in range(3)]
            dist_c = jnp.sqrt(
                rel_c[0] ** 2 + rel_c[1] ** 2 + rel_c[2] ** 2 + 1e-18
            )
            inv_dc = 1.0 / jnp.maximum(dist_c, 1e-9)
            n_out_c = [rel_c[k] * inv_dc for k in range(3)]
            phi_cyl = jnp.where(
                inside_c > 0, radius + pen_in_c, radius - dist_c
            )
            nl_cyl = [
                jnp.where(inside_c > 0, n_in_c[k], n_out_c[k])
                for k in range(3)
            ]
            surf_cyl = [
                jnp.where(inside_c > 0, c_in_c[k], c_cyl[k])
                for k in range(3)
            ]
            is_cyl = jnp.asarray(
                (s.pp_gtype[:, None] == 3).astype(np.float32)
            )
            is_sph = 1.0 - is_box - is_cyl
            phi_pp = (
                is_box * phi_box + is_cyl * phi_cyl + is_sph * phi_sph
            )
            n_l = [
                is_box * nl_box[k] + is_cyl * nl_cyl[k] + is_sph * nl_sph[k]
                for k in range(3)
            ]
            surf = [
                is_box * surf_box[k]
                + is_cyl * surf_cyl[k]
                + is_sph * surf_sph[k]
                for k in range(3)
            ]
            n_w = _qrot(Qg, n_l)  # world normal, geom -> point
            xs_w = [Xg[k] + o for k, o in enumerate(_qrot(Qg, surf))]
            # branchless tangent basis (contacts._tangent_basis)
            use_z = (jnp.abs(n_w[2]) < 0.9).astype(jnp.float32)
            ref = [1.0 - use_z, jnp.zeros_like(use_z), use_z]
            t1r = _cross(ref, n_w)
            t1n = 1.0 / jnp.maximum(
                jnp.sqrt(t1r[0] ** 2 + t1r[1] ** 2 + t1r[2] ** 2), 1e-9
            )
            t1 = [t1r[k] * t1n for k in range(3)]
            t2 = _cross(n_w, t1)
            Pm_pp = _bc3(s.pp_path, T)  # (nv, npp, T) SIGNED (A - B)
            Jpp_w = point_jac_world(xs_w, Pm_pp)
            Jt1_blocks.append(
                sum(t1[k][None, :, :] * Jpp_w[k] for k in range(3))
            )
            Jt2_blocks.append(
                sum(t2[k][None, :, :] * Jpp_w[k] for k in range(3))
            )
            Jn_blocks.append(
                sum(n_w[k][None, :, :] * Jpp_w[k] for k in range(3))
            )
            phi_blocks.append(phi_pp)

        # ---- SDF pair rows (contacts.py source 2c, Factory/IndustReal):
        # candidate points on body A vs the voxel SDF attached to body B.
        # The FIELD is entry-sampled OUTSIDE the kernel (sdf_dyn: phi0 +
        # world plane frame at the control step's entry pose -- Mosaic
        # has no lane-varying gather for the trilinear grid lookup);
        # within-step slices move the point against the frozen
        # first-order field: phi = phi0 - n . (xc - x0).  Same documented
        # divergence class as heightfield terrain.
        if s.sp_n:
            spt = (
                [_dotc(s.sp_pick_pt, cpp[k]) for k in range(3)]
                if cpp is not None
                else [jnp.asarray(s.sp_pos[:, k:k + 1]) for k in range(3)]
            )
            sQ = [_dotc(s.sp_pick_a, Qb[k]) for k in range(4)]
            sX = [_dotc(s.sp_pick_a, Xb[k]) for k in range(3)]
            rot_s = _qrot(sQ, spt)
            xs_sp = [sX[k] + rot_s[k] for k in range(3)]  # (nsp, T)
            sp_n_w = [dyn[f"_sp_n{k}"] for k in range(3)]
            sp_t1 = [dyn[f"_sp_t1{k}"] for k in range(3)]
            sp_t2 = [dyn[f"_sp_t2{k}"] for k in range(3)]
            sp_x0 = [dyn[f"_sp_x0{k}"] for k in range(3)]
            phi_sp = dyn["_sp_phi0"] - sum(
                sp_n_w[k] * (xs_sp[k] - sp_x0[k]) for k in range(3)
            )
            Pm_sp = _bc3(s.sp_path, T)  # (nv, nsp, T) signed (A - B)
            Jsp_w = point_jac_world(xs_sp, Pm_sp)
            Jt1_blocks.append(
                sum(sp_t1[k][None, :, :] * Jsp_w[k] for k in range(3))
            )
            Jt2_blocks.append(
                sum(sp_t2[k][None, :, :] * Jsp_w[k] for k in range(3))
            )
            Jn_blocks.append(
                sum(sp_n_w[k][None, :, :] * Jsp_w[k] for k in range(3))
            )
            phi_blocks.append(phi_sp)

        # ---- bilateral point anchors (attractors, contacts.py source 3):
        # 3 world-axis rows per anchor, unprojected, driving the anchor-
        # point error to zero at erp_att/h ----
        if s.att_n:
            aoff = [jnp.asarray(s.att_offset[:, k:k + 1]) for k in range(3)]
            atgt = [jnp.asarray(s.att_target[:, k:k + 1]) for k in range(3)]
            aQat = [_dotc(s.att_pick, Qb[k]) for k in range(4)]
            aXat = [_dotc(s.att_pick, Xb[k]) for k in range(3)]
            rot_a = _qrot(aQat, aoff)
            xa = [aXat[k] + rot_a[k] for k in range(3)]  # (natt, T)
            err_att = [atgt[k] - xa[k] for k in range(3)]
            Pm_att = _bc3(s.att_path, T)  # (nv, natt, T)
            Ja_w = point_jac_world(xa, Pm_att)
            Jt1_blocks.append(Ja_w[0])
            Jt2_blocks.append(Ja_w[1])
            Jn_blocks.append(Ja_w[2])
            phi_blocks.append(jnp.zeros((s.att_n, T)))
        else:
            err_att = None

        phi = jnp.concatenate(phi_blocks, 0)  # (nct, T)
        active = (phi > -p.contact_margin).astype(jnp.float32)
        # bilateral mask (att rows), (nct, 1) static
        bil_full = jnp.asarray(
            np.concatenate(
                [
                    np.zeros(s.nc + s.pp_nc + s.sp_n, np.float32),
                    np.ones(s.att_n, np.float32),
                ]
            )[:, None]
        )
        J = jnp.concatenate(
            [
                jnp.concatenate(Jt1_blocks, axis=1),
                jnp.concatenate(Jt2_blocks, axis=1),
                jnp.concatenate(Jn_blocks, axis=1),
            ],
            axis=1,
        )  # (nv, 3*nct, T), comp-major rows
        if "cpoint_friction" in dyn:
            # plane rows are all candidate points in order; pp rows
            # average the (dynamic) point side with the (static) geom
            # side, exactly like contacts.constraint_data source 2b
            cpf = dyn["cpoint_friction"]  # (ncp_model, T)
            mu_parts = []
            if s.nc:
                mu_parts.append(cpf)
            if s.pp_nc:
                mu_parts.append(
                    0.5 * (
                        _dotc(s.pp_pick_pt, cpf)
                        + jnp.asarray(s.pp_geom_fric[:, None])
                    )
                )
            if s.sp_n:
                # sp rows use the point-side friction (source 2c)
                mu_parts.append(_dotc(s.sp_pick_pt, cpf))
            if s.att_n:
                mu_parts.append(jnp.zeros((s.att_n, T)))
            mu_full = jnp.concatenate(mu_parts, 0)
        else:
            mu_full = jnp.asarray(
                np.concatenate(
                    [s.cp_mu, s.pp_mu, s.sp_mu, np.zeros(s.att_n)]
                ).astype(np.float32)[:, None]
            )
        # full-row velocity-target adjustments, built BEFORE selection so
        # gathered rows carry them: unilateral normal rows get the
        # Baumgarte/approach target vn_t(phi); bilateral rows get the
        # anchor-error drive on all 3 world comps (contacts.py b - v_err)
        vn_t_full = jnp.where(
            phi > 0,
            jnp.minimum(erp * phi / h, p.max_depenetration_velocity),
            phi / h,
        )
        if "cpoint_restitution" in dyn or np.any(s.rest):
            # Newton restitution (contacts.solve_contacts): touching rows
            # impacting faster than the bounce threshold target -e*v_n^-,
            # combined with Baumgarte by taking the larger outward target
            if "cpoint_restitution" in dyn:
                cr = dyn["cpoint_restitution"]  # (ncp_model, T)
                r_parts = []
                if s.nc:
                    r_parts.append(cr)
                if s.pp_nc:
                    r_parts.append(_dotc(s.pp_pick_pt, cr))
                if s.sp_n:
                    r_parts.append(_dotc(s.sp_pick_pt, cr))
                if s.att_n:
                    r_parts.append(jnp.zeros((s.att_n, T)))
                rest_r = jnp.concatenate(r_parts, 0)
            else:
                rest_r = jnp.asarray(
                    np.concatenate(
                        [s.rest, np.zeros(s.att_n, np.float32)]
                    )[:, None]
                )
            vn_pre = jnp.sum(
                J[:, 2 * nct:, :] * qd_free[:, None, :], axis=0
            )  # (nct, T)
            bounce = (
                (rest_r > 0.0)
                & (phi > -p.contact_margin)
                & (vn_pre < -p.bounce_threshold_velocity)
            )
            vn_t_full = jnp.where(
                bounce,
                jnp.maximum(vn_t_full, -rest_r * vn_pre),
                vn_t_full,
            )
        if s.att_n:
            ke_att = erp_att / h
            nuni = s.nc + s.pp_nc + s.sp_n
            zu = jnp.zeros((nuni, T))
            adj1 = jnp.concatenate([zu, err_att[0] * ke_att], 0)
            adj2 = jnp.concatenate([zu, err_att[1] * ke_att], 0)
            adjn = jnp.concatenate(
                [vn_t_full[:nuni], err_att[2] * ke_att], 0
            )
        else:
            adj1 = adj2 = None
            adjn = vn_t_full

        # ---- top-K active set (contacts.solve_contacts cap semantics):
        # only the cap most-penetrating candidates (PREDICTED depth
        # phi - min(v_n,0)*h, ties to the lower index, exactly lax.top_k's
        # order) enter the Delassus system. Selection is expressed as a
        # rank computation + one-hot masked gathers -- Mosaic has no
        # lane-varying gather, but rank/gather are small VPU reductions
        # and they shrink the dominant residents from (3nct)^2 to
        # (3cap)^2, which is what lets ShadowHand-class models (78+ rows)
        # run fused at all. Row order inside the system is irrelevant
        # (projection is per-contact, preconditioner/Lipschitz are
        # row-permutation invariant), so slot = rank.
        cap = p.max_active_contacts
        use_topk = bool(cap) and cap < nct
        if use_topk:
            vn_free = jnp.sum(
                J[:, 2 * nct:, :] * qd_free[:, None, :], axis=0
            )  # (nct, T)
            key_r = phi - jnp.minimum(vn_free, 0.0) * h
            # bilateral rows always win a slot (vmap: key = inf)
            key_r = jnp.where(bil_full > 0, 1e30, key_r)
            key_r = jnp.where(
                (active > 0) | (bil_full > 0), key_r, -1e30
            )
            # rank_i = #{j beating i}; j-chunked to bound the 3-D temp
            # (all-int32 iota/rank: Mosaic's tpu.iota is integer-only)
            rank = jnp.zeros(key_r.shape, jnp.int32)
            chunk = 32
            for j0 in range(0, nct, chunk):
                jc = min(chunk, nct - j0)
                kj = key_r[j0:j0 + jc][None, :, :]
                ki = key_r[:, None, :]
                ii = jax.lax.broadcasted_iota(jnp.int32, (nct, jc, T), 0)
                jj = (
                    jax.lax.broadcasted_iota(jnp.int32, (nct, jc, T), 1)
                    + j0
                )
                beats = (kj > ki) | ((kj == ki) & (jj < ii))
                rank = rank + jnp.sum(beats.astype(jnp.int32), axis=1)
            # per-slot 2-D masks (a single (cap, nct, T) one-hot trips
            # Mosaic relayout); each is (nct, T)
            onehot = [
                (rank == k).astype(jnp.float32) for k in range(cap)
            ]

            def gat(x):  # (nct, T)/(nct, 1) rows -> (cap, T)
                return jnp.concatenate(
                    [
                        jnp.sum(onehot[k] * x, axis=0, keepdims=True)
                        for k in range(cap)
                    ],
                    0,
                )

            def gatJ(B):  # (nv, nct, T) -> (nv, cap, T), k-loop: no 4-D temp
                cols = [
                    jnp.sum(
                        B * onehot[k][None, :, :], axis=1, keepdims=True
                    )
                    for k in range(cap)
                ]
                return jnp.concatenate(cols, axis=1)

            J_eff = jnp.concatenate(
                [
                    gatJ(J[:, :nct]),
                    gatJ(J[:, nct:2 * nct]),
                    gatJ(J[:, 2 * nct:]),
                ],
                axis=1,
            )
            phi_e = gat(phi)
            active_e = gat(active)
            mu_e = gat(mu_full)
            bil_e = gat(bil_full)
            adjn_e = gat(adjn)
            adj1_e = gat(adj1) if adj1 is not None else None
            adj2_e = gat(adj2) if adj2 is not None else None
            # first substep: no warm impulses yet -- build zeros at the
            # selected size instead of gathering a splat-zero tensor
            # (Mosaic cannot relayout fully-replicated vectors through
            # the masked gather/scatter chain)
            warm_e = (
                jnp.zeros((3 * cap, T))
                if warm is None
                else jnp.concatenate(
                    [
                        gat(warm[:nct]),
                        gat(warm[nct:2 * nct]),
                        gat(warm[2 * nct:]),
                    ],
                    0,
                )
            )
            nce = cap
        else:
            J_eff, phi_e, active_e = J, phi, active
            mu_e, nce, bil_e = mu_full, nct, bil_full
            adj1_e, adj2_e, adjn_e = adj1, adj2, adjn
            warm_e = jnp.zeros((3 * nct, T)) if warm is None else warm

        # Delassus A = J^T Minv J  (formed once, VMEM-resident)
        W = sum(
            Minv[:, j:j + 1, :] * J_eff[j][None, :, :] for j in range(s.nv)
        )  # (nv, 3nce, T) = Minv @ J
        A = sum(J_eff[v][:, None, :] * W[v][None, :, :] for v in range(s.nv))
        # (the 1e-6 diagonal regularization is folded into the APGD
        # matvec below -- materializing eye(3nc) lane-tiled wastes VMEM)

        b_vec = jnp.sum(J_eff * qd_free[:, None, :], axis=0)  # (3nce, T)
        # separated rows allow approach at gap/h (see contacts.py note);
        # bilateral rows drive the 3-D anchor error instead
        if adj1_e is not None:
            b_vec = jnp.concatenate(
                [
                    b_vec[:nce] - adj1_e,
                    b_vec[nce:2 * nce] - adj2_e,
                    b_vec[2 * nce:] - adjn_e,
                ],
                0,
            )
        else:
            b_vec = jnp.concatenate(
                [b_vec[: 2 * nce], b_vec[2 * nce:] - adjn_e], 0
            )

        # Per-contact Jacobi preconditioning, mirroring contacts.py
        # _solve_apgd exactly (the equivalence tests compare trajectories
        # at fixed iteration count): scale each contact's 3 rows by
        # 1/sqrt(mean block diagonal of the regularized Delassus).
        diagA = jnp.sum(J_eff * W, axis=0)  # (3nce, T) diag of J^T Minv J
        d_c = (
            diagA[: nce] + diagA[nce:2 * nce] + diagA[2 * nce:]
        ) / 3.0 + 1e-6
        s_c = jax.lax.rsqrt(jnp.maximum(d_c, 1e-12))  # (nce, T)
        s3 = jnp.concatenate([s_c, s_c, s_c], 0)  # (3nce, T)
        s3sq = s3 * s3
        A = A * s3[:, None, :] * s3[None, :, :]
        b_vec = b_vec * s3

        # Lipschitz bound on the scaled system incl. the (scaled) 1e-6
        # regularization folded into the matvec below.
        Lip = jnp.max(
            jnp.sum(jnp.abs(A), axis=1) + 1e-6 * s3sq, axis=0, keepdims=True
        )
        step = 1.0 / jnp.maximum(Lip, 1e-8)

        def project(y):
            lnc_ = y[2 * nce:]
            # bilateral rows: unprojected (contacts._project_flat)
            ln = jnp.where(bil_e > 0, lnc_, jnp.maximum(lnc_, 0.0))
            t1_, t2_ = y[: nce], y[nce:2 * nce]
            tn = jnp.sqrt(t1_ * t1_ + t2_ * t2_ + 1e-12)
            sc = (
                jnp.where(
                    bil_e > 0, 1.0, jnp.minimum(1.0, mu_e * ln / tn)
                )
                * active_e
            )
            return jnp.concatenate([t1_ * sc, t2_ * sc, ln * active_e], 0)

        lam = project(warm_e / s3)  # into scaled variables
        y = lam
        for beta in betas:
            g_vec = jnp.sum(A * y[None, :, :], axis=1) + 1e-6 * s3sq * y + b_vec
            lam_new = project(y - step * g_vec)
            y = lam_new + beta * (lam_new - lam)
            lam = lam_new
        lam = lam * s3  # back to physical impulses

        qfrc_con = jnp.sum(J_eff * lam[None, :, :], axis=1)  # (nv, T)
        if use_topk:
            # scatter impulses back to full rows (zeros off the active
            # set, matching the vmap path's zeros().at[sel].set(lam)):
            # warm-start and sensor accumulation live in full row space
            def sct(lb):  # (cap, T) -> (nct, T)
                acc = onehot[0] * lb[0:1]
                for k in range(1, cap):
                    acc = acc + onehot[k] * lb[k:k + 1]
                return acc

            lam = jnp.concatenate(
                [sct(lam[:cap]), sct(lam[cap:2 * cap]), sct(lam[2 * cap:])],
                0,
            )
        dqd = jnp.sum(Minv * qfrc_con[None, :, :], axis=1)
        qd_new = jnp.clip(
            qd_free + dqd, -p.max_dof_velocity, p.max_dof_velocity
        )
        q_new = _integrate(s, q, qd_new, h)

        # sensors: per-body contact force/torque (world), dof force
        inv_h = 1.0 / h
        lam_t1 = lam[:nct] * inv_h
        lam_t2 = lam[nct:2 * nct] * inv_h
        lam_n = lam[2 * nct:] * inv_h
        bf = [jnp.zeros((s.nbody, T))] * 3
        bt = [jnp.zeros((s.nbody, T))] * 3
        if s.nc:
            # plane rows: frame = world axes -> force comps are the lams
            Fp = [lam_t1[: s.nc], lam_t2[: s.nc], lam_n[: s.nc]]
            boc = s.body_of_contact
            rel = [xc[k] - bX[k] for k in range(3)]
            tq_p = _cross(rel, Fp)
            bf = [bf[k] + _dotc(boc, Fp[k]) for k in range(3)]
            bt = [bt[k] + _dotc(boc, tq_p[k]) for k in range(3)]
        if s.pp_nc:
            lt1 = lam_t1[s.nc:s.nc + s.pp_nc]
            lt2 = lam_t2[s.nc:s.nc + s.pp_nc]
            ln_ = lam_n[s.nc:s.nc + s.pp_nc]
            Fw = [
                t1[k] * lt1 + t2[k] * lt2 + n_w[k] * ln_ for k in range(3)
            ]
            rel_a = [xs_w[k] - aX[k] for k in range(3)]
            rel_b = [xs_w[k] - bXg[k] for k in range(3)]
            tq_a = _cross(rel_a, Fw)
            tq_b = _cross(rel_b, Fw)
            bf = [
                bf[k] + _dotc(s.pp_boc_a, Fw[k]) - _dotc(s.pp_boc_b, Fw[k])
                for k in range(3)
            ]
            bt = [
                bt[k] + _dotc(s.pp_boc_a, tq_a[k]) - _dotc(s.pp_boc_b, tq_b[k])
                for k in range(3)
            ]
        if s.sp_n:
            s0 = s.nc + s.pp_nc
            ls1 = lam_t1[s0:s0 + s.sp_n]
            ls2 = lam_t2[s0:s0 + s.sp_n]
            lsn = lam_n[s0:s0 + s.sp_n]
            Fs = [
                sp_t1[k] * ls1 + sp_t2[k] * ls2 + sp_n_w[k] * lsn
                for k in range(3)
            ]
            # torque arms about each body's origin (contact point = the
            # candidate point, matching accumulate_body_wrench)
            bXs = [_dotc(s.sp_boc_b.T, Xb[k]) for k in range(3)]
            rel_sa = [xs_sp[k] - sX[k] for k in range(3)]
            rel_sb = [xs_sp[k] - bXs[k] for k in range(3)]
            tq_sa = _cross(rel_sa, Fs)
            tq_sb = _cross(rel_sb, Fs)
            bf = [
                bf[k] + _dotc(s.sp_boc_a, Fs[k]) - _dotc(s.sp_boc_b, Fs[k])
                for k in range(3)
            ]
            bt = [
                bt[k]
                + _dotc(s.sp_boc_a, tq_sa[k])
                - _dotc(s.sp_boc_b, tq_sb[k])
                for k in range(3)
            ]
        if s.att_n:
            a0 = s.nc + s.pp_nc + s.sp_n
            # anchor rows are world-axis frames: force comps ARE the lams
            Fa = [lam_t1[a0:], lam_t2[a0:], lam_n[a0:]]
            rel_at = [xa[k] - aXat[k] for k in range(3)]
            tq_at = _cross(rel_at, Fa)
            bf = [bf[k] + _dotc(s.att_boc, Fa[k]) for k in range(3)]
            bt = [bt[k] + _dotc(s.att_boc, tq_at[k]) for k in range(3)]
        body_force = jnp.concatenate(bf, 0)  # (nbody*3, T) comp-major
        body_torque = jnp.concatenate(bt, 0)
        return q_new, qd_new, lam, body_force, body_torque, qfrc_con * inv_h

    return substep


def _integrate(s: _Spec, q, qd_new, h):
    q_new = q + h * _dotc(s.int_mat, qd_new)
    for i in s.free_bodies:
        qa, va = int(s.q_adr[i]), int(s.v_adr[i])
        omega = [qd_new[va + 3 + k][None] * h for k in range(3)]
        dq = _qexp(omega)
        quat = _qnormalize([q[qa + 3 + k][None] for k in range(4)])
        qn = _qnormalize(_qmul(dq, quat))
        # static-slice row replacement via concat (Mosaic: no scatter;
        # drop the tail slice when the free joint ends q -- Mosaic
        # rejects 0-row vectors)
        parts = [q_new[: qa + 3], jnp.concatenate(qn, 0)]
        if qa + 7 < s.nq:
            parts.append(q_new[qa + 7:])
        q_new = jnp.concatenate(parts, 0)
    return q_new


# ---------------------------------------------------------------------------
# pallas wrapper
# ---------------------------------------------------------------------------


def _step_math(s: _Spec, p: SimParams, has_xfrc: bool, has_qt: bool,
               warm_reset_every: int = 0):
    n_slices = p.substeps * p.solver_iterations
    h = p.dt / n_slices
    gravity = np.asarray(jax.device_get(p.gravity), np.float32)
    substep = _substep_fn(s, p, h, gravity, has_xfrc, has_qt)

    def run(q, qd, qfrc, xfrc, q_target, dyn=None):
        warm = None  # substep builds selected-size zeros on the first slice
        bf = bt = doff = None
        for i in range(n_slices):
            if warm_reset_every and i and i % warm_reset_every == 0:
                # merged-decimation calls (vec_task
                # fused_merge_control_slices) reset the contact warm
                # start at the original per-call boundaries so the
                # merged window solves EXACTLY like control_freq_inv
                # separate kernel invocations
                warm = None
            q, qd, warm, bf, bt, doff = substep(
                q, qd, qfrc, xfrc, q_target, warm, dyn
            )
        return q, qd, bf, bt, doff

    return run


_CACHE: dict = {}


# reserved dyn keys carrying the entry-sampled heightfield plane per
# candidate point (see terrain_dyn); rows = model.ncp each
TERRAIN_KEYS = (
    ("_terr_h",)
    + tuple(f"_terr_n{k}" for k in range(3))
    + tuple(f"_terr_t1{k}" for k in range(3))
    + tuple(f"_terr_t2{k}" for k in range(3))
)


def terrain_dyn(model: Model, terrain, q: jax.Array, qd: jax.Array) -> dict:
    """Entry-sampled terrain plane data for the fused kernel.

    The heightfield lookup is a lane-varying gather (Terrain.sample's
    bilinear indexing), which Mosaic cannot express -- so the caller
    samples height + surface frame at each candidate point's position at
    the START of the control step and ships them into the kernel as
    per-env dyn rows.  Within the step's substep slices the plane is held
    fixed (the vmap engine resamples per slice -- the one documented
    divergence; with dt ~ 5 ms the xy drift per step is sub-cell).

    q, qd: (N, nq)/(N, nv).  Returns {TERRAIN_KEYS: (N, ncp) float32}.
    """
    from .contacts import _tangent_basis

    bodies = np.asarray(model.cpoint_body)

    def one(q1, qd1):
        kin = _dyn.forward_kinematics(model, q1, qd1)
        x = kin.x[bodies] + _maths.quat_rotate(
            kin.quat[bodies], model.cpoint_pos
        )
        # contact points cluster around the robot: patch-sliced dense
        # lookup (Terrain.sample_grad_patch) instead of 4 gathers/point
        center = jnp.mean(x[:, :2], axis=0)
        h, n = terrain.sample_grad_patch(center, x[:, :2], P=32)
        t1, t2 = _tangent_basis(n)
        return h, n, t1, t2

    h, n, t1, t2 = jax.vmap(one)(q, qd)
    d = {"_terr_h": h}
    for k in range(3):
        d[f"_terr_n{k}"] = n[..., k]
        d[f"_terr_t1{k}"] = t1[..., k]
        d[f"_terr_t2{k}"] = t2[..., k]
    return d


# reserved dyn keys for entry-sampled SDF contact planes (one plane per
# spair row, grouped-by-grid row order like contacts.py source 2c)
SP_KEYS = (
    ("_sp_phi0",)
    + tuple(f"_sp_x0{k}" for k in range(3))
    + tuple(f"_sp_n{k}" for k in range(3))
    + tuple(f"_sp_t1{k}" for k in range(3))
    + tuple(f"_sp_t2{k}" for k in range(3))
)


def sdf_dyn(model: Model, q: jax.Array, qd: jax.Array) -> dict:
    """Entry-sampled SDF contact planes for the fused kernel.

    The trilinear SDF grid lookup is a lane-varying gather Mosaic cannot
    express, so the caller samples each spair row's signed distance +
    surface frame at the START of the control step (contacts.py source
    2c math verbatim) and ships them in as per-env dyn rows; within-step
    slices move the point against the frozen first-order field
    (phi = phi0 - n . (x - x0)).  q, qd: (N, nq)/(N, nv); returns
    {SP_KEYS: (N, nsp) float32} in grouped-by-grid row order.
    """
    from ..sdf.builder import SdfGrid, sdf_gradient, sdf_query
    from .contacts import _tangent_basis

    pts = np.asarray(model.spair_point)
    grids = np.asarray(model.spair_sdf)
    order = np.argsort(grids, kind="stable")
    pts_o, grids_o = pts[order], grids[order]

    def one(q1, qd1):
        kin = _dyn.forward_kinematics(model, q1, qd1)
        phis, x0s, ns, t1s, t2s = [], [], [], [], []
        for gid in np.unique(grids_o):
            sel = pts_o[grids_o == gid]
            bodies = np.asarray(model.cpoint_body)[sel]
            bb = model.sdf_body[int(gid)]
            grid = SdfGrid(
                values=model.sdf_values[int(gid)],
                origin=model.sdf_origin[int(gid)],
                spacing=model.sdf_spacing[int(gid)],
            )
            x = kin.x[bodies] + _maths.quat_rotate(
                kin.quat[bodies], model.cpoint_pos[sel]
            )
            d = _maths.quat_rotate_inverse(kin.quat[bb], x - kin.x[bb])
            dist = sdf_query(grid, d)
            grad = sdf_gradient(grid, d)
            n_l = grad / jnp.maximum(
                jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9
            )
            n = _maths.quat_rotate(
                jnp.broadcast_to(kin.quat[bb], n_l.shape[:-1] + (4,)), n_l
            )
            t1, t2 = _tangent_basis(n)
            phis.append(model.cpoint_radius[sel] - dist)
            x0s.append(x)
            ns.append(n)
            t1s.append(t1)
            t2s.append(t2)
        cat = lambda lst: jnp.concatenate(lst, 0)
        return cat(phis), cat(x0s), cat(ns), cat(t1s), cat(t2s)

    phi0, x0, n, t1, t2 = jax.vmap(one)(q, qd)
    d = {"_sp_phi0": phi0}
    for k in range(3):
        d[f"_sp_x0{k}"] = x0[..., k]
        d[f"_sp_n{k}"] = n[..., k]
        d[f"_sp_t1{k}"] = t1[..., k]
        d[f"_sp_t2{k}"] = t2[..., k]
    return d


# Model leaves the kernel accepts as per-env (N, rows) inputs: the
# domain-randomization surface (dr/randomize._ACTOR_PARAM_MAP leaves
# that physics actually consumes). Everything else batched -> vmap.
DYN_LEAVES = (
    "dof_damping", "dof_stiffness", "dof_friction", "armature",
    "dof_limit_lower", "dof_limit_upper", "body_mass",
    "cpoint_friction", "cpoint_restitution",
    "tendon_stiffness", "tendon_damping",
    # geometry/inertia leaves (actor-scale + full-inertia DR): shipped
    # comp-major (component blocks of entities on the rows axis)
    "body_ipos", "body_inertia", "cpoint_pos", "geom_size",
)
# leaves whose model shape carries trailing component axes; call() moves
# the components in front of the entity axis before the (rows, T) layout
_DYN_COMP = ("body_ipos", "body_inertia", "cpoint_pos", "geom_size")
# leaves DR batches that the engine never reads (task-level consumers):
# safe to ignore on the fused path, matching the vmap engine exactly
DYN_INERT = ("dof_max_effort",)


def physics_step_fused(
    model: Model,
    params: SimParams,
    q: jax.Array,  # (N, nq)
    qd: jax.Array,  # (N, nv)
    qfrc: jax.Array,  # (N, nv)
    xfrc: jax.Array | None = None,  # (N, nbody, 6)
    q_target: jax.Array | None = None,  # (N, nq)
    use_pallas: bool | None = None,
    dyn: dict | None = None,  # {DYN_LEAVES|"gravity": (N, rows) arrays}
    warm_reset_every: int = 0,  # reset contact warm-start every k slices
) -> FusedOut:
    """Batched full physics step via the fused kernel.

    Inputs/outputs are env-leading like the vmap path; internally arrays
    are transposed to (rows, N) and tiled over the env-lane axis. `dyn`
    carries per-env model-leaf overrides (domain randomization) as extra
    kernel inputs.
    """
    N = q.shape[0]
    dyn = dyn or {}
    if len(model.spair_point) and "_sp_phi0" not in dyn:
        raise ValueError(
            "model has SDF pair rows: pass the entry-sampled contact "
            "planes via dyn (fused.sdf_dyn(model, q, qd)) -- the kernel "
            "cannot gather the SDF grid itself"
        )
    dyn_names = tuple(sorted(dyn))
    key = (id(model), id(params), N, xfrc is not None, q_target is not None,
           dyn_names, warm_reset_every)
    if key not in _CACHE:
        _CACHE[key] = _build_call(model, params, N, xfrc is not None,
                                  q_target is not None, use_pallas,
                                  dyn_names, warm_reset_every)
    return _CACHE[key](q, qd, qfrc, xfrc, q_target, dyn)


def _build_call(model, params, N, has_xfrc, has_qt, use_pallas,
                dyn_names=(), warm_reset_every=0):
    s = _extract(model)
    run = _step_math(s, params, has_xfrc, has_qt, warm_reset_every)
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    # env-lane tile is FIXED at 128: Mosaic requires lane-axis blocks be a
    # multiple of 128 (or the full array dim), so a VMEM-pressed model
    # cannot shrink lanes -- models whose residents (Delassus + contact
    # jacobian + Minv) exceed _VMEM_BUDGET are rejected by fused_supported
    # and take the vmap engine instead.
    tile = TILE
    Np = ((N + tile - 1) // tile) * tile
    grid = Np // tile
    nb3 = s.nbody * 3

    nt = 0 if s.tendon_coef is None else s.tendon_coef.shape[0]
    dyn_rows = {
        **{k: s.nv for k in (
            "dof_damping", "dof_stiffness", "dof_friction", "armature",
            "dof_limit_lower", "dof_limit_upper",
        )},
        "body_mass": s.nbody,
        "cpoint_friction": len(model.cpoint_body),
        "cpoint_restitution": len(model.cpoint_body),
        "tendon_stiffness": nt,
        "tendon_damping": nt,
        "gravity": 3,
        "body_ipos": 3 * s.nbody,
        "body_inertia": 9 * s.nbody,
        "cpoint_pos": 3 * len(model.cpoint_body),
        "geom_size": 3 * len(model.geom_type),
        **{k: s.nc for k in TERRAIN_KEYS},
        **{k: s.sp_n for k in SP_KEYS},
    }
    in_rows = [s.nq, s.nv, s.nv]
    if has_xfrc:
        in_rows.append(6 * s.nbody)
    if has_qt:
        in_rows.append(s.nq)
    in_rows += [dyn_rows[k] for k in dyn_names]
    n_in = len(in_rows)

    def run_flat(*args):
        q, qd, qfrc = args[0], args[1], args[2]
        i = 3
        xfrc = args[i] if has_xfrc else None
        i += int(has_xfrc)
        qt = args[i] if has_qt else None
        i += int(has_qt)
        dyn = dict(zip(dyn_names, args[i:i + len(dyn_names)]))
        q2, qd2, bf, bt, doff = run(q, qd, qfrc, xfrc, qt, dyn)
        T = q.shape[-1]
        zs = jnp.zeros((nb3, T))
        return (
            q2, qd2,
            bf if bf is not None else zs,
            bt if bt is not None else zs,
            doff if doff is not None else jnp.zeros((s.nv, T)),
        )

    # Pallas kernels cannot close over array constants (the whole static
    # Model lives in them) -- trace the step math once, hoist every jaxpr
    # constant into an explicit kernel input, then shuttle them in as
    # full-block VMEM operands replicated across the env-tile grid.
    from jax import core as _core

    example = [
        jax.ShapeDtypeStruct((r, tile), jnp.float32) for r in in_rows
    ]
    closed_jaxpr = jax.make_jaxpr(run_flat)(*example)
    consts = closed_jaxpr.consts
    const_ins = []
    for c in consts:
        arr = np.asarray(jax.device_get(c))
        if arr.ndim < 2 or arr.dtype != np.float32:
            # the step math is written so every captured constant is a
            # >=2-D float32 array (Mosaic rejects lane-moving reshapes
            # and non-f32 VMEM operands); anything else is a bug there
            raise NotImplementedError(
                f"fused kernel constant {arr.shape} {arr.dtype} needs a "
                "Mosaic-safe formulation in _substep_fn"
            )
        # keep as numpy: jnp.asarray under an active jit trace returns a
        # tracer, and _CACHE outlives the trace (UnexpectedTracerError)
        const_ins.append(np.ascontiguousarray(arr))

    def kernel(*refs):
        vals = [r[...] for r in refs[: n_in]]
        cvals = [r[...] for r in refs[n_in: n_in + len(const_ins)]]
        qo, qdo, bfo, bto, dfo = refs[n_in + len(const_ins):]
        q2, qd2, bf, bt, doff = _core.eval_jaxpr(
            closed_jaxpr.jaxpr, cvals, *vals
        )
        qo[...] = q2
        qdo[...] = qd2
        bfo[...] = bf
        bto[...] = bt
        dfo[...] = doff

    def call(q, qd, qfrc, xfrc, q_target, dyn=None):
        def prep(a, rows):
            at = a.reshape(N, rows).T  # (rows, N)
            if Np != N:
                at = jnp.pad(at, ((0, 0), (0, Np - N)), mode="edge")
            return at

        ins = [prep(q, s.nq), prep(qd, s.nv), prep(qfrc, s.nv)]
        if has_xfrc:
            # (N, nbody, 6) -> comp-major rows (6*nbody, N) matching kernel
            xf = jnp.transpose(xfrc, (2, 1, 0)).reshape(6 * s.nbody, N)
            if Np != N:
                xf = jnp.pad(xf, ((0, 0), (0, Np - N)), mode="edge")
            ins.append(xf)
        if has_qt:
            ins.append(prep(q_target, s.nq))
        for k in dyn_names:
            a = dyn[k].astype(jnp.float32)
            if k in _DYN_COMP:
                # (N, n, 3[, 3]) -> comp-major (N, 3[*3]*n): row index =
                # comp * n + entity, matching the kernel's _blocks slices
                a = (
                    jnp.transpose(a, (0, 2, 1))
                    if a.ndim == 3
                    else jnp.transpose(a, (0, 2, 3, 1))
                ).reshape(N, -1)
            ins.append(prep(a, dyn_rows[k]))

        out_rows = [s.nq, s.nv, nb3, nb3, s.nv]
        if use_pallas:
            bspec = lambda rows: pl.BlockSpec(
                (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )
            cspec = lambda shp: pl.BlockSpec(
                shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
            )
            outs = pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[bspec(a.shape[0]) for a in ins]
                + [cspec(c.shape) for c in const_ins],
                out_specs=tuple(bspec(r) for r in out_rows),
                out_shape=tuple(
                    jax.ShapeDtypeStruct((r, Np), jnp.float32) for r in out_rows
                ),
                # the default scoped-vmem budget (16M) is conservative;
                # raising it lets ShadowHand-class models (~23M peak with
                # the top-K gather chain) compile -- Mosaic still errors
                # at compile time if the physical core limit is exceeded
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(*ins, *const_ins)
        else:
            i0 = 3 + int(has_xfrc) + int(has_qt)
            q2, qd2, bf, bt, doff = run(
                ins[0], ins[1], ins[2],
                ins[3] if has_xfrc else None,
                ins[3 + int(has_xfrc)] if has_qt else None,
                dict(zip(dyn_names, ins[i0:i0 + len(dyn_names)])),
            )
            zs = jnp.zeros((nb3, Np))
            outs = (
                q2, qd2,
                bf if bf is not None else zs,
                bt if bt is not None else zs,
                doff if doff is not None else jnp.zeros((s.nv, Np)),
            )
        q2, qd2, bf, bt, doff = [o[:, :N] for o in outs]
        # body force/torque comp-major rows -> (N, nbody, 3)
        bf = jnp.transpose(bf.reshape(3, s.nbody, N), (2, 1, 0))
        bt = jnp.transpose(bt.reshape(3, s.nbody, N), (2, 1, 0))
        return FusedOut(
            q=q2.T, qd=qd2.T, body_force=bf, body_torque=bt, dof_force=doff.T
        )

    return call
