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
    # contact solver: 'apgd' (batched MXU-friendly, default) or 'pgs'
    solver: str = struct.field(pytree_node=False, default="apgd")
    # PGS contact-impulse sweeps (maps to num_position_iterations-class knobs)
    solver_pgs_iterations: int = struct.field(pytree_node=False, default=8)
    # APGD iterations (each = one batched matvec + cone projection)
    solver_apgd_iterations: int = struct.field(pytree_node=False, default=32)
    # cap on simultaneous constraint rows in the Delassus system
    # (0 = no cap); the TPU analogue of max_gpu_contact_pairs
    max_active_contacts: int = struct.field(pytree_node=False, default=0)
    gravity: jax.Array = struct.field(
        default_factory=lambda: jnp.array([0.0, 0.0, -9.81])
    )
    baumgarte_erp: float = 0.2  # penetration push-out rate (fraction per step)
    baumgarte_erp_attractor: float = 0.7  # bilateral anchor error correction
    max_depenetration_velocity: float = 10.0  # cfg physx knob (Ant.yaml:55)
    # impacts slower than this don't bounce (cfg physx
    # bounce_threshold_velocity; restitution is per contact point)
    bounce_threshold_velocity: float = 0.2
    contact_margin: float = 0.0
    limit_stiffness: float = 400.0
    limit_damping: float = 20.0  # made implicit (added to the M diagonal)
    # hard safety clamp on generalized velocities (PhysX
    # maxLinearVelocity/maxAngularVelocity analogue)
    max_dof_velocity: float = 1000.0


@struct.dataclass
class Terrain:
    """Static heightfield the ground plane generalizes to (the TPU
    replacement for add_triangle_mesh terrain, reference
    anymal_terrain.py:196-209): a dense height grid + bilinear lookups --
    regular memory access instead of trimesh BVH queries."""

    height: jax.Array  # (rows, cols) meters
    horizontal_scale: float = 0.1  # meters per cell
    origin: jax.Array = None  # (2,) world xy of grid index (0, 0)

    def _corners(self, xy):
        """Bilinear cell lookup: corner heights + fractional offsets.

        Gathers go through a FLAT 1-D `take` on a linearized index: XLA's
        TPU lowering of 2-D advanced indexing is ~40% slower than four
        1-D takes sharing one computed base index (measured 33 -> 24 ms
        for 4096 envs x 188 scan points on v5e)."""
        g = (xy - self.origin) / self.horizontal_scale
        rows, cols = self.height.shape
        gx = jnp.clip(g[..., 0], 0.0, rows - 1.001)
        gy = jnp.clip(g[..., 1], 0.0, cols - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        flat = self.height.reshape(-1)
        base = x0 * cols + y0
        h00 = jnp.take(flat, base)
        h10 = jnp.take(flat, base + cols)
        h01 = jnp.take(flat, base + 1)
        h11 = jnp.take(flat, base + cols + 1)
        return h00, h10, h01, h11, gx - x0, gy - y0

    def sample(self, xy):
        """Bilinear height at world xy (..., 2)."""
        h00, h10, h01, h11, fx, fy = self._corners(xy)
        return (
            h00 * (1 - fx) * (1 - fy)
            + h10 * fx * (1 - fy)
            + h01 * (1 - fx) * fy
            + h11 * fx * fy
        )

    def sample_grad(self, xy):
        """Height AND surface normal in one lookup (4 gathers total).

        The normal is the exact gradient of the bilinear interpolant --
        the surface contacts actually resolve against -- rather than a
        central-difference estimate (which costs 4 extra bilinear
        samples = 16 more gathers and smooths across cells)."""
        h00, h10, h01, h11, fx, fy = self._corners(xy)
        h = (
            h00 * (1 - fx) * (1 - fy)
            + h10 * fx * (1 - fy)
            + h01 * (1 - fx) * fy
            + h11 * fx * fy
        )
        inv = 1.0 / self.horizontal_scale
        dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) * inv
        dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) * inv
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n

    def normal(self, xy):
        """Surface normal of the interpolated (bilinear) surface."""
        return self.sample_grad(xy)[1]

    # ---- patch sampling: gathers -> dense matmuls ---------------------
    #
    # The per-env query points (height-scan grid, foot contact points)
    # cluster within ~1 m of the robot base, so instead of N pointwise
    # gathers into the full grid (scalar-unit bound on TPU: the 188-pt
    # AnymalTerrain scan cost 24 ms/step at 4096 envs), slice ONE (P, P)
    # patch around the base per env (`dynamic_slice` = contiguous DMA)
    # and evaluate every point against the patch with separable tent
    # weights:  h(p) = wx(p) @ patch @ wy(p),  where wx[i] =
    # max(0, 1 - |gx - i|) is exactly the bilinear hat function. That
    # turns the lookup into two small dense einsums the MXU/VPU eats
    # (~0.2 GFLOP at 4096 envs x 188 pts x P=32) with zero gathers.

    def _patch(self, center_xy, P: int):
        rows, cols = self.height.shape
        g = (center_xy - self.origin) / self.horizontal_scale
        sx = jnp.clip(jnp.round(g[0]).astype(jnp.int32) - P // 2, 0,
                      max(rows - P, 0))
        sy = jnp.clip(jnp.round(g[1]).astype(jnp.int32) - P // 2, 0,
                      max(cols - P, 0))
        patch = jax.lax.dynamic_slice(self.height, (sx, sy), (P, P))
        return patch, sx, sy

    def _patch_weights(self, pts_xy, sx, sy, P: int):
        rows, cols = self.height.shape
        g = (pts_xy - self.origin) / self.horizontal_scale
        gx = jnp.clip(g[..., 0], 0.0, rows - 1.001) - sx
        gy = jnp.clip(g[..., 1], 0.0, cols - 1.001) - sy
        # points outside the patch degrade to its edge value (same
        # clamp-to-border rule as the full-grid path at the grid edge)
        gx = jnp.clip(gx, 0.0, P - 1.001)
        gy = jnp.clip(gy, 0.0, P - 1.001)
        ii = jnp.arange(P, dtype=jnp.float32)
        dx = gx[..., None] - ii
        dy = gy[..., None] - ii
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))  # (N, P) 2 nonzeros/row
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
        # gradient weights via the same floor-cell forward difference as
        # sample_grad (h[x0+1] - h[x0]), exact also at integer coords
        x0 = jnp.floor(gx)[..., None]
        y0 = jnp.floor(gy)[..., None]
        dwx = (ii == x0 + 1).astype(jnp.float32) - (ii == x0).astype(
            jnp.float32
        )
        dwy = (ii == y0 + 1).astype(jnp.float32) - (ii == y0).astype(
            jnp.float32
        )
        return wx, wy, dwx, dwy

    def sample_patch(self, center_xy, pts_xy, P: int = 32):
        """Bilinear heights of (N, 2) world points near center_xy, via
        one (P, P) patch slice + dense tent-weight contraction."""
        patch, sx, sy = self._patch(center_xy, P)
        wx, wy, _, _ = self._patch_weights(pts_xy, sx, sy, P)
        return jnp.einsum("ni,ij,nj->n", wx, patch, wy)

    def sample_grad_patch(self, center_xy, pts_xy, P: int = 32):
        """Heights AND surface normals (patch variant of sample_grad)."""
        patch, sx, sy = self._patch(center_xy, P)
        wx, wy, dwx, dwy = self._patch_weights(pts_xy, sx, sy, P)
        rowx = wx @ patch  # (N, P)
        h = jnp.einsum("nj,nj->n", rowx, wy)
        inv = 1.0 / self.horizontal_scale
        dhdx = jnp.einsum("nj,nj->n", dwx @ patch, wy) * inv
        dhdy = jnp.einsum("nj,nj->n", rowx, dwy) * inv
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n


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


class KinMeta(NamedTuple):
    """Host-precomputed static index sets for the level-batched FK sweep.

    Bodies are grouped by tree depth; each level is processed as one batch
    of branch-free ops (all four joint-type variants computed and selected
    by mask), so the trace is O(depth), not O(nbody) -- the difference
    between minutes and seconds of XLA compile time on 25+-body humanoids,
    and wider VPU ops at runtime.
    """

    levels: tuple  # tuple of (idx, parent, qa7, va6, free, hinge, slide) np arrays
    dof_body_arr: np.ndarray  # (nv,) body of each dof
    dof_row_arr: np.ndarray  # (nv,) row of each dof inside its body's 6-row block
    # position-integration index sets
    sq_q: np.ndarray  # scalar dof q addresses
    sq_v: np.ndarray  # scalar dof v addresses
    free_bodies: tuple  # body indices with FREE joints
    # (nq, nv) static 0/1 matrix mapping dofs to the q rows they linearly
    # integrate into (scalar dofs + free-joint translations). Position
    # integration is then one small matmul instead of a scatter -- TPU
    # scatters lower to serialized dynamic-update loops that measured ~5 ms
    # per substep at 4096 envs; the matmul is ~free on the MXU.
    int_mat: np.ndarray = None


def kin_meta(model: Model) -> KinMeta:
    nb = model.nbody
    depth = np.zeros(nb, np.int64)
    for i in range(nb):
        p = model.body_parent[i]
        depth[i] = 0 if p == -1 else depth[p] + 1
    levels = []
    for d in range(int(depth.max()) + 1):
        idx = np.where(depth == d)[0]
        parent = np.array([max(model.body_parent[i], 0) for i in idx])
        is_root = np.array([model.body_parent[i] == -1 for i in idx])
        qa7 = np.stack(
            [model.q_adr[i] + np.arange(7) for i in idx]
        )  # into q padded by 7
        va6 = np.stack([model.v_adr[i] + np.arange(6) for i in idx])
        jt = np.array([model.jnt_type[i] for i in idx])
        levels.append(
            (
                idx,
                parent,
                is_root,
                qa7,
                va6,
                jt == FREE,
                jt == HINGE,
                jt == SLIDE,
            )
        )
    dof_body_arr = np.asarray(model.dof_body)
    dof_row_arr = np.array(
        [d - model.v_adr[model.dof_body[d]] for d in range(model.nv)]
    )
    sq = scalar_dof_q_adr(model)
    sv = np.where(sq >= 0)[0]
    free_bodies = tuple(i for i in range(nb) if model.jnt_type[i] == FREE)
    int_mat = np.zeros((model.nq, model.nv), np.float32)
    int_mat[sq[sv], sv] = 1.0
    for i in free_bodies:
        qa, va = int(model.q_adr[i]), int(model.v_adr[i])
        int_mat[qa : qa + 3, va : va + 3] = np.eye(3, dtype=np.float32)
    return KinMeta(
        levels=tuple(levels),
        dof_body_arr=dof_body_arr,
        dof_row_arr=dof_row_arr,
        sq_q=sq[sv],
        sq_v=sv,
        free_bodies=free_bodies,
        int_mat=int_mat,
    )


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------


def forward_kinematics(
    model: Model, q: jax.Array, qd: jax.Array, meta: KinMeta | None = None
) -> Kin:
    """Level-batched tree sweep computing frames, joint subspaces,
    velocities. Bodies at equal depth are processed as ONE batch of
    branch-free ops (all joint-type variants computed, mask-selected), so
    the trace is O(tree depth). Pure; call under vmap for the env batch.
    """
    if meta is None:
        meta = kin_meta(model)
    nb = model.nbody
    qpad = jnp.concatenate([q, jnp.zeros(7)])
    qdpad = jnp.concatenate([qd, jnp.zeros(6)])

    X = jnp.zeros((nb, 3))
    Q = jnp.zeros((nb, 4)).at[:, 3].set(1.0)
    V = jnp.zeros((nb, 6))
    Sb = jnp.zeros((nb, 6, 6))  # per-body joint-subspace block (rows = dofs)
    Sdotb = jnp.zeros((nb, 6, 6))
    e3 = jnp.eye(3)

    for idx, parent, is_root, qa7, va6, m_free, m_hinge, m_slide in meta.levels:
        L = len(idx)
        rootm = jnp.asarray(is_root)[:, None]
        xp = jnp.where(rootm, 0.0, X[parent])
        qp = jnp.where(rootm, jnp.array([0.0, 0.0, 0.0, 1.0]), Q[parent])
        vp = jnp.where(rootm, 0.0, V[parent])
        w_p, vo_p = vp[:, :3], vp[:, 3:]

        body_pos = model.body_pos[idx]
        body_quat = model.body_quat[idx]
        jnt_axis = model.jnt_axis[idx]
        jnt_pos = model.jnt_pos[idx]

        # frame after the fixed parent offset, before the joint
        X_x = xp + maths.quat_rotate(qp, body_pos)
        X_q = maths.quat_mul(qp, body_quat)

        qseg = qpad[qa7]  # (L, 7)
        vseg = qdpad[va6]  # (L, 6)

        # ---- FREE variant ------------------------------------------------
        xi_f = qseg[:, 0:3]
        qi_f = maths.quat_unit(qseg[:, 3:7])
        vel_lin = vseg[:, 0:3]  # world velocity of body origin point
        omega = vseg[:, 3:6]
        vi_f = jnp.concatenate(
            [omega, vel_lin - jnp.cross(omega, xi_f)], axis=-1
        )  # v_o = pdot - w x p
        # S rows 0-2: translations (0, e_k); rows 3-5: rotations (e_k, p x e_k)
        zeros_L33 = jnp.zeros((L, 3, 3))
        e3L = jnp.broadcast_to(e3, (L, 3, 3))
        cross_x_e = jnp.cross(xi_f[:, None, :], e3L)  # (L, 3, 3)
        S_free = jnp.concatenate(
            [
                jnp.concatenate([zeros_L33, e3L], axis=-1),  # rows 0-2
                jnp.concatenate([e3L, cross_x_e], axis=-1),  # rows 3-5
            ],
            axis=1,
        )  # (L, 6, 6)
        cross_v_e = jnp.cross(vel_lin[:, None, :], e3L)
        Sdot_free = jnp.concatenate(
            [
                jnp.zeros((L, 3, 6)),
                jnp.concatenate([zeros_L33, cross_v_e], axis=-1),
            ],
            axis=1,
        )

        # ---- HINGE / SLIDE variants (share the world axis) ---------------
        scalar_q = qseg[:, 0]
        scalar_qd = vseg[:, 0]
        ax_w = maths.quat_rotate(X_q, jnt_axis)
        jq = maths.quat_from_angle_axis(scalar_q, jnt_axis)
        qi_h = maths.quat_mul(X_q, jq)
        anchor = X_x + maths.quat_rotate(X_q, jnt_pos)
        xi_h = anchor - maths.quat_rotate(qi_h, jnt_pos)
        S_h = jnp.concatenate([ax_w, jnp.cross(anchor, ax_w)], axis=-1)
        ax_dot = jnp.cross(w_p, ax_w)
        v_anchor = vo_p + jnp.cross(w_p, anchor)
        Sdot_h = jnp.concatenate(
            [ax_dot, jnp.cross(v_anchor, ax_w) + jnp.cross(anchor, ax_dot)],
            axis=-1,
        )
        vi_h = vp + S_h * scalar_qd[:, None]

        xi_s = X_x + ax_w * scalar_q[:, None]
        S_s = jnp.concatenate([jnp.zeros((L, 3)), ax_w], axis=-1)
        Sdot_s = jnp.concatenate(
            [jnp.zeros((L, 3)), jnp.cross(w_p, ax_w)], axis=-1
        )
        vi_s = vp + S_s * scalar_qd[:, None]

        # ---- mask-select ------------------------------------------------
        mf = jnp.asarray(m_free)[:, None]
        mh = jnp.asarray(m_hinge)[:, None]
        ms = jnp.asarray(m_slide)[:, None]
        xi = jnp.where(mf, xi_f, jnp.where(mh, xi_h, jnp.where(ms, xi_s, X_x)))
        qi = jnp.where(mf, qi_f, jnp.where(mh, qi_h, X_q))
        vi = jnp.where(mf, vi_f, jnp.where(mh, vi_h, jnp.where(ms, vi_s, vp)))

        scalar_row = jnp.zeros((L, 6, 6))
        S_scalar = scalar_row.at[:, 0, :].set(
            jnp.where(mh, S_h, S_s)
        )
        Sdot_scalar = scalar_row.at[:, 0, :].set(
            jnp.where(mh, Sdot_h, Sdot_s)
        )
        mf3 = mf[:, :, None]
        Sb_i = jnp.where(mf3, S_free, S_scalar)
        Sdotb_i = jnp.where(mf3, Sdot_free, Sdot_scalar)

        X = X.at[idx].set(xi)
        Q = Q.at[idx].set(qi)
        V = V.at[idx].set(vi)
        Sb = Sb.at[idx].set(Sb_i)
        Sdotb = Sdotb.at[idx].set(Sdotb_i)

    # assemble (nv, 6) joint subspace from the per-body blocks
    S = Sb[meta.dof_body_arr, meta.dof_row_arr]
    Sdot = Sdotb[meta.dof_body_arr, meta.dof_row_arr]

    R = maths.quat_to_matrix(Q)
    com = X + jnp.einsum("bij,bj->bi", R, model.body_ipos)
    inertia_w = jnp.einsum("bij,bjk,blk->bil", R, model.body_inertia, R)
    return Kin(x=X, quat=Q, com=com, inertia_w=inertia_w, S=S, Sdot=Sdot, v=V)


# ---------------------------------------------------------------------------
# dynamics
# ---------------------------------------------------------------------------


def spd_inverse(A: jax.Array) -> jax.Array:
    """Inverse of a small SPD matrix via trace-time-unrolled Cholesky.

    XLA's batched LAPACK-style cho_factor/cho_solve lowers to sequential
    loops that run ~9x slower on TPU than this unrolled outer-product
    Cholesky + forward substitution (measured: 7.2ms vs 0.8ms for
    (4096, 14, 14) fp32 on v5e). n is trace-time static and small
    (nv <= ~40), so the unrolled graph stays compact."""
    n = A.shape[0]
    S = A
    cols = []
    for j in range(n):
        d = jax.lax.rsqrt(jnp.maximum(S[j, j], 1e-12))
        col = S[:, j] * d * (np.arange(n) >= j)
        cols.append(col)
        S = S - jnp.outer(col, col)
    L = jnp.stack(cols, axis=1)
    # L^{-1} by unrolled forward substitution on the identity
    rows = []
    for i in range(n):
        e = jnp.zeros(n).at[i].set(1.0)
        if i:
            prev = jnp.stack(rows)  # (i, n)
            e = e - L[i, :i] @ prev
        rows.append(e / L[i, i])
    Linv = jnp.stack(rows)
    return Linv.T @ Linv


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


def passive_force(
    model: Model,
    q: jax.Array,
    qd: jax.Array,
    params: SimParams,
    sq_adr,
    q_spring: jax.Array | None = None,
):
    """Joint springs / limit penalties as (tau, D) where D is the diagonal
    velocity coefficient handled IMPLICITLY (added as h*D to M), making
    joint + limit damping unconditionally stable.

    Mirrors PhysX DOF properties (stiffness/damping/limits) the reference
    configures via set_actor_dof_properties (e.g. cartpole.py:112-116).
    `q_spring` overrides the spring setpoint per q entry: with per-dof
    stiffness/damping set this IS the PhysX position drive
    (DOF_MODE_POS, set_dof_position_target_tensor semantics) evaluated
    every substep with implicit damping.
    """
    setpoint = model.qpos0 if q_spring is None else q_spring
    q_scalar = jnp.where(sq_adr >= 0, q[jnp.maximum(sq_adr, 0)], 0.0)
    q0_scalar = jnp.where(sq_adr >= 0, setpoint[jnp.maximum(sq_adr, 0)], 0.0)
    tau = -model.dof_stiffness * (q_scalar - q0_scalar)
    over = jnp.maximum(q_scalar - model.dof_limit_upper, 0.0)
    under = jnp.maximum(model.dof_limit_lower - q_scalar, 0.0)
    violating = (over > 0) | (under > 0)
    tau = tau + model.dof_limited * (-params.limit_stiffness * (over - under))
    D = model.dof_damping + model.dof_limited * jnp.where(
        violating, params.limit_damping, 0.0
    )
    if model.dof_friction is not None:
        # Coulomb joint friction (PhysX DOF friction / MJCF frictionloss)
        # as regularized viscous damping D_f = mu/(|qd|+eps), so the
        # torque saturates at -mu*sign(qd); folding it into the IMPLICIT
        # damping diagonal keeps the stiff near-zero-velocity slope
        # unconditionally stable (an explicit tanh term oscillates)
        D = D + model.dof_friction / (jnp.abs(qd) + 2e-3)
    # stiffness coefficient returned for IMPLICIT spring integration
    # (h^2 K added to the system matrix): arbitrarily stiff drives stay
    # stable regardless of the driven inertia
    K = model.dof_stiffness + model.dof_limited * jnp.where(
        violating, params.limit_stiffness, 0.0
    )

    # fixed tendons: limit springs on linear joint couplings
    # t = coef . q; out-of-range violation resisted with limit_stiffness,
    # tendon velocity damped (reference shadow_hand.py:255-266 sets
    # limit_stiffness/damping on the T_*J1c coupling tendons)
    if model.tendon_coef is not None and model.tendon_coef.shape[0]:
        t_val = model.tendon_coef @ q_scalar  # (nt,)
        t_vel = model.tendon_coef @ qd
        viol = jnp.maximum(t_val - model.tendon_range[:, 1], 0.0) + jnp.minimum(
            t_val - model.tendon_range[:, 0], 0.0
        )
        f_t = -model.tendon_stiffness * viol - model.tendon_damping * t_vel
        tau = tau + model.tendon_coef.T @ f_t
    return tau, D, K


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
    q_spring: jax.Array | None = None,
):
    """qdd = (M + h D)^{-1} (tau + tau_passive - D qd - C).

    h > 0 enables implicit joint/limit damping (semi-implicit Euler in qd).
    Also returns minv_mul: rhs -> (M + h D)^{-1} rhs for the contact solver.
    """
    if kin is None:
        kin = forward_kinematics(model, q, qd)
    M = mass_matrix(model, kin, masks)
    C = bias_force(model, kin, qd, params.gravity, f_ext, masks)
    tau_p, D, K = passive_force(model, q, qd, params, sq_adr, q_spring)
    Mh = M + jnp.diag(h * D + h * h * K)
    # explicit inverse via unrolled Cholesky (see spd_inverse): every
    # downstream apply is then a plain batched matmul on the MXU
    Minv = spd_inverse(Mh)
    qdd = Minv @ (tau + tau_p - D * qd - C)

    def minv_mul(rhs):
        return Minv @ rhs

    return qdd, minv_mul, kin


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


def integrate_positions(
    model: Model,
    q: jax.Array,
    qd_new: jax.Array,
    dt,
    meta: KinMeta | None = None,
) -> jax.Array:
    """Position update of semi-implicit Euler (velocities already updated by
    the dynamics + contact-impulse solve); quaternion exponential for the
    free-joint rotation. All linear rows (scalar dofs + free translations)
    update via one static matmul (meta.int_mat) -- no scatters."""
    if meta is None:
        meta = kin_meta(model)
    q_new = q + dt * (jnp.asarray(meta.int_mat) @ qd_new)
    for i in meta.free_bodies:
        qa, va = model.q_adr[i], model.v_adr[i]
        quat = maths.quat_integrate(
            maths.quat_unit(q[qa + 3 : qa + 7]), qd_new[va + 3 : va + 6], dt
        )
        q_new = q_new.at[qa + 3 : qa + 7].set(quat)
    return q_new
