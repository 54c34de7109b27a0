"""AMP motion library: load poselib SkeletonMotion .npy captures and serve
frame-blended reference states.

TPU-native re-design of the reference's MotionLib + poselib stack
(reference isaacgymenvs/tasks/amp/utils_amp/motion_lib.py:41-153 and
tasks/amp/poselib/skeleton/skeleton3d.py): motions are preprocessed ONCE
host-side into fixed-rate arrays -- root pose, dof angles in OUR hinge-
chain parameterization (intrinsic-xyz euler per 3-dof cluster, matching
the engine's expanded MJCF joints), finite-difference dof velocities, and
FK'd key-body positions -- then `get_motion_state` is a pure jnp gather +
lerp/slerp, trivially jittable inside the env reset (SURVEY.md 2.8).
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths


def _np_quat_mul(a, b):
    x1, y1, z1, w1 = np.moveaxis(a, -1, 0)
    x2, y2, z2, w2 = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def _np_quat_rot(q, v):
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def _quat_to_euler_xyz_intrinsic(q):
    """Decompose q = qx(a) qy(b) qz(c) (intrinsic xyz, matching our
    expanded MJCF hinge chains with axes x, y, z)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # rotation matrix entries
    m00 = 1 - 2 * (y * y + z * z)
    m01 = 2 * (x * y - w * z)
    m02 = 2 * (x * z + w * y)
    m12 = 2 * (y * z - w * x)
    m22 = 1 - 2 * (x * x + y * y)
    # R = Rx Ry Rz: b = asin(m02), a = atan2(-m12, m22), c = atan2(-m01, m00)
    b = np.arcsin(np.clip(m02, -1.0, 1.0))
    a = np.arctan2(-m12, m22)
    c = np.arctan2(-m01, m00)
    return np.stack([a, b, c], axis=-1)


def _axis_angle_of(q, axis_idx: int):
    """Angle of an (assumed) single-axis rotation about x/y/z."""
    w = np.clip(q[..., 3], -1.0, 1.0)
    return 2.0 * np.arctan2(q[..., axis_idx], np.where(w == 0, 1e-8, w)) * np.sign(
        np.ones_like(w)
    )


class MotionLib:
    """Loads one or more SkeletonMotion .npy files.

    dof_layout: list of (skeleton_body_index, ndof) in engine dof order --
    derived from the task's model; 3-dof clusters are intrinsic-xyz euler.
    key_bodies: skeleton body indices whose world positions are served.
    """

    def __init__(
        self,
        motion_files: Sequence[Tuple[str, float]],  # (path, weight)
        dof_layout: Sequence[Tuple[int, int]],
        key_body_ids: Sequence[int],
    ):
        self.dof_layout = list(dof_layout)
        self.num_dofs = sum(n for _, n in dof_layout)
        roots, rots, dofps, dofvs, keyps, rvels, ravels = [], [], [], [], [], [], []
        lengths, weights, fpss = [], [], []
        for path, w in motion_files:
            d = np.load(path, allow_pickle=True).item()
            fps = float(np.asarray(d["fps"]))
            local_rot = np.asarray(d["rotation"]["arr"], np.float64)  # (T,15,4)
            root_trans = np.asarray(d["root_translation"]["arr"], np.float64)
            gvel = np.asarray(d["global_velocity"]["arr"], np.float64)
            gavel = np.asarray(d["global_angular_velocity"]["arr"], np.float64)
            tree = d["skeleton_tree"]
            parents = np.asarray(tree["parent_indices"]["arr"])
            local_t = np.asarray(tree["local_translation"]["arr"], np.float64)
            T, nb = local_rot.shape[:2]

            # FK: global rotations/positions
            grot = np.zeros_like(local_rot)
            gpos = np.zeros((T, nb, 3))
            for b in range(nb):
                p = parents[b]
                if p < 0:
                    grot[:, b] = local_rot[:, b]
                    gpos[:, b] = root_trans
                else:
                    grot[:, b] = _np_quat_mul(grot[:, p], local_rot[:, b])
                    gpos[:, b] = gpos[:, p] + _np_quat_rot(grot[:, p], local_t[b])

            # dof angles in engine parameterization
            dofp = np.zeros((T, self.num_dofs))
            off = 0
            for body, nd in dof_layout:
                q = local_rot[:, body]
                if nd == 3:
                    dofp[:, off : off + 3] = _quat_to_euler_xyz_intrinsic(q)
                else:
                    # single hinge about y (elbows/knees in amp_humanoid)
                    dofp[:, off] = _axis_angle_of(q, 1)
                off += nd
            dofp = np.unwrap(dofp, axis=0)
            dofv = np.gradient(dofp, 1.0 / fps, axis=0)

            roots.append(root_trans)
            rots.append(local_rot[:, 0])
            dofps.append(dofp)
            dofvs.append(dofv)
            keyps.append(gpos[:, list(key_body_ids)])
            rvels.append(gvel[:, 0])
            ravels.append(gavel[:, 0])
            lengths.append(T)
            weights.append(float(w))
            fpss.append(fps)

        self.num_motions = len(lengths)
        self._fps = np.asarray(fpss)
        self._lengths = np.asarray(lengths)
        self._durations = (self._lengths - 1) / self._fps
        w = np.asarray(weights)
        self._weights = jnp.asarray(w / w.sum())
        # concatenate all frames; per-motion start offsets
        self._starts = jnp.asarray(
            np.concatenate([[0], np.cumsum(lengths)[:-1]])
        )
        self.root_pos = jnp.asarray(np.concatenate(roots), jnp.float32)
        self.root_rot = jnp.asarray(np.concatenate(rots), jnp.float32)
        self.dof_pos = jnp.asarray(np.concatenate(dofps), jnp.float32)
        self.dof_vel = jnp.asarray(np.concatenate(dofvs), jnp.float32)
        self.key_pos = jnp.asarray(np.concatenate(keyps), jnp.float32)
        self.root_vel = jnp.asarray(np.concatenate(rvels), jnp.float32)
        self.root_ang_vel = jnp.asarray(np.concatenate(ravels), jnp.float32)
        self._fps_j = jnp.asarray(self._fps, jnp.float32)
        self._dur_j = jnp.asarray(self._durations, jnp.float32)
        self._len_j = jnp.asarray(self._lengths)

    # ---- jnp API (pure, jittable) -------------------------------------
    def sample_motions(self, key, shape=()):
        """Weighted motion ids (reference motion_lib.py:61-66)."""
        return jax.random.choice(
            key, self.num_motions, shape=shape, p=self._weights
        )

    def sample_time(self, key, motion_ids):
        u = jax.random.uniform(key, motion_ids.shape)
        return u * self._dur_j[motion_ids]

    def motion_length(self, motion_ids):
        return self._dur_j[motion_ids]

    def get_motion_state(self, motion_ids, times):
        """Frame-blended state (reference get_motion_state :83-153):
        index pair + lerp of positions/dofs, slerp of rotations."""
        fps = self._fps_j[motion_ids]
        dur = self._dur_j[motion_ids]
        t = jnp.clip(times, 0.0, dur)
        f = t * fps
        f0 = jnp.floor(f).astype(jnp.int32)
        f1 = jnp.minimum(f0 + 1, self._len_j[motion_ids] - 1)
        blend = (f - f0)[..., None]
        i0 = self._starts[motion_ids] + f0
        i1 = self._starts[motion_ids] + f1

        root_pos = (1 - blend) * self.root_pos[i0] + blend * self.root_pos[i1]
        root_rot = maths.quat_slerp(
            self.root_rot[i0], self.root_rot[i1], blend[..., 0]
        )
        dof_pos = (1 - blend) * self.dof_pos[i0] + blend * self.dof_pos[i1]
        dof_vel = (1 - blend) * self.dof_vel[i0] + blend * self.dof_vel[i1]
        root_vel = (1 - blend) * self.root_vel[i0] + blend * self.root_vel[i1]
        root_ang_vel = (
            (1 - blend) * self.root_ang_vel[i0] + blend * self.root_ang_vel[i1]
        )
        key_pos = (
            (1 - blend[..., None]) * self.key_pos[i0]
            + blend[..., None] * self.key_pos[i1]
        )
        return root_pos, root_rot, dof_pos, dof_vel, root_vel, root_ang_vel, key_pos
