"""Replay visualizer: frame recording + host-side rendering.

The TPU answer to the reference's interactive viewer + frame capture
(reference tasks/base/vec_task.py:457-512: `render()` draws the viewer and
optionally writes `frame_<n>.png` files). A headless TPU pod has no
viewer, so the pipeline splits in two:

  1. ON-DEVICE (cheap): `FrameRecorder` snapshots one env's body poses
     (world positions + quaternions from the step's kinematics) per
     control step -- a few hundred floats, no rendering, no host sync
     beyond the copy.
  2. ON-HOST (offline): `render_replay` turns a saved .npz into PNG
     frames with matplotlib 3D wireframes (bodies as points, parent
     links as lines, geoms as size-scaled markers), one image per frame,
     matching the reference's frame_<n>.png naming.

Usage:
    rec = FrameRecorder(env, env_idx=0)
    for ...: state, *_ = env.step(state, act); rec.add(state)
    rec.save("runs/exp/replay.npz")
    # later, on any host:
    render_replay("runs/exp/replay.npz", "runs/exp/frames")
"""
from __future__ import annotations

import os
from typing import List

import numpy as np


class FrameRecorder:
    """Accumulates one env's body poses per call (see module docstring)."""

    def __init__(self, env, env_idx: int = 0):
        self.env = env
        self.env_idx = int(env_idx)
        self.model = env.model
        self.frames_x: List[np.ndarray] = []
        self.frames_quat: List[np.ndarray] = []

    def add(self, state) -> None:
        """Record the current pose of every body (FK on the host)."""
        import jax.numpy as jnp

        from ..engine import dynamics as _dyn

        q = state.sim.q[self.env_idx]
        qd = state.sim.qd[self.env_idx]
        kin = _dyn.forward_kinematics(self.model, q, qd)
        self.frames_x.append(np.asarray(kin.x))
        self.frames_quat.append(np.asarray(kin.quat))

    def save(self, path: str) -> str:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        m = self.model
        np.savez_compressed(
            path,
            x=np.stack(self.frames_x),
            quat=np.stack(self.frames_quat),
            body_parent=np.asarray(m.body_parent),
            body_names=np.asarray(m.body_names),
            geom_body=np.asarray(m.geom_body, np.int64),
            geom_size=np.asarray(m.geom_size),
            dt=float(self.env.dt),
        )
        return path


def render_replay(
    npz_path: str,
    out_dir: str,
    stride: int = 1,
    elev: float = 20.0,
    azim: float = -60.0,
) -> List[str]:
    """Render a recorded replay to frame_<n>.png files (matplotlib 3D).
    Returns the written file paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(npz_path, allow_pickle=True)
    xs = data["x"]  # (T, nbody, 3)
    parent = data["body_parent"]
    geom_body = data["geom_body"]
    geom_size = data["geom_size"]
    os.makedirs(out_dir, exist_ok=True)

    lo = xs.reshape(-1, 3).min(0) - 0.2
    hi = xs.reshape(-1, 3).max(0) + 0.2
    span = max(float((hi - lo).max()), 0.5)
    mid = (lo + hi) / 2

    # marker size per body from its largest geom
    sizes = np.full(xs.shape[1], 10.0)
    for g, b in enumerate(geom_body):
        sizes[b] = max(sizes[b], 2000.0 * float(geom_size[g].max()))

    written = []
    for t in range(0, xs.shape[0], stride):
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
        x = xs[t]
        ax.scatter(x[:, 0], x[:, 1], x[:, 2], s=sizes, c="tab:blue")
        for b, p in enumerate(parent):
            if p >= 0:
                ax.plot(
                    [x[p, 0], x[b, 0]],
                    [x[p, 1], x[b, 1]],
                    [x[p, 2], x[b, 2]],
                    c="gray",
                )
        ax.set_xlim(mid[0] - span / 2, mid[0] + span / 2)
        ax.set_ylim(mid[1] - span / 2, mid[1] + span / 2)
        ax.set_zlim(max(0.0, mid[2] - span / 2), mid[2] + span / 2)
        ax.view_init(elev=elev, azim=azim)
        path = os.path.join(out_dir, f"frame_{t}.png")
        fig.savefig(path, dpi=80)
        plt.close(fig)
        written.append(path)
    return written
