"""SDF grids: native C++ voxelization + TPU trilinear queries.

The TPU re-think of the reference's mesh-query kernels (SURVEY.md 2.9,
reference isaacgymenvs/tasks/industreal/industreal_algo_utils.py:511-553
Warp `wp.mesh_query_point`, and PhysX's SDF collision mode documented in
docs/factory.md:101-131): meshes are voxelized ONCE on the host by the
native library (native/sdf/sdf.cpp, built with `make`), and every per-step
query becomes a batched trilinear interpolation -- dense, regular memory
access that maps straight onto TPU vector units instead of BVH pointer
chasing.
"""
from __future__ import annotations

import ctypes
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LIB_PATHS = [
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native", "sdf", "libsdf.so",
    ),
]


def _load_lib():
    # build on demand if the checkout is fresh
    for p in _LIB_PATHS:
        if not os.path.exists(p):
            import subprocess

            try:
                subprocess.run(
                    ["make", "-C", os.path.dirname(p)],
                    check=False, capture_output=True, timeout=120,
                )
            except Exception:
                pass
    for p in _LIB_PATHS:
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.mesh_to_sdf.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.mesh_to_sdf.restype = None
            return lib
    return None


_lib = _load_lib()


class SdfGrid(NamedTuple):
    values: jax.Array  # (nx, ny, nz) signed distance (meters)
    origin: jax.Array  # (3,) world position of voxel (0,0,0) in MESH frame
    spacing: float


def mesh_to_sdf(
    verts: np.ndarray,
    tris: np.ndarray,
    resolution: int = 64,
    padding: float = 0.1,
    bounds=None,
) -> SdfGrid:
    """Voxelize a triangle mesh into a signed distance grid.

    resolution = voxels along the longest AABB axis (the reference URDF
    `<sdf resolution="256"/>` knob); padding = extra border as a fraction
    of the AABB diagonal. bounds=(lo, hi) overrides the AABB+padding box:
    distances/signs are still computed against the FULL mesh, only the
    sampled region shrinks -- the way to afford sub-clearance voxels
    around a tight-fit feature (e.g. a gear shaft) on a large part."""
    verts = np.ascontiguousarray(verts, np.float64)
    tris = np.ascontiguousarray(tris, np.int32)
    if bounds is not None:
        lo = np.asarray(bounds[0], np.float64)
        hi = np.asarray(bounds[1], np.float64)
    else:
        lo = verts.min(0)
        hi = verts.max(0)
        pad = padding * np.linalg.norm(hi - lo)
        lo = lo - pad
        hi = hi + pad
    h = float((hi - lo).max() / (resolution - 1))
    dims = np.maximum((np.ceil((hi - lo) / h)).astype(np.int64) + 1, 4)
    out = np.empty(int(dims[0] * dims[1] * dims[2]), np.float32)
    if _lib is None:
        raise RuntimeError(
            "native/sdf/libsdf.so not built -- run `make -C native/sdf`"
        )
    _lib.mesh_to_sdf(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tris),
        float(lo[0]), float(lo[1]), float(lo[2]), h,
        int(dims[0]), int(dims[1]), int(dims[2]), 2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    values = out.reshape(int(dims[0]), int(dims[1]), int(dims[2]))
    return SdfGrid(
        values=jnp.asarray(values),
        origin=jnp.asarray(lo, jnp.float32),
        spacing=h,
    )


def sdf_query(grid: SdfGrid, points: jax.Array) -> jax.Array:
    """Trilinear signed distance at mesh-frame points (..., 3). Pure jnp;
    batch/vmap freely (the per-step hot query, SURVEY.md 2.9).

    Points outside the voxel grid get the boundary trilinear value plus
    the Euclidean distance to the grid (so far-away queries keep growing
    instead of saturating at the border value)."""
    g = (points - grid.origin) / grid.spacing
    dims = grid.values.shape
    gx = jnp.clip(g[..., 0], 0.0, dims[0] - 1.001)
    gy = jnp.clip(g[..., 1], 0.0, dims[1] - 1.001)
    gz = jnp.clip(g[..., 2], 0.0, dims[2] - 1.001)
    # distance from the query point to its in-grid clamp (0 when inside)
    dout = jnp.sqrt(
        (g[..., 0] - gx) ** 2 + (g[..., 1] - gy) ** 2 + (g[..., 2] - gz) ** 2
    ) * grid.spacing
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    z0 = jnp.floor(gz).astype(jnp.int32)
    fx, fy, fz = gx - x0, gy - y0, gz - z0
    v = grid.values

    def at(dx, dy, dz):
        return v[x0 + dx, y0 + dy, z0 + dz]

    c00 = at(0, 0, 0) * (1 - fx) + at(1, 0, 0) * fx
    c10 = at(0, 1, 0) * (1 - fx) + at(1, 1, 0) * fx
    c01 = at(0, 0, 1) * (1 - fx) + at(1, 0, 1) * fx
    c11 = at(0, 1, 1) * (1 - fx) + at(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz + dout


def sdf_gradient(grid: SdfGrid, points: jax.Array) -> jax.Array:
    """Finite-difference SDF gradient (outward normal direction)."""
    e = grid.spacing
    def d(axis):
        dv = jnp.zeros(points.shape[-1]).at[axis].set(e)
        return (sdf_query(grid, points + dv) - sdf_query(grid, points - dv)) / (2 * e)

    g = jnp.stack([d(0), d(1), d(2)], axis=-1)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)


# ---------------------------------------------------------------------------
# model integration: attach SDF grids + contact points to a finalized Model
# ---------------------------------------------------------------------------


def load_obj(path: str, scale: float = 1.0):
    """Wavefront OBJ -> (verts (V,3) float64, tris (T,3) int32), fan-
    triangulating polygons. Only geometry is read (the reference's
    factory/industreal meshes ship as OBJ, e.g.
    assets/factory/urdf/factory_nut_m16_tight.urdf <mesh filename=...>)."""
    vs, fs = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                vs.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    fs.append([idx[0], idx[k], idx[k + 1]])
    return (
        np.asarray(vs, np.float64) * scale,
        np.asarray(fs, np.int32),
    )


def attach_sdf(model, body: int, grid: SdfGrid):
    """Attach an SDF grid rigidly to `body` (grid coords = body frame).
    Returns (model, sdf_index). The TPU equivalent of the reference URDF
    `<sdf resolution="256"/>` collision element (docs/factory.md:101-131)."""
    idx = len(model.sdf_body)
    return (
        model.replace(
            sdf_body=model.sdf_body + (int(body),),
            sdf_spacing=model.sdf_spacing + (float(grid.spacing),),
            sdf_values=model.sdf_values + (grid.values,),
            sdf_origin=model.sdf_origin + (grid.origin,),
        ),
        idx,
    )


def add_contact_points(model, body: int, pts: np.ndarray,
                       radius: float = 0.0, friction: float = 1.0):
    """Append candidate contact points (body frame) to a finalized Model.
    Returns (model, point_indices). Used to sample mesh vertices as the
    vertex set for vertex-vs-SDF narrowphase (how PhysX SDF collision
    generates contacts between two meshes)."""
    import jax.numpy as jnp

    k = len(pts)
    idx = tuple(range(model.ncp, model.ncp + k))
    return (
        model.replace(
            cpoint_body=model.cpoint_body + (int(body),) * k,
            cpoint_pos=jnp.concatenate(
                [model.cpoint_pos, jnp.asarray(pts, jnp.float32)]
            ),
            cpoint_radius=jnp.concatenate(
                [model.cpoint_radius, jnp.full(k, float(radius))]
            ),
            cpoint_friction=jnp.concatenate(
                [model.cpoint_friction, jnp.full(k, float(friction))]
            ),
        ),
        idx,
    )


def pair_points_with_sdf(model, point_indices, sdf_index: int):
    """Declare candidate points as queries against an SDF grid."""
    return model.replace(
        spair_point=model.spair_point + tuple(int(p) for p in point_indices),
        spair_sdf=model.spair_sdf + (int(sdf_index),) * len(point_indices),
    )
