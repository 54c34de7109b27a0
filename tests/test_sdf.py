"""SDF voxelizer tests: golden analytic cases against the native builder."""
import numpy as np
import pytest

from isaacgymenvs_tpu.sdf import mesh_to_sdf, sdf_gradient, sdf_query


def icosphere(r=0.5, sub=3):
    """Unit icosphere mesh (analytic SDF: |p| - r)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int32,
    )
    for _ in range(sub):
        new_faces = []
        verts = list(map(np.array, verts))
        cache = {}

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                cache[key] = len(verts)
                verts.append((verts[i] + verts[j]) / 2.0)
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int32)
        verts = np.asarray(verts)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * r
    return verts, faces


def test_sphere_sdf_matches_analytic():
    verts, faces = icosphere(r=0.5)
    grid = mesh_to_sdf(verts, faces, resolution=48)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.62, 0.62, (200, 3)).astype(np.float32)
    d = np.asarray(sdf_query(grid, pts))
    analytic = np.linalg.norm(pts, axis=1) - 0.5
    # voxel-accurate agreement near the surface
    assert np.abs(d - analytic).max() < 0.035, np.abs(d - analytic).max()
    # sign is exactly right away from the surface
    far = np.abs(analytic) > 0.05
    assert (np.sign(d[far]) == np.sign(analytic[far])).all()


def test_sdf_gradient_points_outward():
    verts, faces = icosphere(r=0.5)
    grid = mesh_to_sdf(verts, faces, resolution=48)
    pts = np.array([[0.4, 0, 0], [0, 0.4, 0], [0, 0, -0.4]], np.float32)
    g = np.asarray(sdf_gradient(grid, pts))
    expected = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    assert (np.sum(g * expected, axis=1) > 0.95).all()


def test_box_sdf_inside_depth():
    verts = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        np.float64,
    ) * 0.5
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    grid = mesh_to_sdf(verts, faces, resolution=40)
    center = np.zeros((1, 3), np.float32)
    assert float(sdf_query(grid, center)[0]) < -0.4  # deep inside
    outside = np.array([[0.65, 0, 0]], np.float32)
    assert abs(float(sdf_query(grid, outside)[0]) - 0.15) < 0.04
