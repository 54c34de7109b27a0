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


def _cube_mesh(half=0.2):
    verts = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        np.float64,
    ) * half
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    return verts, faces


def test_ball_rests_on_sdf_box():
    """SDF-geom narrowphase wired into the contact solver: a ball dropped
    onto a voxelized box settles on its top face (engine/contacts.py
    source 2c -- the TPU equivalent of PhysX SDF collision,
    reference docs/factory.md:101-131)."""
    import jax
    import jax.numpy as jnp

    from isaacgymenvs_tpu.engine import SimParams, SimState, physics_step
    from isaacgymenvs_tpu.model.spec import (
        FIXED, FREE, GEOM_SPHERE, ModelBuilder, sphere_inertia,
    )
    from isaacgymenvs_tpu.sdf.builder import (
        attach_sdf, pair_points_with_sdf,
    )

    b = ModelBuilder()
    mass, inertia = sphere_inertia(1000.0, 0.05)
    ball = b.add_body(
        parent=-1, name="ball", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=mass, inertia=inertia,
    )
    b.qpos0_free[ball] = (
        np.array([0.03, 0.0, 0.5], np.float32),
        np.array([0, 0, 0, 1], np.float32),
    )
    b.add_geom(ball, GEOM_SPHERE, (0, 0, 0), (0, 0, 0, 1), (0.05, 0, 0), 0.8)
    box_body = b.add_body(
        parent=-1, name="box", pos=(0, 0, 0.2), quat=(0, 0, 0, 1),
        jnt_type=FIXED,
    )
    model = b.finalize()

    verts, faces = _cube_mesh(0.2)
    grid = mesh_to_sdf(verts, faces, resolution=48)
    model, g = attach_sdf(model, box_body, grid)
    model = pair_points_with_sdf(model, [0], g)  # ball's center point

    params = SimParams(
        dt=1 / 60, substeps=2, gravity=jnp.array([0.0, 0.0, -9.81])
    )
    state = SimState(q=model.qpos0, qd=jnp.zeros(model.nv))

    @jax.jit
    def rollout(state):
        def body(s, _):
            out = physics_step(model, s, jnp.zeros(model.nv), params)
            return out.state, out.state.q[2]
        return jax.lax.scan(body, state, None, length=150)

    final, zs = rollout(state)
    assert np.all(np.isfinite(np.asarray(final.q)))
    # rests on box top: z = box_top (0.4) + radius (0.05)
    assert abs(float(final.q[2]) - 0.45) < 0.015
    assert abs(float(final.qd[2])) < 0.05
