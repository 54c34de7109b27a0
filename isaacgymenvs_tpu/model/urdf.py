"""URDF parser -> Model.

Host-side, trace-time. Supports the URDF subset used by the reference asset
tree (cartpole.urdf, anymal_c, franka_description, ...; loaded via
gym.load_asset, e.g. reference isaacgymenvs/tasks/cartpole.py:90-93).

Behavioral notes mirroring the reference engine:
  * `fix_base` mirrors gymapi.AssetOptions.fix_base_link: the root link is
    welded to the world (cartpole.py:91 sets it True).
  * Links with an <inertial> mass but no (or zero) <inertia> tensor get a
    rotational inertia computed from their collision geometry scaled to the
    given mass, matching PhysX's behavior of deriving inertia from shapes.
  * URDF <box size> is FULL extents (MJCF uses half sizes).
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from . import spec
from .spec import (
    FIXED,
    FREE,
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_MESH,
    GEOM_SPHERE,
    HINGE,
    SLIDE,
    Model,
    ModelBuilder,
)


def _load_obj_vertices(path: str, scale) -> np.ndarray:
    """Wavefront OBJ -> vertex array (V, 3) * scale."""
    verts = []
    with open(path, "r", errors="ignore") as f:
        for line in f:
            if line.startswith("v "):
                t = line.split()
                verts.append([float(t[1]), float(t[2]), float(t[3])])
    return np.asarray(verts, np.float64) * scale

_JOINT_MAP = {
    "revolute": HINGE,
    "continuous": HINGE,
    "prismatic": SLIDE,
    "fixed": FIXED,
    "floating": FREE,
}


def _fv(s, n=None):
    v = np.fromstring(s, sep=" ", dtype=np.float64)
    if n is not None and v.size != n:
        raise ValueError(f"expected {n} floats, got {s!r}")
    return v


def _quat_from_rpy(rpy):
    r, p, y = rpy
    cy, sy = np.cos(y / 2), np.sin(y / 2)
    cr, sr = np.cos(r / 2), np.sin(r / 2)
    cp, sp = np.cos(p / 2), np.sin(p / 2)
    return np.array(
        [
            cy * sr * cp - sy * cr * sp,
            cy * cr * sp + sy * sr * cp,
            sy * cr * cp - cy * sr * sp,
            cy * cr * cp + sy * sr * sp,
        ]
    )


def _origin(elem):
    if elem is None:
        return np.zeros(3), np.array([0.0, 0, 0, 1])
    xyz = _fv(elem.get("xyz", "0 0 0"), 3)
    rpy = _fv(elem.get("rpy", "0 0 0"), 3)
    return xyz, _quat_from_rpy(rpy)


def _parse_geometry(geo_elem, mesh_dirs=()):
    """Returns (gtype, size3, mesh_points) or None for unsupported geometry.

    Meshes (OBJ/STL) become GEOM_MESH with AABB half-extent size + a
    farthest-point vertex subsample as contact candidates (mirroring the
    MJCF mesh path)."""
    if geo_elem is None:
        return None
    mesh = geo_elem.find("mesh")
    if mesh is not None:
        fname = mesh.get("filename", "")
        if fname.startswith("package://"):
            # ROS package URI: resolve the package dir against the asset
            # roots (IsaacGym resolves these the same way)
            fname = fname[len("package://"):]
        scale_attr = mesh.get("scale", "1 1 1")
        scale = _fv(scale_attr)
        if scale.size == 1:
            scale = np.repeat(scale, 3)
        verts = None
        for d in mesh_dirs:
            path = os.path.join(d, fname)
            if os.path.exists(path):
                try:
                    if fname.lower().endswith(".obj"):
                        verts = _load_obj_vertices(path, scale)
                    elif fname.lower().endswith(".stl"):
                        from .mjcf import _load_stl

                        verts = _load_stl(path, scale)
                except Exception:
                    verts = None
                break
        if verts is None or len(verts) == 0:
            return None
        from .mjcf import _farthest_points

        lo, hi = verts.min(0), verts.max(0)
        center = (hi + lo) / 2.0
        half = np.maximum((hi - lo) / 2.0, 1e-5)
        pts = _farthest_points(verts, 4) - center
        return GEOM_MESH, half, (center, pts)
    box = geo_elem.find("box")
    if box is not None:
        full = _fv(box.get("size"), 3)
        return GEOM_BOX, full / 2.0, None
    sph = geo_elem.find("sphere")
    if sph is not None:
        r = float(sph.get("radius"))
        return GEOM_SPHERE, np.array([r, 0, 0]), None
    cyl = geo_elem.find("cylinder")
    if cyl is not None:
        r = float(cyl.get("radius"))
        l = float(cyl.get("length"))
        return GEOM_CYLINDER, np.array([r, l / 2.0, 0]), None
    cap = geo_elem.find("capsule")
    if cap is not None:
        r = float(cap.get("radius"))
        l = float(cap.get("length"))
        return GEOM_CAPSULE, np.array([r, l / 2.0, 0]), None
    return None


def _geom_inertia_unit_density(gtype, size):
    if gtype == GEOM_MESH:
        return spec.box_inertia(1.0, size)
    if gtype == GEOM_SPHERE:
        return spec.sphere_inertia(1.0, size[0])
    if gtype == GEOM_CAPSULE:
        return spec.capsule_inertia(1.0, size[0], size[1])
    if gtype == GEOM_BOX:
        return spec.box_inertia(1.0, size)
    if gtype == GEOM_CYLINDER:
        return spec.cylinder_inertia(1.0, size[0], size[1])
    raise ValueError(gtype)


def _np_quat_mul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return np.array([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def _np_quat_rot(q, v):
    xyz, w = q[:3], q[3]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def _np_quat_mat(q):
    from .mjcf import _quat_to_mat_xyzw

    return _quat_to_mat_xyzw(q)


def load_urdf(
    path: str,
    fix_base: bool = False,
    default_friction: float = 1.0,
    collapse_fixed: bool = False,
    default_density: float = 1000.0,
) -> Model:
    root = ET.parse(path).getroot()
    d = os.path.dirname(os.path.abspath(path))
    # mesh path resolution candidates: urdf dir and its parents (IsaacGym
    # resolves relative to the asset root)
    d1 = os.path.dirname(d)
    d2 = os.path.dirname(d1)
    d3 = os.path.dirname(d2)
    mesh_dirs = (d, d1, d2, d3)
    return parse_urdf(
        root,
        fix_base=fix_base,
        default_friction=default_friction,
        collapse_fixed=collapse_fixed,
        mesh_dirs=mesh_dirs,
        default_density=default_density,
    )


def parse_urdf(
    root: ET.Element,
    fix_base: bool = False,
    default_friction: float = 1.0,
    collapse_fixed: bool = False,
    mesh_dirs=(),
    default_density: float = 1000.0,
) -> Model:
    links = {l.get("name"): l for l in root.findall("link")}
    joints = list(root.findall("joint"))

    children_of = {}
    child_links = set()
    for j in joints:
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        children_of.setdefault(parent, []).append(j)
        child_links.add(child)
    roots = [n for n in links if n not in child_links]
    if len(roots) != 1:
        raise ValueError(f"URDF must have exactly one root link, got {roots}")

    b = ModelBuilder()

    def link_props(link_elem):
        """mass, com, inertia(3x3 about com, link frame), geoms list."""
        geoms = []
        for col in link_elem.findall("collision"):
            g = _parse_geometry(col.find("geometry"), mesh_dirs)
            if g is None:
                continue
            gpos, gquat = _origin(col.find("origin"))
            gtype, gsize, meshinfo = g
            mesh_pts = None
            if meshinfo is not None:
                center, mesh_pts = meshinfo
                # shift geom frame to the mesh AABB center
                from .mjcf import _quat_rot_xyzw as _qr

                gpos = gpos + _qr(gquat, center)
            geoms.append((gtype, gpos, gquat, gsize, mesh_pts))
        inertial = link_elem.find("inertial")
        mass, com, inertia = 0.0, np.zeros(3), np.zeros((3, 3))
        if inertial is None and geoms:
            # no <inertial>: derive mass/inertia from collision shapes at
            # the asset density (gymapi.AssetOptions.density; 1000 default,
            # e.g. franka_panda.urdf; anymal loads with 0.001)
            density = default_density
            total = np.zeros((3, 3))
            com = np.zeros(3)
            for gtype, gpos, gquat, gsize, _mp in geoms:
                m_u, _ = _geom_inertia_unit_density(gtype, gsize)
                mass += m_u * density
                com = com + m_u * density * gpos
            if mass > 0:
                com = com / mass
            for gtype, gpos, gquat, gsize, _mp in geoms:
                m_u, i_u = _geom_inertia_unit_density(gtype, gsize)
                from .mjcf import _quat_to_mat_xyzw

                R = _quat_to_mat_xyzw(gquat)
                i_rot = R @ (i_u * density) @ R.T
                d = gpos - com
                total += i_rot + m_u * density * (
                    np.dot(d, d) * np.eye(3) - np.outer(d, d)
                )
            inertia = total
        if inertial is not None:
            mass = float(inertial.find("mass").get("value")) if inertial.find("mass") is not None else 0.0
            dens_el = inertial.find("density")
            if mass == 0.0 and dens_el is not None:
                # Isaac Gym extension: <density value=.../> derives mass
                # from collision volume (e.g. objects/cube_multicolor.urdf)
                density = float(dens_el.get("value", 1000.0))
                for gtype, gpos, gquat, gsize, _mp in geoms:
                    m_u, _ = _geom_inertia_unit_density(gtype, gsize)
                    mass += m_u * density
            com, com_quat = _origin(inertial.find("origin"))
            it = inertial.find("inertia")
            if it is not None:
                ixx = float(it.get("ixx", 0))
                iyy = float(it.get("iyy", 0))
                izz = float(it.get("izz", 0))
                ixy = float(it.get("ixy", 0))
                ixz = float(it.get("ixz", 0))
                iyz = float(it.get("iyz", 0))
                inertia = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
            if np.allclose(inertia, 0.0) and mass > 0 and geoms:
                # derive rotational inertia from collision shapes at given mass
                unit_m, total = 0.0, np.zeros((3, 3))
                for gtype, gpos, gquat, gsize, _mp in geoms:
                    m_u, i_u = _geom_inertia_unit_density(gtype, gsize)
                    unit_m += m_u
                scale = mass / max(unit_m, 1e-12)
                # compute about the link's inertial com
                for gtype, gpos, gquat, gsize, _mp in geoms:
                    m_u, i_u = _geom_inertia_unit_density(gtype, gsize)
                    m_g = m_u * scale
                    from .mjcf import _quat_to_mat_xyzw

                    R = _quat_to_mat_xyzw(gquat)
                    i_rot = R @ (i_u * scale) @ R.T
                    d = gpos - com
                    total += i_rot + m_g * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
                inertia = total
        return mass, com, inertia, geoms

    def add_link(link_name, parent_idx, jnt_elem, t_pos=None, t_quat=None):
        # (t_pos, t_quat): accumulated transform from collapsed fixed-joint
        # ancestors, expressed in the frame of body `parent_idx`
        # (collapse_fixed_joints semantics, reference anymal.py:172)
        t_pos = np.zeros(3) if t_pos is None else t_pos
        t_quat = np.array([0.0, 0, 0, 1]) if t_quat is None else t_quat
        link_elem = links[link_name]
        mass, com, inertia, geoms = link_props(link_elem)

        if (
            collapse_fixed
            and jnt_elem is not None
            and _JOINT_MAP[jnt_elem.get("type")] == FIXED
            and parent_idx >= 0
        ):
            jpos, jquat = _origin(jnt_elem.find("origin"))
            new_pos = t_pos + _np_quat_rot(t_quat, jpos)
            new_quat = _np_quat_mul(t_quat, jquat)
            R = _np_quat_mat(new_quat)
            if mass > 0:
                b.merge_body(
                    parent_idx,
                    mass,
                    new_pos + _np_quat_rot(new_quat, com),
                    R @ inertia @ R.T,
                )
            for gtype, gpos, gquat, gsize, mp in geoms:
                b.add_geom(
                    parent_idx,
                    gtype,
                    new_pos + _np_quat_rot(new_quat, gpos),
                    _np_quat_mul(new_quat, gquat),
                    gsize,
                    default_friction,
                    mesh_points=mp,
                )
            for child_joint in children_of.get(link_name, []):
                add_link(
                    child_joint.find("child").get("link"),
                    parent_idx,
                    child_joint,
                    new_pos,
                    new_quat,
                )
            return

        if jnt_elem is None:
            # root link
            jtype = FIXED if fix_base else FREE
            pos, quat = np.zeros(3), np.array([0.0, 0, 0, 1])
            axis = np.array([0.0, 0, 1])
            jname = f"{link_name}_root"
            rng, damping, max_eff, max_vel = (None, None), 0.0, np.inf, np.inf
            fric = 0.0
        else:
            jtype = _JOINT_MAP[jnt_elem.get("type")]
            pos, quat = _origin(jnt_elem.find("origin"))
            pos = t_pos + _np_quat_rot(t_quat, pos)
            quat = _np_quat_mul(t_quat, quat)
            ax = jnt_elem.find("axis")
            axis = _fv(ax.get("xyz"), 3) if ax is not None else np.array([1.0, 0, 0])
            n = np.linalg.norm(axis)
            axis = axis / n if n > 0 else np.array([1.0, 0, 0])
            jname = jnt_elem.get("name")
            lim = jnt_elem.find("limit")
            rng, max_eff, max_vel = (None, None), np.inf, np.inf
            if lim is not None:
                if jnt_elem.get("type") != "continuous" and lim.get("lower") is not None:
                    rng = (float(lim.get("lower")), float(lim.get("upper")))
                if lim.get("effort") is not None:
                    max_eff = float(lim.get("effort"))
                if lim.get("velocity") is not None:
                    max_vel = float(lim.get("velocity"))
            dyn = jnt_elem.find("dynamics")
            damping = float(dyn.get("damping", 0)) if dyn is not None else 0.0
            # URDF <dynamics friction=...> = Coulomb joint friction
            fric = float(dyn.get("friction", 0)) if dyn is not None else 0.0

        idx = b.add_body(
            parent=parent_idx,
            name=link_name,
            pos=pos,
            quat=quat,
            jnt_type=jtype,
            jnt_axis=axis,
            jnt_pos=np.zeros(3),  # URDF joints anchor at the child frame origin
            joint_name=jname,
            mass=mass,
            ipos=com,
            inertia=inertia,
            damping=damping,
            friction_loss=fric,
            limit=rng,
            max_effort=max_eff,
            max_velocity=max_vel,
        )
        for gtype, gpos, gquat, gsize, mp in geoms:
            b.add_geom(idx, gtype, gpos, gquat, gsize, default_friction, mesh_points=mp)
        for child_joint in children_of.get(link_name, []):
            add_link(child_joint.find("child").get("link"), idx, child_joint)

    add_link(roots[0], -1, None)
    return b.finalize()
