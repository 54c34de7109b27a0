"""USD scene/trajectory export (ASCII .usda).

The TPU answer to the reference's USD exporter (`create_usd_exporter` +
`export_usd_sim`, used by Factory's `export_scene`, reference
tasks/factory/factory_base.py:502): dump one env's model geometry plus a
recorded body-pose trajectory as a self-contained USD ASCII stage that
usdview / Omniverse / Blender can open directly.

No USD library is required -- the usda text schema for Xform/Cube/
Sphere/Cylinder/Capsule prims with time-sampled transforms is small and
stable, so the exporter writes it directly.

Usage (mirrors utils/replay.py's record-then-process split):

    rec = FrameRecorder(env, env_idx=0)
    for ...: state, *_ = env.step(state, act); rec.add(state)
    export_usd(env.model, rec.frames_x, rec.frames_quat,
               "runs/exp/scene.usda", dt=env.dt)
"""
from __future__ import annotations

import os
import re
from typing import Sequence

import numpy as np

from ..model.spec import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_MESH,
    GEOM_PLANE,
    GEOM_SPHERE,
)


def _ident(name: str, used: set) -> str:
    """Sanitize to a unique USD prim identifier."""
    s = re.sub(r"[^A-Za-z0-9_]", "_", str(name)) or "prim"
    if s[0].isdigit():
        s = "_" + s
    base, k = s, 1
    while s in used:
        s = f"{base}_{k}"
        k += 1
    used.add(s)
    return s


def _quat_usd(q_xyzw) -> str:
    """xyzw (engine convention, maths.py) -> usda quatf (w, x, y, z)."""
    x, y, z, w = (float(v) for v in q_xyzw)
    return f"({w}, {x}, {y}, {z})"


def _vec3(v) -> str:
    return f"({float(v[0])}, {float(v[1])}, {float(v[2])})"


def _geom_prim(lines, name: str, gtype: int, size, pos, quat, indent: str):
    """Emit one collision geom as a USD geometric prim (static local
    offset from its body). MESH geoms emit a bare Xform marker (vertex
    buffers live in the asset files, not the Model)."""
    schema = {
        GEOM_SPHERE: "Sphere",
        GEOM_CAPSULE: "Capsule",
        GEOM_BOX: "Cube",
        GEOM_CYLINDER: "Cylinder",
        GEOM_PLANE: "Cube",
        GEOM_MESH: "Xform",
    }[gtype]
    lines.append(f'{indent}def {schema} "{name}"')
    lines.append(indent + "{")
    ind = indent + "    "
    ops = ['"xformOp:translate"', '"xformOp:orient"']
    lines.append(f"{ind}double3 xformOp:translate = {_vec3(pos)}")
    lines.append(f"{ind}quatf xformOp:orient = {_quat_usd(quat)}")
    if gtype == GEOM_SPHERE:
        lines.append(f"{ind}double radius = {float(size[0])}")
    elif gtype == GEOM_CAPSULE:
        lines.append(f"{ind}double radius = {float(size[0])}")
        lines.append(f"{ind}double height = {2.0 * float(size[1])}")
        lines.append(f'{ind}uniform token axis = "Z"')
    elif gtype == GEOM_CYLINDER:
        lines.append(f"{ind}double radius = {float(size[0])}")
        lines.append(f"{ind}double height = {2.0 * float(size[1])}")
        lines.append(f'{ind}uniform token axis = "Z"')
    elif gtype == GEOM_BOX:
        # unit cube spans [-1, 1]; scale by the half-extents
        lines.append(f"{ind}double size = 2")
        lines.append(f"{ind}float3 xformOp:scale = {_vec3(size)}")
        ops.append('"xformOp:scale"')
    elif gtype == GEOM_PLANE:
        # ground plane as a large thin slab (USD has no infinite plane)
        lines.append(f"{ind}double size = 2")
        lines.append(f"{ind}float3 xformOp:scale = (50, 50, 0.005)")
        ops.append('"xformOp:scale"')
    lines.append(f"{ind}uniform token[] xformOpOrder = [{', '.join(ops)}]")
    lines.append(indent + "}")


def export_usd(
    model,
    frames_x: Sequence[np.ndarray],
    frames_quat: Sequence[np.ndarray],
    path: str,
    dt: float = 1.0 / 60.0,
) -> str:
    """Write a .usda stage: one Xform per body carrying its collision
    geoms, with time-sampled world translate/orient from the recorded
    trajectory (reference export_usd_sim semantics: the simulated scene
    over time, one env).

    frames_x: T x (nbody, 3) world positions; frames_quat: T x (nbody, 4)
    xyzw quaternions -- exactly FrameRecorder's buffers.
    """
    xs = np.asarray(frames_x, np.float64)  # (T, nbody, 3)
    qs = np.asarray(frames_quat, np.float64)  # (T, nbody, 4)
    if xs.ndim != 3 or xs.shape[0] == 0:
        raise ValueError(
            "export_usd needs a non-empty trajectory of (nbody, 3) frames "
            f"(got array of shape {xs.shape}); record frames with "
            "FrameRecorder.add() before exporting"
        )
    T, nbody = xs.shape[0], xs.shape[1]
    fps = 1.0 / float(dt)
    lines = [
        "#usda 1.0",
        "(",
        '    defaultPrim = "World"',
        '    upAxis = "Z"',
        "    metersPerUnit = 1",
        f"    timeCodesPerSecond = {fps}",
        "    startTimeCode = 0",
        f"    endTimeCode = {max(T - 1, 0)}",
        ")",
        "",
        'def Xform "World"',
        "{",
    ]
    used: set = set()
    geom_body = np.asarray(model.geom_body, np.int64)
    geom_size = np.asarray(model.geom_size)
    geom_pos = np.asarray(model.geom_pos)
    geom_quat = np.asarray(model.geom_quat)
    for b in range(nbody):
        name = _ident(model.body_names[b] if b < len(model.body_names)
                      else f"body{b}", used)
        lines.append(f'    def Xform "{name}"')
        lines.append("    {")
        # time-sampled world pose
        ts_t = ", ".join(
            f"{t}: {_vec3(xs[t, b])}" for t in range(T)
        )
        ts_q = ", ".join(
            f"{t}: {_quat_usd(qs[t, b])}" for t in range(T)
        )
        lines.append(
            "        double3 xformOp:translate.timeSamples = {" + ts_t + "}"
        )
        lines.append(
            "        quatf xformOp:orient.timeSamples = {" + ts_q + "}"
        )
        lines.append(
            '        uniform token[] xformOpOrder = '
            '["xformOp:translate", "xformOp:orient"]'
        )
        gsub: set = set()
        for g in np.nonzero(geom_body == b)[0]:
            _geom_prim(
                lines,
                _ident(f"geom{g}", gsub),
                int(model.geom_type[g]),
                geom_size[g],
                geom_pos[g],
                geom_quat[g],
                "        ",
            )
        lines.append("    }")
    lines.append("}")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def export_replay_usd(npz_path: str, out_path: str, model=None) -> str:
    """Convert a FrameRecorder .npz replay into a .usda stage.

    The npz carries poses + geom sizes; pass the Model for full geom
    shapes/offsets, else geoms are approximated as spheres of the
    recorded per-geom max size (enough for motion review)."""
    data = np.load(npz_path, allow_pickle=True)
    xs, qs = data["x"], data["quat"]
    if model is not None:
        return export_usd(model, xs, qs, out_path, dt=float(data["dt"]))

    class _M:  # minimal model view from the npz schema (replay.py save)
        body_names = [str(n) for n in data["body_names"]]
        geom_body = data["geom_body"]
        # sphere radius = the geom's largest size component, so thin
        # boxes/capsules stay visible in the approximation
        geom_size = np.repeat(
            np.asarray(data["geom_size"]).max(axis=-1, keepdims=True), 3, -1
        )
        geom_pos = np.zeros((len(data["geom_body"]), 3))
        geom_quat = np.tile(
            np.array([0.0, 0.0, 0.0, 1.0]), (len(data["geom_body"]), 1)
        )
        geom_type = [GEOM_SPHERE] * len(data["geom_body"])

    return export_usd(_M, xs, qs, out_path, dt=float(data["dt"]))
