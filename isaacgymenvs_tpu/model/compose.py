"""Model composition: merge several articulated Models into one scene.

The TPU equivalent of multi-actor envs (reference create_actor x72 call
sites, e.g. shadow_hand.py hand+object+goal actors): each actor keeps its
own kinematic tree; the merged Model is a forest with offset q/qd
addressing. Returns the merged model plus per-actor offsets so tasks can
index their sub-states.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from .spec import Model


class ActorRef(NamedTuple):
    body0: int  # first body index of the actor in the merged model
    q0: int  # first q index
    v0: int  # first qd index
    geom0: int  # first geom index
    nbody: int
    nq: int
    nv: int


def compose(models: List[Model], prefixes: List[str] | None = None) -> Tuple[Model, List[ActorRef]]:
    """Concatenate models into one forest; roots stay roots."""
    prefixes = prefixes or ["" for _ in models]
    refs = []
    b_off = q_off = v_off = g_off = cp_off = 0

    cat_static = {
        "body_parent": [],
        "jnt_type": [],
        "q_adr": [],
        "v_adr": [],
        "body_names": [],
        "joint_names": [],
        "dof_body": [],
        "actuator_dof": [],
        "actuator_names": [],
        "cpoint_body": [],
        "geom_body": [],
        "geom_type": [],
        "pair_geom_a": [],
        "pair_geom_b": [],
        "ppair_point": [],
        "ppair_geom": [],
        "att_body": [],
        "tendon_names": [],
        "sdf_body": [],
        "sdf_spacing": [],
        "spair_point": [],
        "spair_sdf": [],
    }
    sdf_values: list = []
    sdf_origin: list = []
    leaves = {}

    def app_leaf(name, arr):
        leaves.setdefault(name, []).append(np.asarray(arr))

    for m, pre in zip(models, prefixes):
        refs.append(
            ActorRef(
                body0=b_off, q0=q_off, v0=v_off, geom0=g_off,
                nbody=m.nbody, nq=m.nq, nv=m.nv,
            )
        )
        cat_static["body_parent"] += [
            p if p == -1 else p + b_off for p in m.body_parent
        ]
        cat_static["jnt_type"] += list(m.jnt_type)
        cat_static["q_adr"] += [a + q_off for a in m.q_adr]
        cat_static["v_adr"] += [a + v_off for a in m.v_adr]
        cat_static["body_names"] += [pre + n for n in m.body_names]
        cat_static["joint_names"] += [pre + n if n else "" for n in m.joint_names]
        cat_static["dof_body"] += [b + b_off for b in m.dof_body]
        cat_static["actuator_dof"] += [d + v_off for d in m.actuator_dof]
        cat_static["actuator_names"] += [pre + n for n in m.actuator_names]
        cat_static["cpoint_body"] += [b + b_off for b in m.cpoint_body]
        cat_static["geom_body"] += [b + b_off for b in m.geom_body]
        cat_static["geom_type"] += list(m.geom_type)
        cat_static["pair_geom_a"] += [g + g_off for g in m.pair_geom_a]
        cat_static["pair_geom_b"] += [g + g_off for g in m.pair_geom_b]
        cat_static["ppair_point"] += [c + cp_off for c in m.ppair_point]
        cat_static["ppair_geom"] += [g + g_off for g in m.ppair_geom]
        cat_static["att_body"] += [b + b_off for b in m.att_body]
        cat_static["tendon_names"] += [pre + n for n in m.tendon_names]
        sdf_off = len(cat_static["sdf_body"])
        cat_static["sdf_body"] += [b + b_off for b in m.sdf_body]
        cat_static["sdf_spacing"] += list(m.sdf_spacing)
        cat_static["spair_point"] += [c + cp_off for c in m.spair_point]
        cat_static["spair_sdf"] += [s + sdf_off for s in m.spair_sdf]
        sdf_values += list(m.sdf_values)
        sdf_origin += list(m.sdf_origin)

        for name in (
            "body_pos", "body_quat", "body_ipos", "body_inertia", "body_mass",
            "jnt_axis", "jnt_pos", "armature", "dof_damping", "dof_stiffness",
            "dof_limit_lower", "dof_limit_upper", "dof_limited",
            "dof_max_effort", "dof_max_velocity", "gear", "ctrl_range",
            "geom_pos", "geom_quat", "geom_size", "geom_friction",
            "cpoint_pos", "cpoint_radius", "cpoint_friction", "qpos0",
            "dof_friction",
            "att_offset", "att_target", "tendon_range", "tendon_stiffness",
            "tendon_damping",
        ):
            app_leaf(name, getattr(m, name))

        b_off += m.nbody
        q_off += m.nq
        v_off += m.nv
        g_off += m.ngeom
        cp_off += m.ncp

    # tendon_coef needs block-diagonal concatenation over the dof axis
    nv_total = v_off
    tcs = []
    off = 0
    for m in models:
        tc = np.asarray(m.tendon_coef)
        if tc.shape[0]:
            wide = np.zeros((tc.shape[0], nv_total), np.float32)
            wide[:, off : off + m.nv] = tc
            tcs.append(wide)
        off += m.nv
    tendon_coef = (
        np.concatenate(tcs) if tcs else np.zeros((0, nv_total), np.float32)
    )

    f32 = jnp.float32
    merged = Model(
        nbody=b_off,
        nq=q_off,
        nv=v_off,
        nu=len(cat_static["actuator_dof"]),
        body_parent=tuple(cat_static["body_parent"]),
        jnt_type=tuple(cat_static["jnt_type"]),
        q_adr=tuple(cat_static["q_adr"]),
        v_adr=tuple(cat_static["v_adr"]),
        body_names=tuple(cat_static["body_names"]),
        joint_names=tuple(cat_static["joint_names"]),
        dof_body=tuple(cat_static["dof_body"]),
        actuator_dof=tuple(cat_static["actuator_dof"]),
        actuator_names=tuple(cat_static["actuator_names"]),
        cpoint_body=tuple(cat_static["cpoint_body"]),
        geom_body=tuple(cat_static["geom_body"]),
        geom_type=tuple(cat_static["geom_type"]),
        pair_geom_a=tuple(cat_static["pair_geom_a"]),
        pair_geom_b=tuple(cat_static["pair_geom_b"]),
        ppair_point=tuple(cat_static["ppair_point"]),
        ppair_geom=tuple(cat_static["ppair_geom"]),
        plane_contacts=all(m.plane_contacts for m in models),
        att_body=tuple(cat_static["att_body"]),
        tendon_names=tuple(cat_static["tendon_names"]),
        tendon_coef=jnp.asarray(tendon_coef),
        sdf_body=tuple(cat_static["sdf_body"]),
        sdf_spacing=tuple(cat_static["sdf_spacing"]),
        sdf_values=tuple(sdf_values),
        sdf_origin=tuple(sdf_origin),
        spair_point=tuple(cat_static["spair_point"]),
        spair_sdf=tuple(cat_static["spair_sdf"]),
        **{
            k: jnp.asarray(np.concatenate(v), f32)
            for k, v in leaves.items()
            if k != "tendon_coef"
        },
    )
    return merged, refs
