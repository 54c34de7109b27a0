"""Model: the static description of an articulated rigid-body system.

TPU-native replacement for the reference's asset pipeline (isaacgym
`load_asset` + `get_asset_*` introspection, see SURVEY.md section 2.1). A
Model is a pytree: topology and addressing live in static (hashable)
metadata fields so jit treats them as compile-time constants; physical
parameters (masses, inertias, joint limits, damping, ...) are jnp leaves so
they can be domain-randomized per environment by simply vmapping over a
batched Model.

Joint model: every body is connected to its parent by exactly ONE joint
(FREE / HINGE / SLIDE / FIXED). MJCF bodies carrying several joints are
expanded at parse time into chains of intermediate massless links, so this
invariant always holds and Featherstone-style sweeps stay uniform.

Coordinate layout:
  q  : per-body, FREE -> 7 (pos xyz, quat xyzw), HINGE/SLIDE -> 1, FIXED -> 0
  qd : per-body, FREE -> 6 (linear vel world, angular vel world), else 1
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import numpy as np
from flax import struct

# joint types
FREE = 0
HINGE = 1
SLIDE = 2
FIXED = 3

# geom types
GEOM_SPHERE = 0
GEOM_CAPSULE = 1
GEOM_BOX = 2
GEOM_CYLINDER = 3
GEOM_PLANE = 4
GEOM_MESH = 5

_QDIM = {FREE: 7, HINGE: 1, SLIDE: 1, FIXED: 0}
_VDIM = {FREE: 6, HINGE: 1, SLIDE: 1, FIXED: 0}


def qdim(jnt_type: int) -> int:
    return _QDIM[jnt_type]


def vdim(jnt_type: int) -> int:
    return _VDIM[jnt_type]


@struct.dataclass
class Model:
    """Articulated system description. See module docstring."""

    # ---- static topology (compile-time constants) ----
    nbody: int = struct.field(pytree_node=False)
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    body_parent: Tuple[int, ...] = struct.field(pytree_node=False)  # -1 = world
    jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)  # per body
    q_adr: Tuple[int, ...] = struct.field(pytree_node=False)  # per body, start in q
    v_adr: Tuple[int, ...] = struct.field(pytree_node=False)  # per body, start in qd
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False)  # per body ('' if fixed)
    dof_body: Tuple[int, ...] = struct.field(pytree_node=False)  # per dof -> body index
    actuator_dof: Tuple[int, ...] = struct.field(pytree_node=False)  # per actuator -> dof
    actuator_names: Tuple[str, ...] = struct.field(pytree_node=False)
    # per contact-candidate-point static body index
    cpoint_body: Tuple[int, ...] = struct.field(pytree_node=False)
    # geoms (static layout info; per-geom body assignment)
    geom_body: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_type: Tuple[int, ...] = struct.field(pytree_node=False)
    # ---- parameters (jnp leaves; may gain a leading env batch dim for DR) ----
    body_pos: jax.Array  # (nbody, 3) frame offset in parent frame
    body_quat: jax.Array  # (nbody, 4) xyzw
    body_ipos: jax.Array  # (nbody, 3) CoM in body frame
    body_inertia: jax.Array  # (nbody, 3, 3) about CoM, body frame
    body_mass: jax.Array  # (nbody,)
    jnt_axis: jax.Array  # (nbody, 3) in body frame
    jnt_pos: jax.Array  # (nbody, 3) anchor in body frame
    armature: jax.Array  # (nv,)
    dof_damping: jax.Array  # (nv,)
    dof_stiffness: jax.Array  # (nv,) spring to qpos_spring (0 default)
    dof_limit_lower: jax.Array  # (nv,) -big if unlimited
    dof_limit_upper: jax.Array  # (nv,)
    dof_limited: jax.Array  # (nv,) 1.0 / 0.0
    dof_max_effort: jax.Array  # (nv,) effort clamp (from URDF limits); inf default
    dof_max_velocity: jax.Array  # (nv,)
    gear: jax.Array  # (nu,) actuator gear / motor_effort
    ctrl_range: jax.Array  # (nu, 2)
    # geoms
    geom_pos: jax.Array  # (ngeom, 3) in body frame
    geom_quat: jax.Array  # (ngeom, 4)
    geom_size: jax.Array  # (ngeom, 3)
    geom_friction: jax.Array  # (ngeom,) sliding friction
    # contact candidate points: precomputed per geom, already in BODY frame
    cpoint_pos: jax.Array  # (ncp, 3)
    cpoint_radius: jax.Array  # (ncp,)
    cpoint_friction: jax.Array  # (ncp,)
    # reference pose (default q, e.g. from MJCF qpos0)
    qpos0: jax.Array  # (nq,)

    # ---- optional interaction declarations (defaults last) ----
    # declared geom-pair contacts (sphere-vs-geom narrowphase, the TPU
    # replacement for broadphase between the few interacting actors)
    pair_geom_a: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    pair_geom_b: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # contact-point-vs-geom pairs: cpoint index vs geom index (used for
    # hand-object style interactions where body A's candidate points act
    # as spheres against body B's analytic geom)
    ppair_point: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    ppair_geom: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # include candidate points vs the global ground plane (z=0)
    plane_contacts: bool = struct.field(pytree_node=False, default=True)
    # bilateral point anchors (gymapi attractor equivalent,
    # reference ball_balance.py:305-320): body + local offset + world target
    att_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    att_offset: jax.Array = None  # (natt, 3)
    att_target: jax.Array = None  # (natt, 3)
    # fixed tendons: linear joint couplings with limit springs
    # (reference ShadowHand MJCF shared.xml tendon block; SURVEY.md 2.1)
    tendon_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    tendon_coef: jax.Array = None  # (nt, nv) coefficient rows
    tendon_range: jax.Array = None  # (nt, 2)
    tendon_stiffness: jax.Array = None  # (nt,) limit_stiffness
    tendon_damping: jax.Array = None  # (nt,)
    # Coulomb joint friction torque magnitude (PhysX DOF friction /
    # MJCF frictionloss; distinct from viscous dof_damping). None = 0.
    dof_friction: jax.Array = None  # (nv,)
    # per-candidate-point restitution (PhysX rigid_shape_properties
    # restitution; Newton bounce when impact speed exceeds
    # bounce_threshold_velocity). None = 0.
    cpoint_restitution: jax.Array = None  # (ncp,)
    # SDF collision grids (the TPU answer to PhysX's SDF collision mode,
    # reference docs/factory.md:101-131 and the URDF <sdf resolution/>
    # element): a voxelized signed-distance grid rigidly attached to a
    # body, queried by candidate points of OTHER bodies (mesh-vertex-vs-
    # SDF narrowphase -- the same contact model PhysX SDF mode uses).
    sdf_body: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    sdf_spacing: Tuple[float, ...] = struct.field(pytree_node=False, default=())
    sdf_values: Tuple[jax.Array, ...] = ()  # per grid (nx, ny, nz), body frame
    sdf_origin: Tuple[jax.Array, ...] = ()  # per grid (3,) voxel-0 corner
    # candidate-point-vs-SDF pairs: cpoint index vs sdf grid index
    spair_point: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    spair_sdf: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    @property
    def ngeom(self) -> int:
        return len(self.geom_type)

    @property
    def ncp(self) -> int:
        return len(self.cpoint_body)

    def dof_joint_names(self) -> Tuple[str, ...]:
        """Name of the joint owning each dof (free joint contributes 6)."""
        names = []
        for d in range(self.nv):
            names.append(self.joint_names[self.dof_body[d]])
        return tuple(names)


def _np(x, dtype=np.float32):
    return np.asarray(x, dtype=dtype)


@dataclasses.dataclass
class ModelBuilder:
    """Mutable host-side builder used by the MJCF/URDF parsers."""

    body_parent: list = dataclasses.field(default_factory=list)
    jnt_type: list = dataclasses.field(default_factory=list)
    body_names: list = dataclasses.field(default_factory=list)
    joint_names: list = dataclasses.field(default_factory=list)
    body_pos: list = dataclasses.field(default_factory=list)
    body_quat: list = dataclasses.field(default_factory=list)
    body_ipos: list = dataclasses.field(default_factory=list)
    body_inertia: list = dataclasses.field(default_factory=list)
    body_mass: list = dataclasses.field(default_factory=list)
    jnt_axis: list = dataclasses.field(default_factory=list)
    jnt_pos: list = dataclasses.field(default_factory=list)
    # per-dof
    armature: list = dataclasses.field(default_factory=list)
    dof_damping: list = dataclasses.field(default_factory=list)
    dof_stiffness: list = dataclasses.field(default_factory=list)
    dof_limit_lower: list = dataclasses.field(default_factory=list)
    dof_limit_upper: list = dataclasses.field(default_factory=list)
    dof_limited: list = dataclasses.field(default_factory=list)
    dof_max_effort: list = dataclasses.field(default_factory=list)
    dof_max_velocity: list = dataclasses.field(default_factory=list)
    # actuators
    actuator_joint: list = dataclasses.field(default_factory=list)  # joint name
    actuator_names: list = dataclasses.field(default_factory=list)
    gear: list = dataclasses.field(default_factory=list)
    ctrl_range: list = dataclasses.field(default_factory=list)
    # geoms
    geom_body: list = dataclasses.field(default_factory=list)
    geom_type: list = dataclasses.field(default_factory=list)
    geom_pos: list = dataclasses.field(default_factory=list)
    geom_quat: list = dataclasses.field(default_factory=list)
    geom_size: list = dataclasses.field(default_factory=list)
    geom_friction: list = dataclasses.field(default_factory=list)
    dof_friction_l: list = dataclasses.field(default_factory=list)
    geom_mesh_points: list = dataclasses.field(default_factory=list)  # None or (k,3)
    qpos0_free: dict = dataclasses.field(default_factory=dict)  # body -> (pos, quat)
    qpos0_scalar: dict = dataclasses.field(default_factory=dict)  # body -> float
    # tendons: (name, [(joint_name, coef), ...], (lo, hi))
    tendons: list = dataclasses.field(default_factory=list)

    def add_body(
        self,
        parent: int,
        name: str,
        pos,
        quat,
        jnt_type: int,
        jnt_axis=(0.0, 0.0, 1.0),
        jnt_pos=(0.0, 0.0, 0.0),
        joint_name: str = "",
        mass: float = 0.0,
        ipos=(0.0, 0.0, 0.0),
        inertia=None,
        armature: float = 0.0,
        damping: float = 0.0,
        stiffness: float = 0.0,
        friction_loss: float = 0.0,
        limit=(None, None),
        max_effort: float = np.inf,
        max_velocity: float = np.inf,
    ) -> int:
        i = len(self.body_parent)
        assert parent < i, "bodies must be added in topological order"
        self.body_parent.append(parent)
        self.body_names.append(name)
        self.joint_names.append(joint_name)
        self.body_pos.append(_np(pos))
        self.body_quat.append(_np(quat))
        self.jnt_type.append(jnt_type)
        self.jnt_axis.append(_np(jnt_axis))
        self.jnt_pos.append(_np(jnt_pos))
        self.body_mass.append(float(mass))
        self.body_ipos.append(_np(ipos))
        self.body_inertia.append(
            _np(inertia) if inertia is not None else np.zeros((3, 3), np.float32)
        )
        nvd = vdim(jnt_type)
        lo = -1e10 if limit[0] is None else float(limit[0])
        hi = 1e10 if limit[1] is None else float(limit[1])
        limited = 0.0 if (limit[0] is None and limit[1] is None) else 1.0
        for _ in range(nvd):
            self.armature.append(float(armature))
            self.dof_damping.append(float(damping))
            self.dof_friction_l.append(float(friction_loss))
            self.dof_stiffness.append(float(stiffness))
            # free-joint dofs are never limited
            if jnt_type == FREE:
                self.dof_limit_lower.append(-1e10)
                self.dof_limit_upper.append(1e10)
                self.dof_limited.append(0.0)
            else:
                self.dof_limit_lower.append(lo)
                self.dof_limit_upper.append(hi)
                self.dof_limited.append(limited)
            self.dof_max_effort.append(float(max_effort))
            self.dof_max_velocity.append(float(max_velocity))
        return i

    def merge_body(self, idx: int, mass: float, ipos, inertia) -> None:
        """Fold another rigid mass (com/inertia given in body idx's frame)
        into body idx -- used for fixed-joint collapsing (the
        collapse_fixed_joints asset option, reference anymal.py:172)."""
        m0 = self.body_mass[idx]
        c0 = np.asarray(self.body_ipos[idx], np.float64)
        I0 = np.asarray(self.body_inertia[idx], np.float64)
        m1 = float(mass)
        c1 = np.asarray(ipos, np.float64)
        I1 = np.asarray(inertia, np.float64)
        m = m0 + m1
        c = (m0 * c0 + m1 * c1) / m if m > 0 else c0

        def shift(I, mm, d):
            return I + mm * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

        self.body_mass[idx] = m
        self.body_ipos[idx] = _np(c)
        self.body_inertia[idx] = _np(shift(I0, m0, c0 - c) + shift(I1, m1, c1 - c))

    def add_geom(
        self, body: int, gtype: int, pos, quat, size, friction: float,
        mesh_points=None,
    ):
        self.geom_body.append(body)
        self.geom_type.append(gtype)
        self.geom_pos.append(_np(pos))
        self.geom_quat.append(_np(quat))
        self.geom_size.append(_np(size))
        self.geom_friction.append(float(friction))
        self.geom_mesh_points.append(
            _np(mesh_points) if mesh_points is not None else None
        )

    def add_tendon(self, name: str, joints, rng):
        self.tendons.append((name, list(joints), tuple(rng)))

    def add_actuator(self, joint_name: str, gear: float, ctrl_range, name: str = ""):
        self.actuator_joint.append(joint_name)
        self.gear.append(float(gear))
        self.ctrl_range.append(
            _np(ctrl_range) if ctrl_range is not None else _np([-1e10, 1e10])
        )
        self.actuator_names.append(name or joint_name)

    # -------------------------------------------------------------------
    def finalize(self) -> Model:
        import jax.numpy as jnp

        nbody = len(self.body_parent)
        q_adr, v_adr = [], []
        dof_body = []
        nq = nv = 0
        for i in range(nbody):
            q_adr.append(nq)
            v_adr.append(nv)
            nq += qdim(self.jnt_type[i])
            nvd = vdim(self.jnt_type[i])
            dof_body.extend([i] * nvd)
            nv += nvd

        # default qpos
        qpos0 = np.zeros(nq, np.float32)
        for i in range(nbody):
            if self.jnt_type[i] == FREE:
                pos, quat = self.qpos0_free.get(
                    i, (np.zeros(3, np.float32), np.array([0, 0, 0, 1], np.float32))
                )
                qpos0[q_adr[i] : q_adr[i] + 3] = pos
                qpos0[q_adr[i] + 3 : q_adr[i] + 7] = quat
            elif self.jnt_type[i] in (HINGE, SLIDE):
                qpos0[q_adr[i]] = self.qpos0_scalar.get(i, 0.0)

        # actuator -> dof resolution (joint name -> first dof of that body)
        joint_to_dof = {}
        for d in range(nv):
            jn = self.joint_names[dof_body[d]]
            if jn and jn not in joint_to_dof:
                joint_to_dof[jn] = d
        actuator_dof = tuple(joint_to_dof[j] for j in self.actuator_joint)

        # contact candidate points (built from geoms, folded into body frame)
        cp_body, cp_pos, cp_rad, cp_fric = [], [], [], []
        from ..maths import quat_rotate  # host-side on numpy via jnp ok

        for g in range(len(self.geom_type)):
            gt = self.geom_type[g]
            gpos, gquat = self.geom_pos[g], self.geom_quat[g]
            size = self.geom_size[g]
            fric = self.geom_friction[g]
            body = self.geom_body[g]
            pts_local, rads = [], []
            if gt == GEOM_MESH:
                mp = self.geom_mesh_points[g]
                if mp is not None:
                    pts_local = [np.asarray(p) for p in mp]
                    rads = [0.0] * len(pts_local)
            elif gt == GEOM_SPHERE:
                pts_local = [np.zeros(3)]
                rads = [size[0]]
            elif gt == GEOM_CAPSULE:
                # capsule axis along local z, half-length size[1], radius size[0]
                pts_local = [np.array([0, 0, -size[1]]), np.array([0, 0, size[1]])]
                rads = [size[0], size[0]]
            elif gt == GEOM_BOX:
                for sx in (-1, 1):
                    for sy in (-1, 1):
                        for sz in (-1, 1):
                            pts_local.append(np.array([sx * size[0], sy * size[1], sz * size[2]]))
                            rads.append(0.0)
            elif gt == GEOM_CYLINDER:
                # approximate with 8 rim points per cap
                for sz in (-1, 1):
                    for k in range(4):
                        ang = np.pi / 2 * k
                        pts_local.append(
                            np.array([size[0] * np.cos(ang), size[0] * np.sin(ang), sz * size[1]])
                        )
                        rads.append(0.0)
            for p, r in zip(pts_local, rads):
                p_body = np.asarray(
                    quat_rotate(jnp.asarray(gquat, jnp.float32), jnp.asarray(p, jnp.float32))
                ) + gpos
                cp_body.append(body)
                cp_pos.append(p_body.astype(np.float32))
                cp_rad.append(float(r))
                cp_fric.append(fric)

        if not cp_body:  # keep shapes non-empty for simplicity
            cp_body = [0]
            cp_pos = [np.zeros(3, np.float32)]
            cp_rad = [0.0]
            cp_fric = [1.0]

        # tendons -> coefficient rows over dofs
        nt = len(self.tendons)
        tendon_coef = np.zeros((nt, nv), np.float32)
        tendon_range = np.zeros((nt, 2), np.float32)
        tendon_names = []
        for t, (tname, tjoints, trng) in enumerate(self.tendons):
            tendon_names.append(tname)
            tendon_range[t] = trng
            for jn, coef in tjoints:
                if jn not in joint_to_dof:
                    raise ValueError(f"tendon {tname} references unknown joint {jn}")
                tendon_coef[t, joint_to_dof[jn]] = coef

        f32 = jnp.float32
        return Model(
            nbody=nbody,
            nq=nq,
            nv=nv,
            nu=len(self.actuator_joint),
            body_parent=tuple(self.body_parent),
            jnt_type=tuple(self.jnt_type),
            q_adr=tuple(q_adr),
            v_adr=tuple(v_adr),
            body_names=tuple(self.body_names),
            joint_names=tuple(self.joint_names),
            dof_body=tuple(dof_body),
            actuator_dof=actuator_dof,
            actuator_names=tuple(self.actuator_names),
            cpoint_body=tuple(cp_body),
            geom_body=tuple(self.geom_body),
            geom_type=tuple(self.geom_type),
            body_pos=jnp.asarray(np.stack(self.body_pos), f32),
            body_quat=jnp.asarray(np.stack(self.body_quat), f32),
            body_ipos=jnp.asarray(np.stack(self.body_ipos), f32),
            body_inertia=jnp.asarray(np.stack(self.body_inertia), f32),
            body_mass=jnp.asarray(self.body_mass, f32),
            jnt_axis=jnp.asarray(np.stack(self.jnt_axis), f32),
            jnt_pos=jnp.asarray(np.stack(self.jnt_pos), f32),
            armature=jnp.asarray(self.armature, f32),
            dof_damping=jnp.asarray(self.dof_damping, f32),
            dof_stiffness=jnp.asarray(self.dof_stiffness, f32),
            dof_limit_lower=jnp.asarray(self.dof_limit_lower, f32),
            dof_limit_upper=jnp.asarray(self.dof_limit_upper, f32),
            dof_limited=jnp.asarray(self.dof_limited, f32),
            dof_max_effort=jnp.asarray(self.dof_max_effort, f32),
            dof_max_velocity=jnp.asarray(self.dof_max_velocity, f32),
            gear=jnp.asarray(self.gear, f32) if self.gear else jnp.zeros((0,), f32),
            ctrl_range=(
                jnp.asarray(np.stack(self.ctrl_range), f32)
                if self.ctrl_range
                else jnp.zeros((0, 2), f32)
            ),
            geom_pos=(
                jnp.asarray(np.stack(self.geom_pos), f32)
                if self.geom_pos
                else jnp.zeros((0, 3), f32)
            ),
            geom_quat=(
                jnp.asarray(np.stack(self.geom_quat), f32)
                if self.geom_quat
                else jnp.zeros((0, 4), f32)
            ),
            geom_size=(
                jnp.asarray(np.stack(self.geom_size), f32)
                if self.geom_size
                else jnp.zeros((0, 3), f32)
            ),
            geom_friction=jnp.asarray(self.geom_friction, f32)
            if self.geom_friction
            else jnp.zeros((0,), f32),
            cpoint_pos=jnp.asarray(np.stack(cp_pos), f32),
            cpoint_radius=jnp.asarray(cp_rad, f32),
            cpoint_friction=jnp.asarray(cp_fric, f32),
            qpos0=jnp.asarray(qpos0, f32),
            att_offset=jnp.zeros((0, 3), f32),
            att_target=jnp.zeros((0, 3), f32),
            tendon_names=tuple(tendon_names),
            tendon_coef=jnp.asarray(tendon_coef),
            tendon_range=jnp.asarray(tendon_range),
            tendon_stiffness=jnp.zeros(nt, f32),
            tendon_damping=jnp.zeros(nt, f32),
            dof_friction=jnp.asarray(self.dof_friction_l, f32),
            # cpoint_restitution stays None (= all zero) so the many
            # cpoint-surgery sites (_strip_points, add_contact_points)
            # need not maintain it; consumers treat None as zeros
        )


# ---------------------------------------------------------------------------
# geometric inertia helpers (used by MJCF inertiafromgeom and URDF defaults)
# ---------------------------------------------------------------------------


def sphere_inertia(density: float, r: float):
    m = density * 4.0 / 3.0 * np.pi * r**3
    i = 2.0 / 5.0 * m * r * r
    return m, np.diag([i, i, i]).astype(np.float32)


def capsule_inertia(density: float, r: float, half_len: float):
    """Capsule along local z: cylinder (length 2*half_len) + two hemispheres."""
    h = 2.0 * half_len
    m_cyl = density * np.pi * r * r * h
    m_hs = density * 2.0 / 3.0 * np.pi * r**3  # one hemisphere
    # cylinder about its com
    ixx_cyl = m_cyl * (3 * r * r + h * h) / 12.0
    izz_cyl = m_cyl * r * r / 2.0
    # hemisphere about its own com (com at 3r/8 from flat face)
    izz_hs = 2.0 / 5.0 * m_hs * r * r
    ixx_hs_com = izz_hs - m_hs * (3.0 * r / 8.0) ** 2
    # place hemispheres at +-(half_len + 3r/8) from capsule com
    d = half_len + 3.0 * r / 8.0
    ixx_hs = ixx_hs_com + m_hs * d * d
    m = m_cyl + 2 * m_hs
    ixx = ixx_cyl + 2 * ixx_hs
    izz = izz_cyl + 2 * izz_hs
    return m, np.diag([ixx, ixx, izz]).astype(np.float32)


def box_inertia(density: float, half_sizes):
    sx, sy, sz = half_sizes
    m = density * 8.0 * sx * sy * sz
    ixx = m / 3.0 * (sy * sy + sz * sz)
    iyy = m / 3.0 * (sx * sx + sz * sz)
    izz = m / 3.0 * (sx * sx + sy * sy)
    return m, np.diag([ixx, iyy, izz]).astype(np.float32)


def cylinder_inertia(density: float, r: float, half_len: float):
    h = 2.0 * half_len
    m = density * np.pi * r * r * h
    ixx = m * (3 * r * r + h * h) / 12.0
    izz = m * r * r / 2.0
    return m, np.diag([ixx, ixx, izz]).astype(np.float32)
