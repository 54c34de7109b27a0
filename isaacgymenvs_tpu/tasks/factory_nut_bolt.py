"""Factory nut-bolt family: shared machinery + NutBoltPlace + NutBoltScrew.

Parity targets:
  * reference isaacgymenvs/tasks/factory/factory_env_nut_bolt.py (actors,
    asset dims from assets/factory/yaml/factory_asset_info_nut_bolt.yaml);
  * factory_task_nut_bolt_place.py (keypoint reward between nut and bolt
    axes :108-120,183-196; obs :146-162; nut-in-gripper reset :238-263;
    cfg/task/FactoryTaskNutBoltPlace.yaml);
  * factory_task_nut_bolt_screw.py (target = fully-screwed nut height
    :87-91; keypoint rewards :289-338; success dist < thread_pitch
    :338-350; failures far/slipped/fallen :352-386; unidirectional z-rot
    OSC :242-288; cfg/task/FactoryTaskNutBoltScrew.yaml);
  * factory_control.py joint_space_id / operational_space_motion.

TPU-native contact design (the PhysX-SDF-collision replacement,
docs/factory.md:101-131): the nut is a free body whose contact set is
mesh-sampled candidate points (bottom/top rim corners for the table,
bore/thread-band vertices for the bolt); the bolt carries a voxelized
signed-distance grid of its threaded mesh (native/sdf voxelizer), so
nut-vs-bolt thread engagement is vertex-vs-SDF narrowphase -- the same
contact model PhysX SDF mode uses. Finger pads carry explicit pad points
queried against a nut SDF grid, so gripping the hex flats transmits
torque geometrically (needed for Screw).

Documented divergences:
  * world z=0 is the table surface (the reference puts the table top at
    0.4 m and the franka base on it; all heights here drop that offset);
  * the bolt is positionally fixed at the env origin via two huge-inertia
    slide dofs (its cfg xy noise is folded into the franka/nut initial
    pose noise) -- the learning problem depends only on relative poses;
  * the scripted close-and-lift / gripper-move reset choreography
    (num_gripper_close_sim_steps) is replaced by initializing the nut
    between closed fingers directly (one-shot state init, no sim steps).
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import controllers, maths
from ..engine import dynamics as _dyn
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..model.compose import compose
from ..model.spec import (
    FREE,
    GEOM_CYLINDER,
    SLIDE,
    ModelBuilder,
)
from ..sdf.builder import (
    add_contact_points,
    attach_sdf,
    load_obj,
    mesh_to_sdf,
    pair_points_with_sdf,
)
from ..utils.assets import asset_path

# assets/factory/yaml/factory_asset_info_nut_bolt.yaml nut_bolt_m16_tight
NUT_WIDTH_MIN = 0.024
NUT_WIDTH_MAX = 0.02771281
NUT_HEIGHT = 0.013
BOLT_WIDTH = 0.016
BOLT_HEAD_HEIGHT = 0.016
BOLT_SHANK_LENGTH = 0.025
THREAD_PITCH = 0.002
BOLT_TOP = BOLT_HEAD_HEIGHT + BOLT_SHANK_LENGTH

# assets/factory/yaml/factory_asset_info_franka_table.yaml
HAND_LENGTH = 0.0584
FINGER_LENGTH = 0.053671
FINGERPAD_LENGTH = 0.017608

DENSITY = 7850.0  # steel (factory_env_nut_bolt nut/bolt density)

_MESH = "factory/mesh/factory_nut_bolt"


@lru_cache(maxsize=None)
def _nut_mesh():
    """Nut mesh re-based so its bottom face is z=0 (the reference mesh is
    modeled threaded onto the bolt, base at z = bolt head height)."""
    v, t = load_obj(
        asset_path(f"{_MESH}/factory_nut_m16_tight_subdiv_3x.obj")
    )
    v = v - np.array([0.0, 0.0, v[:, 2].min()])
    return v, t


@lru_cache(maxsize=None)
def _bolt_mesh():
    return load_obj(asset_path(f"{_MESH}/factory_bolt_m16_tight.obj"))


@lru_cache(maxsize=None)
def bolt_sdf_grid(resolution: int = 192):
    v, t = _bolt_mesh()
    return mesh_to_sdf(v, t, resolution=resolution, padding=0.08)


@lru_cache(maxsize=None)
def nut_sdf_grid(resolution: int = 96):
    v, t = _nut_mesh()
    return mesh_to_sdf(v, t, resolution=resolution, padding=0.12)


def _stratified_pick(pts: np.ndarray, n_z: int, n_ang: int) -> np.ndarray:
    """Pick <= n_z*n_ang points stratified over (z, polar angle) bins."""
    z = pts[:, 2]
    ang = np.arctan2(pts[:, 1], pts[:, 0])
    zi = np.clip(
        ((z - z.min()) / max(float(np.ptp(z)), 1e-9) * n_z).astype(int),
        0, n_z - 1
    )
    ai = np.clip(((ang + np.pi) / (2 * np.pi) * n_ang).astype(int), 0, n_ang - 1)
    out = []
    for b in range(n_z * n_ang):
        sel = np.where(zi * n_ang + ai == b)[0]
        if len(sel):
            out.append(pts[sel[len(sel) // 2]])
    return np.asarray(out, np.float32)


def nut_contact_points():
    """Mesh-sampled nut contact point sets (body frame, base at z=0):
    (rim corners for table contact, thread-band points for the bolt)."""
    v, _ = _nut_mesh()
    r = np.linalg.norm(v[:, :2], axis=1)
    # 6 bottom + 6 top hex corners (max radius per angular bin)
    rims = []
    for zsel in (v[:, 2] < 6e-4, v[:, 2] > NUT_HEIGHT - 6e-4):
        ring = v[zsel & (r > 0.0125)]
        ang = np.arctan2(ring[:, 1], ring[:, 0])
        for b in range(6):
            sel = np.where(
                (ang >= -np.pi + b * np.pi / 3) & (ang < -np.pi + (b + 1) * np.pi / 3)
            )[0]
            if len(sel):
                rr = np.linalg.norm(ring[sel, :2], axis=1)
                rims.append(ring[sel[np.argmax(rr)]])
    rims = np.asarray(rims, np.float32)
    # thread band: bore vertices that can touch the bolt threads
    band = v[(r > 0.0065) & (r < 0.0085)]
    thread = _stratified_pick(band, n_z=6, n_ang=8)
    return rims, thread


def build_nut() -> "Model":
    """Free-body nut: hollow-cylinder inertials, a cylinder geom kept only
    as metadata (its auto contact points are stripped), mesh-sampled
    contact points added by the task wiring."""
    b = ModelBuilder()
    ro, ri, h = NUT_WIDTH_MAX / 2, BOLT_WIDTH / 2, NUT_HEIGHT
    m = np.pi * (ro**2 - ri**2) * h * DENSITY
    izz = 0.5 * m * (ro**2 + ri**2)
    ixx = m / 12.0 * (3 * (ro**2 + ri**2) + h**2)
    body = b.add_body(
        parent=-1, name="nut", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=m, ipos=(0, 0, h / 2),
        inertia=np.diag([ixx, ixx, izz]),
    )
    b.qpos0_free[body] = (
        np.array([0.0, 0.0, 0.0], np.float32),
        np.array([0, 0, 0, 1], np.float32),
    )
    b.add_geom(
        body, GEOM_CYLINDER, (0, 0, h / 2), (0, 0, 0, 1),
        (NUT_WIDTH_MIN / 2, h / 2, 0.0), friction=0.25,
    )
    return b.finalize()


def build_bolt() -> "Model":
    """Bolt as an effectively-immobile actor: two slide dofs (x, y) with
    huge armature/damping pin it wherever the per-env init q places it
    (a FIXED body cannot vary per env; see module docstring)."""
    b = ModelBuilder()
    bx = b.add_body(
        parent=-1, name="bolt_x", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=SLIDE, jnt_axis=(1, 0, 0), joint_name="bolt_slide_x",
        mass=1.0, armature=1e4, damping=1e4,
    )
    b.add_body(
        parent=bx, name="bolt", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=SLIDE, jnt_axis=(0, 1, 0), joint_name="bolt_slide_y",
        mass=np.pi * (BOLT_WIDTH / 2) ** 2 * BOLT_TOP * DENSITY,
        armature=1e4, damping=1e4,
        ipos=(0, 0, BOLT_TOP / 2),
        inertia=np.eye(3) * 1e-4,
    )
    return b.finalize()


def _strip_points(model, bodies):
    """Remove auto-generated candidate points on the given bodies."""
    keep = [c for c in range(model.ncp) if model.cpoint_body[c] not in bodies]
    karr = np.asarray(keep, np.int64)
    remap = {c: i for i, c in enumerate(keep)}
    return model.replace(
        cpoint_body=tuple(model.cpoint_body[c] for c in keep),
        cpoint_pos=model.cpoint_pos[karr],
        cpoint_radius=model.cpoint_radius[karr],
        cpoint_friction=model.cpoint_friction[karr],
        ppair_point=tuple(remap[c] for c in model.ppair_point),
        spair_point=tuple(remap[c] for c in model.spair_point),
    )


# finger pad sample points (both finger body frames: pad face is the y=0
# plane, pad spans z in [finger_length - pad_length, finger_length]).
# Density is a PER-TASK trade against the top-K active-contact cap
# (sim.max_active_contacts 16 on the nut-bolt family):
#  * sparse 2x3 (12/gripper) for tasks that must preserve nut-bolt
#    THREAD rows in the active set (Screw, and IndustReal insertion) —
#    denser pads crowd the thread contacts out of the top-K and the
#    pressed nut sinks through the helix;
#  * 4x5 for Place (holds the nut through free-space transport);
#  * dense 6x7 for Pick's grasp ACQUISITION: pad points are the ONLY
#    finger-vs-nut contact, so with sparse pads the closing fingers
#    sweep PAST the free hex nut whenever a corner falls between points
#    (scripted perfect-servo close+lift: 48% at 2x3, 91% at 6x7).
PAD_POINTS_SPARSE = np.array(
    [
        [sx, 0.0, z]
        for z in FINGER_LENGTH - FINGERPAD_LENGTH * np.array([1.0, 0.5, 0.06])
        for sx in (-0.006, 0.006)
    ],
    np.float32,
)
PAD_POINTS = np.array(
    [
        [sx, 0.0, z]
        for z in FINGER_LENGTH
        - FINGERPAD_LENGTH * np.array([1.0, 0.75, 0.5, 0.25, 0.03])
        for sx in (-0.009, -0.003, 0.003, 0.009)
    ],
    np.float32,
)
PAD_POINTS_DENSE = np.array(
    [
        [sx, 0.0, z]
        for z in FINGER_LENGTH
        - FINGERPAD_LENGTH
        * np.array([1.0, 0.84, 0.68, 0.52, 0.36, 0.2, 0.03])
        for sx in (-0.009, -0.0054, -0.0018, 0.0018, 0.0054, 0.009)
    ],
    np.float32,
)


class NutBoltBase(VecTask):
    """Shared Franka + nut (+ bolt) machinery for the nut-bolt tasks."""

    use_pd_targets = True
    with_bolt = True
    ctrl_mode = "joint_space_id"
    gripper_target = 0.0  # closed (Place/Screw hold the nut)
    # sparse default: keeps thread rows inside the top-K active set
    # (see the PAD_POINTS density note above); Place/Pick override
    pad_points = PAD_POINTS_SPARSE

    def __init__(self, cfg):
        env = cfg["env"]
        rl = cfg.get("rl", {})
        self.pos_action_scale = jnp.asarray(rl.get("pos_action_scale", [0.1] * 3))
        self.rot_action_scale = jnp.asarray(rl.get("rot_action_scale", [0.1] * 3))
        self.num_keypoints = int(rl.get("num_keypoints", 4))
        self.keypoint_scale = float(rl.get("keypoint_scale", 0.5))
        self.keypoint_reward_scale = float(rl.get("keypoint_reward_scale", 1.0))
        self.action_penalty_scale = float(rl.get("action_penalty_scale", 0.0))
        self.success_bonus = float(rl.get("success_bonus", 0.0))
        env.setdefault("episodeLength", int(rl.get("max_episode_length", 200)))
        self.rand_cfg = cfg.get("randomize", {})
        super().__init__(cfg)
        self._setup()

    # ---- model ---------------------------------------------------------
    def build_model(self):
        franka = load_urdf(
            asset_path("urdf/franka_description/robots/franka_panda.urdf"),
            fix_base=True,
        )
        # base mounted at (franka_depth, 0, 0) on the floor facing the
        # table, yaw pi (reference factory_env_nut_bolt.py:145-149 with
        # table_height 0.4 subtracted -- our z=0 is the table surface)
        bp = np.asarray(franka.body_pos).copy()
        bq = np.asarray(franka.body_quat).copy()
        bp[0] = [0.5, 0.0, -0.4]
        bq[0] = [0.0, 0.0, 1.0, 0.0]
        franka = franka.replace(
            body_pos=jnp.asarray(bp), body_quat=jnp.asarray(bq)
        )
        nv = franka.nv
        stiff = np.zeros(nv, np.float32)
        damp = np.zeros(nv, np.float32)
        # gripper PD drive gains (cfg ctrl.all gripper_prop/deriv_gains)
        stiff[nv - 2:] = 100.0
        damp[nv - 2:] = 2.0
        franka = franka.replace(
            dof_stiffness=jnp.asarray(stiff), dof_damping=jnp.asarray(damp)
        )
        nut = build_nut()
        actors = [franka, nut]
        prefixes = ["", "nut:"]
        if self.with_bolt:
            actors.append(build_bolt())
            prefixes.append("bolt:")
        model, refs = compose(actors, prefixes)
        self.franka_ref, self.nut_ref = refs[0], refs[1]
        self.bolt_ref = refs[2] if self.with_bolt else None

        nut_body = self.nut_ref.body0
        lf = model.body_names.index("panda_leftfinger")
        rf = model.body_names.index("panda_rightfinger")
        # strip every auto point except the franka's non-finger ones (the
        # arm never reaches the table in these tasks -> strip all)
        model = _strip_points(
            model, set(range(model.nbody))
        )
        # nut points: rim corners (plane + bolt-head contact), thread band
        rims, thread = nut_contact_points()
        model, rim_idx = add_contact_points(model, nut_body, rims, friction=0.25)
        model, thr_idx = add_contact_points(model, nut_body, thread, friction=0.18)
        # finger pad points (vs nut SDF)
        pads = np.asarray(self.pad_points)
        model, lf_idx = add_contact_points(model, lf, pads, friction=0.9)
        model, rf_idx = add_contact_points(model, rf, pads, friction=0.9)
        # nut SDF for the finger pads
        model, nut_g = attach_sdf(model, nut_body, nut_sdf_grid())
        model = pair_points_with_sdf(model, lf_idx + rf_idx, nut_g)
        if self.with_bolt:
            bolt_body = self.bolt_ref.body0 + 1  # 'bolt' child of 'bolt_x'
            model, bolt_g = attach_sdf(model, bolt_body, bolt_sdf_grid())
            model = pair_points_with_sdf(model, rim_idx + thr_idx, bolt_g)
            self.bolt_body = bolt_body
        return model, self.sim_params_from_cfg()

    def _setup(self):
        m = self.model
        sdofs = self.scalar_dof_indices
        # first 9 scalar dofs are the franka's (arm 7 + fingers 2)
        fr = [d for d in sdofs if self._dof_of_franka(d)]
        self.q_idx = jnp.asarray(
            np.asarray([m.q_adr[m.dof_body[d]] for d in fr])
        )
        self.v_idx = jnp.asarray(np.asarray(fr))
        self.v_idx_np = np.asarray(fr)
        self.effort_limit = jnp.asarray(
            np.asarray(m.dof_max_effort)[np.asarray(fr)][:7]
        )
        self.hand_body = m.body_names.index("panda_hand")
        self.eef_offset = jnp.array([0.0, 0.0, HAND_LENGTH + FINGER_LENGTH])
        self.pad_offset = jnp.array(
            [0.0, 0.0, HAND_LENGTH + FINGER_LENGTH - FINGERPAD_LENGTH / 2]
        )
        self.nq = m.q_adr[self.nut_ref.body0]
        self.nvd = m.v_adr[self.nut_ref.body0]
        if self.with_bolt:
            self.bolt_q = m.q_adr[self.bolt_ref.body0]
        self.kp = jnp.full(7, 40.0)
        self.kd = jnp.full(7, 8.0)
        # operational_space_motion gains (Screw cfg ctrl block). The cfg
        # lists (linear, angular) order; our jacobian/pose-error rows are
        # (angular, linear), so motion axes [0,0,1,0,0,1] -> unchanged
        # (symmetric) and prop gains [1,1,1,1,1,200] -> [1,1,200,1,1,1].
        self.task_axes = jnp.asarray([0.0, 0, 1, 0, 0, 1])
        self.task_kp = jnp.asarray([1.0, 1, 200.0, 1, 1, 1])
        self.task_kd = jnp.ones(6)
        self._anc = jnp.asarray(_dyn.ancestor_matrix(m))
        self._dof_mask = jnp.asarray(_dyn.dof_ancestor_mask(m))
        self._meta = _dyn.kin_meta(m)
        self._dof_body = np.asarray(m.dof_body)
        nut_body = self.nut_ref.body0
        self.franka_mass = jnp.asarray(
            np.where(
                np.arange(m.nbody) < nut_body, np.asarray(m.body_mass), 0.0
            ),
            jnp.float32,
        )
        # unit-length keypoint line CENTERED at 0 (reference factory_base
        # _get_keypoint_offsets :375-379: linspace(0,1)-0.5, then scaled)
        z = jnp.linspace(0.0, 1.0, self.num_keypoints) - 0.5
        self.keypoint_offsets = (
            jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)
            * self.keypoint_scale
        )

    def _dof_of_franka(self, d):
        return self._is_franka_body(self.model.dof_body[d])

    def _is_franka_body(self, b):
        return b < self.nut_ref.body0

    # ---- shared state helpers -----------------------------------------
    def _fingertip(self, kin):
        """Fingertip-midpoint pos/quat/linvel/angvel (reference
        fingertip_midpoint_* tensors, factory_base.py)."""
        x = kin.x[self.hand_body]
        qq = kin.quat[self.hand_body]
        eef = x + maths.quat_rotate(qq, self.eef_offset)
        v = kin.v[self.hand_body]
        linvel = v[3:] + jnp.cross(v[:3], eef)
        return eef, qq, linvel, v[:3]

    def _nut_state(self, q, qd):
        nq, nv = self.nq, self.nvd
        pos = q[nq: nq + 3]
        quat = q[nq + 3: nq + 7]
        com = pos + maths.quat_rotate(quat, jnp.array([0.0, 0, NUT_HEIGHT / 2]))
        angvel = qd[nv + 3: nv + 6]
        # free-joint linear dofs store v - w x x (world-origin convention)
        linvel = qd[nv: nv + 3] + jnp.cross(angvel, com)
        return pos, quat, com, linvel, angvel

    # ---- control -------------------------------------------------------
    def _scripted_overlay(self, action, task):
        """Hook for scripted non-RL control phases (Pick's close-and-lift,
        reference factory_task_nut_bolt_pick.py:146-150): returns the
        effective (action, gripper_dof_target) for this step."""
        return action, self.gripper_target

    def compute_force(self, action, q, qd, task):
        m = self.model
        action, grip_target = self._scripted_overlay(action, task)
        kin = _dyn.forward_kinematics(m, q, qd, self._meta)
        eef, eq, elin, eang = self._fingertip(kin)
        dpos = action[0:3] * self.pos_action_scale
        rot_act = action[3:6]
        if self.ctrl_mode == "operational_space_motion":
            # unidirectional z-rot (Screw cfg rl.unidirectional_rot)
            rot_act = rot_act.at[2].set(-(rot_act[2] + 1.0) * 0.5)
        drot = rot_act * self.rot_action_scale
        err = jnp.concatenate([drot, dpos])
        arm = self.v_idx_np[:7]
        J = controllers.body_jacobian(
            kin, self._anc, self._dof_body, self.hand_body, eef
        )[:, arm]
        M = _dyn.mass_matrix(m, kin, (self._anc, self._dof_mask))
        M77 = M[np.ix_(arm, arm)]
        if self.ctrl_mode == "operational_space_motion":
            body_vel = jnp.concatenate([eang, elin])
            pose_err = err * self.task_axes
            tau = controllers.operational_space_control(
                J, jnp.linalg.inv(M77),
                pose_err, body_vel * self.task_axes, qd[self.v_idx[:7]],
                self.task_kp, self.task_kd,
            )
        else:  # joint_space_id (factory_control.py:74-176, dls IK + PD)
            dq = controllers.get_delta_dof_pos(err, J, method="dls", lam=0.1)
            tau = controllers.joint_space_pd(
                self.kp * dq, qd[self.v_idx[:7]], 1.0, self.kd,
                mass_matrix=M77,
            )
        tau = jnp.clip(tau, -self.effort_limit, self.effort_limit)
        qfrc = jnp.zeros(m.nv).at[self.v_idx[:7]].set(tau)
        # franka gravity compensation (reference disable_gravity on robot)
        com = kin.x + maths.quat_rotate(kin.quat, m.body_ipos)
        f = -self.franka_mass[:, None] * self.sim_params.gravity[None, :]
        xfrc = jnp.concatenate([jnp.cross(com, f), f], axis=-1)
        q_target = jnp.zeros(m.nq).at[self.q_idx[7:]].set(
            jnp.zeros(2) + grip_target
        )
        return qfrc, xfrc, q_target

    # ---- franka init helper -------------------------------------------
    def _franka_init_q(self, rng, arm_init):
        arm = jnp.asarray(arm_init) + 0.0
        grip = jnp.full(2, max(self.gripper_target, 0.0) + NUT_WIDTH_MIN / 2 * 0.0)
        return arm, grip


# yaw offset aligning the nut's hex flats with the finger pads when the
# nut is yawed pi/2 in the world frame (reference place reset :258) --
# validated against the mesh in tests/test_factory_sdf.py
NUT_GRIP_YAW = np.pi / 2


class FactoryTaskNutBoltPick(NutBoltBase):
    """Reference factory_task_nut_bolt_pick.py: a Franka reaches for an
    M16 nut resting on the work surface next to the bolt and grasps it.
    obs 20 (fingertip midpoint pos/quat/linvel/angvel + nut grasp
    pos/quat, compute_observations :158-169) / act 12; keypoint reward
    between gripper and nut-grasp keypoint lines (:186-202 +
    _get_keypoint_offsets); joint_space_id control (dls IK, gains 40/8).

    The nut is the real SDF-voxelized hex mesh and the fingers carry pad
    points queried against it (NutBoltBase) — the PhysX-SDF-collision
    replacement; the bolt stands on the table like the reference scene.

    close_and_lift (:146-150, cfg env.close_and_lift): the reference runs
    25 scripted gripper-close + 25 lift sim steps inside the last RL step,
    then scores _check_lift_success (:379-387). TPU-native: those scripted
    steps are folded INTO the episode tail (episodeLength += close+lift
    steps) with policy actions overridden and reward zeroed — success
    still scores nut height > 3x nut height at the final step. With the
    reference's success_bonus = 0.0 this changes no training signal; the
    success fraction lands in extras['successes'].

    Documented divergence: the reference's scripted pre-episode
    _randomize_gripper_pose (:389, 20 sim steps under the controller) is
    replaced by joint-space noise on the arm's initial dof pos.
    """

    ctrl_mode = "joint_space_id"
    gripper_target = 0.04  # fingers open during the RL phase
    # grasp acquisition: dense pad grid so the closing fingers cannot
    # sweep between contact points past the free-standing hex nut
    pad_points = PAD_POINTS_DENSE

    def __init__(self, cfg):
        rl = cfg.get("rl", {})
        envc = cfg.setdefault("env", {})
        self.close_and_lift = bool(envc.get("close_and_lift", True))
        self.close_steps = int(envc.get("num_gripper_close_sim_steps", 25))
        self.lift_steps = int(envc.get("num_gripper_lift_sim_steps", 25))
        # RL-phase length: rl.max_episode_length (reference knob), with
        # an explicit env.episodeLength override winning when provided
        # (the yaml ships none). The runtime episode appends the
        # scripted close+lift tail; the derived total is NOT written
        # back into cfg (config snapshots must stay reconstructible),
        # so max_episode_length is set after super().__init__ instead.
        env_len = envc.get("episodeLength")
        self.rl_len = int(
            env_len if env_len is not None
            else rl.get("max_episode_length", 100)
        )
        scripted = (
            self.close_steps + self.lift_steps if self.close_and_lift else 0
        )
        self.num_obs = 20
        self.num_acts = 12
        super().__init__(cfg)
        self.max_episode_length = self.rl_len + scripted
        r = self.rand_cfg
        self.arm_init = jnp.asarray(
            r.get(
                "franka_arm_initial_dof_pos",
                [0.3413, -0.8011, -0.0670, -1.8299, 0.0266, 1.0185, 1.0927],
            )
        )
        self.nut_xy_init = jnp.asarray(r.get("nut_pos_xy_initial", [0.0, -0.3]))
        self.nut_xy_noise = jnp.asarray(
            r.get("nut_pos_xy_initial_noise", [0.1, 0.1])
        )
        self.bolt_xy_init = jnp.asarray(r.get("bolt_pos_xy_initial", [0.0, 0.0]))
        self.bolt_xy_noise = jnp.asarray(r.get("bolt_pos_xy_noise", [0.1, 0.1]))
        self.arm_joint_noise = float(r.get("arm_joint_noise", 0.02))
        # grasp frame: fingers-down onto the nut top face (pi about x)
        self.down_quat = jnp.array([1.0, 0.0, 0.0, 0.0])

    def sample_init(self, rng):
        m = self.model
        ka, kn, ky, kb = jax.random.split(rng, 4)
        arm = self.arm_init + self.arm_joint_noise * jax.random.uniform(
            ka, (7,), minval=-1.0, maxval=1.0
        )
        fingers = jnp.full(2, self.gripper_target)
        q = m.qpos0.at[self.q_idx].set(jnp.concatenate([arm, fingers]))
        xy = self.nut_xy_init + self.nut_xy_noise * jax.random.uniform(
            kn, (2,), minval=-1.0, maxval=1.0
        )
        yaw = jax.random.uniform(ky, (), minval=-jnp.pi, maxval=jnp.pi)
        nq = self.nq
        q = q.at[nq : nq + 2].set(xy)
        q = q.at[nq + 2].set(0.0)  # nut base on the work surface
        q = q.at[nq + 3 : nq + 7].set(
            maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1.0]))
        )
        bolt_xy = self.bolt_xy_init + self.bolt_xy_noise * jax.random.uniform(
            kb, (2,), minval=-1.0, maxval=1.0
        )
        q = q.at[self.bolt_q : self.bolt_q + 2].set(bolt_xy)
        return q, jnp.zeros(m.nv), {"t": jnp.zeros((), jnp.int32)}

    # ---- scripted close-and-lift tail ---------------------------------
    def _phase(self, cur):
        """cur = current progress; returns (in_close, in_lift). RL acting
        steps are cur in [1, rl_len-1] (the same count an rl_len-length
        episode has under the progress/done convention), then close_steps
        close and lift_steps lift, done at rl_len+close+lift-1."""
        close_start = self.rl_len
        lift_start = close_start + self.close_steps
        in_close = (cur >= close_start) & (cur < lift_start)
        in_lift = cur >= lift_start
        return in_close, in_lift

    def _scripted_overlay(self, action, task):
        if not self.close_and_lift:
            return action, self.gripper_target
        cur = task["t"] + 1  # task["t"] = progress recorded last step
        in_close, in_lift = self._phase(cur)
        scripted = in_close | in_lift
        a = jnp.where(scripted, jnp.zeros_like(action), action)
        # open-loop lift: +0.3 m z target offset per step (reference
        # _lift_gripper :367-375, lift_distance applied each sim step)
        a = a.at[2].set(
            jnp.where(in_lift, 0.3 / self.pos_action_scale[2], a[2])
        )
        grip = jnp.where(scripted, 0.0, self.gripper_target)
        return a, grip

    # ---- obs / reward ---------------------------------------------------
    def _grasp_pose(self, q):
        nq = self.nq
        pos = q[nq : nq + 3] + jnp.array([0.0, 0.0, NUT_HEIGHT / 2])
        quat = maths.quat_mul(q[nq + 3 : nq + 7], self.down_quat)
        return pos, quat

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        eef, eq, elin, eang = self._fingertip(kin)
        grasp_pos, grasp_quat = self._grasp_pose(q)
        return jnp.concatenate([eef, eq, elin, eang, grasp_pos, grasp_quat])

    def _keypoint_dist(self, q, kin):
        eef, eq, _, _ = self._fingertip(kin)
        grasp_pos, grasp_quat = self._grasp_pose(q)
        kp_gripper = eef[None, :] + maths.quat_rotate(
            jnp.broadcast_to(eq, (self.num_keypoints, 4)),
            self.keypoint_offsets,
        )
        kp_nut = grasp_pos[None, :] + maths.quat_rotate(
            jnp.broadcast_to(grasp_quat, (self.num_keypoints, 4)),
            self.keypoint_offsets,
        )
        return jnp.sum(jnp.linalg.norm(kp_nut - kp_gripper, axis=-1))

    def _lift_success(self, q):
        """_check_lift_success(height_multiple=3.0): nut base above 3x its
        height over the work surface (:379-387)."""
        return (q[self.nq + 2] > 3.0 * NUT_HEIGHT).astype(jnp.float32)

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        dist = self._keypoint_dist(q, kin)
        reward = (
            -dist * self.keypoint_reward_scale
            - jnp.linalg.norm(actions) * self.action_penalty_scale
        )
        if self.close_and_lift:
            in_close, in_lift = self._phase(progress)
            reward = jnp.where(in_close | in_lift, 0.0, reward)
        last = progress >= self.max_episode_length - 1
        reward = reward + jnp.where(
            last, self._lift_success(q) * self.success_bonus, 0.0
        )
        return reward, last, {"t": progress}

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        last = progress >= self.max_episode_length - 1
        return {"successes": jnp.where(last, self._lift_success(q), 0.0)}

    def true_objective(self, q, qd):
        grasp_pos = q[self.nq : self.nq + 3] + jnp.array(
            [0.0, 0.0, NUT_HEIGHT / 2]
        )
        return -jnp.linalg.norm(grasp_pos)


class FactoryTaskNutBoltPlace(NutBoltBase):
    """Reference factory_task_nut_bolt_place.py: the gripper holds the nut
    above the table and must place it onto the tip of the bolt shank.
    obs 27 / act 12; keypoint reward between the nut axis (from the nut
    base) and the bolt axis (from the bolt tip)."""

    ctrl_mode = "joint_space_id"
    # 4x5 grip grid: holds the nut through free-space transport (no
    # thread rows compete for the active set until placement)
    pad_points = PAD_POINTS

    def __init__(self, cfg):
        rl = cfg.get("rl", {})
        cfg.setdefault("env", {})
        self.close_error_thresh = float(rl.get("close_error_thresh", 0.1))
        self.num_obs = 27
        self.num_acts = 12
        super().__init__(cfg)
        r = self.rand_cfg
        self.arm_init = jnp.asarray(
            r.get(
                "franka_arm_initial_dof_pos",
                [0.00871, -0.10368, -0.00794, -1.49139, -0.00083, 1.38774, 0.7861],
            )
        )
        self.nut_noise_pos = jnp.asarray(
            r.get("nut_noise_pos_in_gripper", [0.0, 0.0, 0.01])
        )
        self.nut_noise_rot = float(r.get("nut_noise_rot_in_gripper", 0.0))
        self.bolt_xy_init = jnp.asarray(r.get("bolt_pos_xy_initial", [0.0, 0.0]))
        self.bolt_xy_noise = jnp.asarray(r.get("bolt_pos_xy_noise", [0.1, 0.1]))
        self.arm_joint_noise = float(r.get("arm_joint_noise", 0.06))

    def sample_init(self, rng):
        m = self.model
        ka, kn, kr, kb = jax.random.split(rng, 4)
        # joint-space noise stands in for the reference's scripted
        # gripper-pose randomization (see module docstring)
        arm = self.arm_init + self.arm_joint_noise * jax.random.uniform(
            ka, (7,), minval=-1.0, maxval=1.0
        )
        fingers = jnp.full(2, NUT_WIDTH_MIN / 2 - 1e-4)
        q = m.qpos0.at[self.q_idx].set(jnp.concatenate([arm, fingers]))
        bolt_xy = self.bolt_xy_init + self.bolt_xy_noise * jax.random.uniform(
            kb, (2,), minval=-1.0, maxval=1.0
        )
        q = q.at[self.bolt_q: self.bolt_q + 2].set(bolt_xy)
        # nut between the closed fingers at the fingerpad midpoint
        kin = _dyn.forward_kinematics(m, q, jnp.zeros(m.nv), self._meta)
        hx = kin.x[self.hand_body]
        hq = kin.quat[self.hand_body]
        pad_mid = hx + maths.quat_rotate(hq, self.pad_offset)
        noise = self.nut_noise_pos * jax.random.uniform(
            kn, (3,), minval=-1.0, maxval=1.0
        )
        hand_yaw = maths.get_euler_xyz(hq)[2]
        yaw = (
            hand_yaw + NUT_GRIP_YAW
            + self.nut_noise_rot
            * jax.random.uniform(kr, (), minval=-1.0, maxval=1.0)
        )
        nq = self.nq
        base = pad_mid - jnp.array([0.0, 0.0, NUT_HEIGHT / 2])
        q = q.at[nq: nq + 3].set(base + noise)
        q = q.at[nq + 3: nq + 7].set(
            maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1.0]))
        )
        return q, jnp.zeros(m.nv), ()

    def _keypoints(self, q):
        """World keypoints on the nut axis (from nut base) and bolt axis
        (from bolt tip) (reference :108-120)."""
        nq = self.nq
        nut_pos, nut_quat = q[nq: nq + 3], q[nq + 3: nq + 7]
        off = self.keypoint_offsets  # (K, 3), z in [-0.25, 0.25]
        kp_nut = nut_pos[None] + maths.quat_rotate(
            jnp.broadcast_to(nut_quat, (self.num_keypoints, 4)), off
        )
        bolt_xy = q[self.bolt_q: self.bolt_q + 2]
        bolt_tip = jnp.concatenate([bolt_xy, jnp.array([BOLT_TOP])])
        kp_bolt = bolt_tip[None] + off
        return kp_nut, kp_bolt

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        eef, eq, elin, eang = self._fingertip(kin)
        nut_pos, nut_quat, _, _, _ = self._nut_state(q, qd)
        bolt_xy = q[self.bolt_q: self.bolt_q + 2]
        bolt_pos = jnp.concatenate([bolt_xy, jnp.zeros(1)])
        bolt_quat = jnp.array([0.0, 0, 0, 1.0])
        return jnp.concatenate(
            [eef, eq, elin, eang, nut_pos, nut_quat, bolt_pos, bolt_quat]
        )

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        kp_nut, kp_bolt = self._keypoints(q)
        dist = jnp.sum(jnp.linalg.norm(kp_bolt - kp_nut, axis=-1))
        reward = (
            -dist * self.keypoint_reward_scale
            - jnp.linalg.norm(actions) * self.action_penalty_scale
        )
        last = progress >= self.max_episode_length - 1
        success = (dist < self.close_error_thresh).astype(jnp.float32)
        reward = reward + jnp.where(last, success * self.success_bonus, 0.0)
        return reward, last, task

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        kp_nut, kp_bolt = self._keypoints(q)
        dist = jnp.sum(jnp.linalg.norm(kp_bolt - kp_nut, axis=-1))
        return {"successes": (dist < self.close_error_thresh).astype(jnp.float32)}

    def true_objective(self, q, qd):
        kp_nut, kp_bolt = self._keypoints(q)
        return -jnp.sum(jnp.linalg.norm(kp_bolt - kp_nut, axis=-1))


class FactoryTaskNutBoltScrew(NutBoltBase):
    """Reference factory_task_nut_bolt_screw.py: the nut starts engaged at
    the top of the bolt shank; the gripper, holding its flats, screws it
    down. obs 32 (26 + zero pad) / act 12; operational-space z-motion with
    unidirectional z-rotation; success when the nut COM reaches the fully-
    screwed height within one thread pitch."""

    ctrl_mode = "operational_space_motion"

    def __init__(self, cfg):
        rl = cfg.get("rl", {})
        cfg.setdefault("env", {})
        rl.setdefault("max_episode_length", 1024)
        self.far_error_thresh = float(rl.get("far_error_thresh", 0.1))
        self.num_obs = 32
        self.num_acts = 12
        super().__init__(cfg)
        r = self.rand_cfg
        self.arm_init = jnp.asarray(
            r.get(
                "franka_arm_initial_dof_pos",
                [1.5178e-03, -1.9651e-01, -1.4364e-03, -1.9761, -2.7717e-04,
                 1.7796, 7.8556e-01],
            )
        )
        self.nut_rot_initial = float(r.get("nut_rot_initial", 30.0))
        # nut COM target: fully screwed = head height + half nut height
        self.target_pos = jnp.array(
            [0.0, 0.0, BOLT_HEAD_HEIGHT + NUT_HEIGHT * 0.5]
        )

    def sample_init(self, rng):
        m = self.model
        q = m.qpos0
        # fingers open with the reference's 1.1 buffer (screw reset :190),
        # squeezed shut by the always-closed gripper target
        fingers = jnp.full(2, NUT_WIDTH_MAX / 2 * 1.1)
        q = q.at[self.q_idx].set(jnp.concatenate([self.arm_init, fingers]))
        nq = self.nq
        yaw = jnp.asarray(self.nut_rot_initial * np.pi / 180.0)
        # nut base at the bolt top, engaged at the first thread (reference
        # _reset_object :210-212 sets nut ROOT z = shank length, and the
        # reference nut frame is bolt-base-relative: its mesh base sits
        # head_height above the root, so base = shank + head = bolt top;
        # our rebased mesh makes root = base directly). The -0.5 mm seats
        # it into the thread groove instead of balancing on the crest.
        q = q.at[nq: nq + 3].set(jnp.array([0.0, 0.0, BOLT_TOP - 5e-4]))
        q = q.at[nq + 3: nq + 7].set(
            maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1.0]))
        )
        return q, jnp.zeros(m.nv), ()

    def _keypoint_dists(self, q, qd, kin):
        """nut-to-target + finger-to-nut 4-keypoint axis distances
        (reference :289-338); axis length = hand + finger length."""
        axis_len = HAND_LENGTH + FINGER_LENGTH
        eef, eq, _, _ = self._fingertip(kin)
        _, nut_quat, nut_com, _, _ = self._nut_state(q, qd)
        lin = jnp.linspace(0.0, 1.0, 4)[:, None]

        def seg(p1, p2):
            return p1[None] + (p2 - p1)[None] * lin

        # nut vs target (vertical axes)
        nut_axis2 = nut_com + maths.quat_rotate(
            nut_quat, jnp.array([0.0, 0, axis_len])
        )
        kp_nut = seg(nut_com, nut_axis2)
        kp_targ = seg(
            self.target_pos, self.target_pos + jnp.array([0.0, 0, axis_len])
        )
        nut_kp_dist = jnp.sum(jnp.linalg.norm(kp_targ - kp_nut, axis=-1))
        # finger vs nut (gripper z axis points down through the nut)
        pad_mid = kin.x[self.hand_body] + maths.quat_rotate(
            kin.quat[self.hand_body], self.pad_offset
        )
        f2 = pad_mid + maths.quat_rotate(eq, jnp.array([0.0, 0, -axis_len]))
        kp_f = seg(pad_mid, f2)
        kp_nt = seg(nut_com, nut_axis2)
        fn_kp_dist = jnp.sum(jnp.linalg.norm(kp_nt - kp_f, axis=-1))
        return nut_kp_dist, fn_kp_dist, nut_com, pad_mid

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        eef, eq, elin, eang = self._fingertip(kin)
        _, nut_quat, nut_com, nlin, nang = self._nut_state(q, qd)
        obs = jnp.concatenate(
            [eef, eq, elin, eang, nut_com, nut_quat, nlin, nang]
        )
        return jnp.concatenate([obs, jnp.zeros(self.num_obs - obs.shape[0])])

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        nut_kp, fn_kp, nut_com, pad_mid = self._keypoint_dists(q, qd, kin)
        reward = (
            -(nut_kp + fn_kp) * self.keypoint_reward_scale
            - jnp.linalg.norm(actions) * self.action_penalty_scale
        )
        dist_to_target = jnp.linalg.norm(self.target_pos - nut_com)
        success = dist_to_target < THREAD_PITCH
        reward = reward + success * self.success_bonus
        # failures (reference :352-386)
        expired = progress >= self.max_episode_length - 1
        far = dist_to_target > self.far_error_thresh
        slipped = (
            jnp.linalg.norm(pad_mid - nut_com)
            > FINGERPAD_LENGTH * 0.5 + NUT_HEIGHT * 0.5
        ) & ~success
        fallen = (jnp.linalg.norm(nut_com[:2]) > BOLT_WIDTH * 0.5) & (
            nut_com[2] < BOLT_TOP + NUT_HEIGHT * 0.5
        )
        done = success | expired | far | slipped | fallen
        return reward, done, task

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        _, _, nut_com, _ = self._keypoint_dists(
            q, qd, _dyn.forward_kinematics(self.model, q, qd, self._meta)
        )
        success = jnp.linalg.norm(self.target_pos - nut_com) < THREAD_PITCH
        # helix descent from the reset seat (BOLT_TOP - 0.5 mm): the
        # per-episode progress metric. Full screw (success above) is
        # unreachable in one episode with a fixed-closed gripper — total
        # rotation is capped by the wrist joint's travel (~2 rad ≈ 2 mm
        # descent under an IDEAL scripted press-and-rotate; the
        # reference's 8192-step budget faces the same wrist limit), so
        # parity is keyed on descent, not the full-screw flag.
        descent = (BOLT_TOP - 5e-4) - q[self.nq + 2]
        return {
            "successes": success.astype(jnp.float32),
            "descent": descent,
        }

    def true_objective(self, q, qd):
        nq = self.nq
        nut_com_z = q[nq + 2] + NUT_HEIGHT / 2
        return -jnp.abs(nut_com_z - self.target_pos[2])
