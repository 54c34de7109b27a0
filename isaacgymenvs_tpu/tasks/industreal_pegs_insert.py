"""IndustRealTaskPegsInsert: contact-rich peg-in-hole insertion with the
SAPU / SDF-reward / SBC algorithm layer.

Parity targets:
  * reference isaacgymenvs/tasks/industreal/industreal_task_pegs_insert.py
    (obs :282-351, reward :359-477, resets :513-710, grasp pose :762-790);
  * industreal_env_pegs.py (plug/socket actors; asset dims from
    assets/industreal/yaml/industreal_asset_info_pegs.yaml round_peg_8mm);
  * industreal_algo_utils.py:98-483 via tasks/industreal_algo.py;
  * cfg/task/IndustRealTaskPegsInsert.yaml + IndustRealBase.yaml.

TPU-native design: the socket (tray insert) carries a voxel SDF grid; plug
mesh sample points provide BOTH the contact narrowphase (vertex-vs-SDF,
engine/contacts.py source 2c) and the SAPU/SDF-reward queries (batched
trilinear gathers, no Warp BVH). Finger pads query a plug SDF so the grip
transmits force geometrically. The reference's scripted move-to-grasp +
close choreography (num_gripper_move/close_sim_steps) is replaced by a
fixed-iteration DLS IK solve inside sample_init -- one-shot state init.

Documented divergences:
  * world z=0 is the table top; the franka base sits at the origin facing
    +x (reference mounts it on a 1.04 m table; obs are in the robot base
    frame, which here coincides with the world frame);
  * one subassembly (round_peg_8mm) per run instead of per-env asset
    mixing (a static single-program model; selectable via cfg);
  * socket pos observation noise is drawn per EPISODE (a fixed perception
    bias) instead of per step -- the reference redraws it every refresh.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import controllers, maths
from ..engine import dynamics as _dyn
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..model.compose import compose
from ..model.spec import FREE, GEOM_CYLINDER, SLIDE, HINGE, ModelBuilder
from ..sdf.builder import (
    add_contact_points,
    attach_sdf,
    load_obj,
    mesh_to_sdf,
    pair_points_with_sdf,
)
from ..utils.assets import asset_path
from . import industreal_algo as algo
from .factory_nut_bolt import (
    FINGER_LENGTH,
    FINGERPAD_LENGTH,
    HAND_LENGTH,
    PAD_POINTS_SPARSE,
    _strip_points,
    _stratified_pick,
)

# assets/industreal/yaml/industreal_asset_info_pegs.yaml round_peg_hole_8mm
PLUG_DIAMETER = 0.007986
PLUG_LENGTH = 0.050
PLUG_DENSITY = 8000.0
PLUG_GRASP_OFFSET = 0.04
PLUG_BASE_Z = 0.003  # peg mesh bottom in the shared OBJ frame
SOCKET_HEIGHT = 0.028  # tray insert height
SOCKET_DENSITY = 8000.0

_MESH = "industreal/mesh/industreal_pegs"
PLUG_OBJ = f"{_MESH}/industreal_round_peg_8mm.obj"
SOCKET_OBJ = f"{_MESH}/industreal_tray_insert_round_peg_8mm.obj"


@lru_cache(maxsize=None)
def _plug_mesh():
    return load_obj(asset_path(PLUG_OBJ))


@lru_cache(maxsize=None)
def _socket_mesh():
    return load_obj(asset_path(SOCKET_OBJ))


@lru_cache(maxsize=None)
def socket_sdf_grid(resolution: int = 192):
    """Tray-insert SDF (the URDF's `<sdf resolution="256"/>` equivalent;
    192 on the long axis gives ~0.28 mm voxels vs the 0.5 mm peg-hole
    clearance, with trilinear sub-voxel accuracy on the smooth wall)."""
    v, t = _socket_mesh()
    return mesh_to_sdf(v, t, resolution=resolution, padding=0.08)


@lru_cache(maxsize=None)
def plug_sdf_grid(resolution: int = 128):
    v, t = _plug_mesh()
    return mesh_to_sdf(v, t, resolution=resolution, padding=0.15)


@lru_cache(maxsize=None)
def plug_sample_points(n_z: int = 16, n_ang: int = 16):
    """Stratified plug-mesh vertex sample (SAPU + SDF-reward queries,
    reference sample_mesh_points_even 1000-point sampling)."""
    v, _ = _plug_mesh()
    return _stratified_pick(v.astype(np.float32), n_z=n_z, n_ang=n_ang)


@lru_cache(maxsize=None)
def plug_contact_points():
    """Contact vertex set: dense rings near the tip (hole engagement +
    chamfer riding) plus sparser shaft rings."""
    v, _ = _plug_mesh()
    tip = v[v[:, 2] < PLUG_BASE_Z + 0.006]
    shaft = v[v[:, 2] >= PLUG_BASE_Z + 0.006]
    pts = np.concatenate([
        _stratified_pick(tip.astype(np.float32), n_z=3, n_ang=12),
        _stratified_pick(shaft.astype(np.float32), n_z=5, n_ang=8),
    ])
    return pts


def build_plug():
    b = ModelBuilder()
    r, h = PLUG_DIAMETER / 2, PLUG_LENGTH
    m = np.pi * r * r * h * PLUG_DENSITY
    izz = 0.5 * m * r * r
    ixx = m / 12.0 * (3 * r * r + h * h)
    body = b.add_body(
        parent=-1, name="plug", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=m, ipos=(0, 0, PLUG_BASE_Z + h / 2),
        inertia=np.diag([ixx, ixx, izz]),
    )
    b.qpos0_free[body] = (
        np.array([0.5, 0.0, SOCKET_HEIGHT], np.float32),
        np.array([0, 0, 0, 1], np.float32),
    )
    b.add_geom(
        body, GEOM_CYLINDER, (0, 0, PLUG_BASE_Z + h / 2), (0, 0, 0, 1),
        (r, h / 2, 0.0), friction=1.0,
    )
    return b.finalize()


def build_socket():
    """Socket as an effectively-immobile actor: x/y/z slides + yaw hinge
    pinned by huge armature/damping so per-env init q places it
    (reference randomizes socket xy, z in [0, 0.05], and yaw)."""
    b = ModelBuilder()
    parent = -1
    names = ["socket_x", "socket_y", "socket_z"]
    axes = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    for name, ax in zip(names, axes):
        parent = b.add_body(
            parent=parent, name=name, pos=(0, 0, 0), quat=(0, 0, 0, 1),
            jnt_type=SLIDE, jnt_axis=ax, joint_name=name + "_slide",
            mass=1.0, armature=1e4, damping=1e4,
        )
    ro = 0.0283
    m = np.pi * ro * ro * SOCKET_HEIGHT * SOCKET_DENSITY
    b.add_body(
        parent=parent, name="socket", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=HINGE, jnt_axis=(0, 0, 1), joint_name="socket_yaw",
        mass=m, armature=1e4, damping=1e4,
        ipos=(0, 0, SOCKET_HEIGHT / 2), inertia=np.eye(3) * 1e-3,
    )
    return b.finalize()


class IndustRealTaskPegsInsert(VecTask):
    """Peg insertion with SAPU-scaled SDF reward, engagement bonus, and a
    sampling-based curriculum over the initial insertion depth."""

    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg.get("env", {})
        rl = cfg.get("rl", {})
        r = cfg.get("randomize", {})
        self.num_obs = int(env.get("numObservations", 24))
        self.num_acts = int(env.get("numActions", 6))
        self.num_states = int(env.get("numStates", 47))
        env.setdefault("episodeLength", int(rl.get("max_episode_length", 256)))
        self.socket_base_height = float(env.get("socket_base_height", 0.003))
        self.socket_pos_obs_noise = jnp.asarray(
            env.get("socket_pos_obs_noise", [0.001, 0.001, 0.0])
        )
        self.pos_action_scale = jnp.asarray(rl.get("pos_action_scale", [0.01] * 3))
        self.rot_action_scale = jnp.asarray(rl.get("rot_action_scale", [0.01] * 3))
        self.unidirectional_rot = bool(rl.get("unidirectional_rot", True))
        self.num_keypoints = int(rl.get("num_keypoints", 4))
        self.keypoint_scale = float(rl.get("keypoint_scale", 0.5))
        # SAPU / SDF-reward / SBC knobs (IndustRealTaskPegsInsert.yaml rl:)
        self.interpen_thresh = float(rl.get("interpen_thresh", 0.001))
        self.sdf_reward_scale = float(rl.get("sdf_reward_scale", 10.0))
        self.initial_max_disp = float(rl.get("initial_max_disp", 0.01))
        self.curriculum_success_thresh = float(
            rl.get("curriculum_success_thresh", 0.75)
        )
        self.curriculum_failure_thresh = float(
            rl.get("curriculum_failure_thresh", 0.5)
        )
        self.curriculum_height_step = jnp.asarray(
            rl.get("curriculum_height_step", [-0.005, 0.003])
        )
        self.curriculum_height_bound = jnp.asarray(
            rl.get("curriculum_height_bound", [-0.01, 0.01])
        )
        self.close_error_thresh = float(rl.get("close_error_thresh", 0.15))
        self.success_height_thresh = float(rl.get("success_height_thresh", 0.003))
        self.engagement_bonus = float(rl.get("engagement_bonus", 10.0))
        # randomize: block
        self.arm_init = jnp.asarray(
            r.get(
                "franka_arm_initial_dof_pos",
                [-1.75748, 0.84032, 2.01588, -2.09249, -0.73794, 1.62564, 1.26893],
            )
        )
        self.socket_xy_initial = jnp.asarray(
            r.get("socket_pos_xy_initial", [0.5, 0.0])
        )
        self.socket_xy_noise = jnp.asarray(
            r.get("socket_pos_xy_noise", [0.1, 0.1])
        )
        self.socket_z_bounds = jnp.asarray(
            r.get("socket_pos_z_noise_bounds", [0.0, 0.05])
        )
        self.socket_rot_noise = float(
            (r.get("socket_rot_noise") or [0, 0, 0.0872665])[2]
        )
        self.plug_xy_noise = jnp.asarray(r.get("plug_pos_xy_noise", [0.01, 0.01]))
        super().__init__(cfg)
        self._setup()

    # ---- model ----------------------------------------------------------
    def build_model(self):
        franka = load_urdf(
            asset_path("urdf/franka_description/robots/franka_panda.urdf"),
            fix_base=True,
        )
        nv = franka.nv
        stiff = np.zeros(nv, np.float32)
        damp = np.zeros(nv, np.float32)
        stiff[nv - 2:] = 500.0  # ctrl.all gripper_prop_gains
        damp[nv - 2:] = 2.0
        franka = franka.replace(
            dof_stiffness=jnp.asarray(stiff), dof_damping=jnp.asarray(damp)
        )
        model, refs = compose(
            [franka, build_plug(), build_socket()], ["", "plug:", "socket:"]
        )
        self.franka_ref, self.plug_ref, self.socket_ref = refs
        plug_body = self.plug_ref.body0
        socket_body = self.socket_ref.body0 + 3  # yaw child of 3 slides
        lf = model.body_names.index("panda_leftfinger")
        rf = model.body_names.index("panda_rightfinger")
        model = _strip_points(model, set(range(model.nbody)))
        # plug contact points vs socket SDF
        model, cp_idx = add_contact_points(
            model, plug_body, plug_contact_points(), friction=0.5
        )
        model, socket_g = attach_sdf(model, socket_body, socket_sdf_grid())
        model = pair_points_with_sdf(model, cp_idx, socket_g)
        # finger pads vs plug SDF (grip force transmission)
        model, lf_idx = add_contact_points(model, lf, PAD_POINTS_SPARSE, friction=1.0)
        model, rf_idx = add_contact_points(model, rf, PAD_POINTS_SPARSE, friction=1.0)
        model, plug_g = attach_sdf(model, plug_body, plug_sdf_grid())
        model = pair_points_with_sdf(model, lf_idx + rf_idx, plug_g)
        self.plug_body, self.socket_body = plug_body, socket_body
        return model, self.sim_params_from_cfg()

    def _setup(self):
        m = self.model
        fr = [d for d in self.scalar_dof_indices if m.dof_body[d] < self.plug_ref.body0]
        self.q_idx = jnp.asarray(np.asarray([m.q_adr[m.dof_body[d]] for d in fr]))
        self.v_idx_np = np.asarray(fr)
        self.v_idx = jnp.asarray(self.v_idx_np)
        self.effort_limit = jnp.asarray(
            np.asarray(m.dof_max_effort)[self.v_idx_np][:7]
        )
        self.hand_body = m.body_names.index("panda_hand")
        self.eef_offset = jnp.array([0.0, 0.0, HAND_LENGTH + FINGER_LENGTH])
        self.pad_offset = jnp.array(
            [0.0, 0.0, HAND_LENGTH + FINGER_LENGTH - FINGERPAD_LENGTH / 2]
        )
        self.pq = m.q_adr[self.plug_body]
        self.pv = m.v_adr[self.plug_body]
        # socket q addresses: 3 slides + yaw hinge
        self.sq = m.q_adr[self.socket_ref.body0]
        # task_space_impedance gains: cfg lists (linear, angular); our
        # jacobian/pose-error rows are (angular, linear)
        ctrl = (self.cfg.get("ctrl") or {}).get("task_space_impedance", {})
        kp = list(ctrl.get("task_prop_gains", [300, 300, 300, 50, 50, 50]))
        kd = list(ctrl.get("task_deriv_gains", [34, 34, 34, 1.4, 1.4, 1.4]))
        self.task_kp = jnp.asarray(kp[3:] + kp[:3], jnp.float32)
        self.task_kd = jnp.asarray(kd[3:] + kd[:3], jnp.float32)
        self._anc = jnp.asarray(_dyn.ancestor_matrix(m))
        self._meta = _dyn.kin_meta(m)
        self._dof_body = np.asarray(m.dof_body)
        self.franka_mass = jnp.asarray(
            np.where(
                np.arange(m.nbody) < self.plug_ref.body0,
                np.asarray(m.body_mass), 0.0,
            ),
            jnp.float32,
        )
        self.keypoint_offsets = algo.keypoint_offsets(
            self.num_keypoints, self.keypoint_scale
        )
        self.sample_pts, self.socket_grid, self.plug_grid = (
            self._algo_geometry()
        )
        # engagement geometry (overridden by GearsInsert: the gear engages
        # when its origin drops below base+shaft top, with no base offset)
        self.engage_top_offset = SOCKET_HEIGHT
        self.engage_base_height = self.socket_base_height
        # down-facing fingertip quat (randomize.fingertip_centered_rot
        # _initial [pi, 0, 0])
        self.down_quat = jnp.array([1.0, 0.0, 0.0, 0.0])

    def _algo_geometry(self):
        """(sample points, SAPU socket grid, SDF-reward plug grid) --
        overridden per subassembly family."""
        return (
            jnp.asarray(plug_sample_points()),
            socket_sdf_grid(),
            plug_sdf_grid(),
        )

    # ---- shared helpers --------------------------------------------------
    def _fingertip(self, kin):
        x = kin.x[self.hand_body]
        qq = kin.quat[self.hand_body]
        eef = x + maths.quat_rotate(qq, self.eef_offset)
        v = kin.v[self.hand_body]
        return eef, qq, v[3:] + jnp.cross(v[:3], eef), v[:3]

    def _plug_state(self, q):
        return q[self.pq: self.pq + 3], q[self.pq + 3: self.pq + 7]

    def _socket_state(self, q):
        pos = q[self.sq: self.sq + 3]
        yaw = q[self.sq + 3]
        quat = maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1.0]))
        return pos, quat

    def _gripper_goal(self, socket_pos, socket_quat):
        off = jnp.array(
            [0.0, 0.0, self.socket_base_height + PLUG_GRASP_OFFSET]
        )
        return socket_pos + maths.quat_rotate(socket_quat, off)

    def _centers(self, q):
        """(plug_center, plug_quat, socket_center, socket_quat): the frames
        keypoints and engagement checks hang off. For pegs these ARE the
        actor origin poses; GearsInsert offsets both to the medium-gear /
        middle-shaft axis (reference gear_medium_pos_center / shaft_pos,
        industreal_task_gears_insert.py:166-172)."""
        plug_pos, plug_quat = self._plug_state(q)
        socket_pos, socket_quat = self._socket_state(q)
        return plug_pos, plug_quat, socket_pos, socket_quat

    def _keypoints(self, q):
        plug_pos, plug_quat, socket_pos, socket_quat = self._centers(q)
        K = self.num_keypoints
        kp_plug = plug_pos[None] + maths.quat_rotate(
            jnp.broadcast_to(plug_quat, (K, 4)), self.keypoint_offsets
        )
        kp_socket = socket_pos[None] + maths.quat_rotate(
            jnp.broadcast_to(socket_quat, (K, 4)), self.keypoint_offsets
        )
        return kp_plug, kp_socket

    # ---- control ---------------------------------------------------------
    def compute_force(self, action, q, qd, task):
        m = self.model
        kin = _dyn.forward_kinematics(m, q, qd, self._meta)
        eef, eq, elin, eang = self._fingertip(kin)
        dpos = action[0:3] * self.pos_action_scale
        rot_act = action[3:6]
        if self.unidirectional_rot:
            rot_act = rot_act.at[2].set(-(rot_act[2] + 1.0) * 0.5)
        drot = rot_act * self.rot_action_scale
        err = jnp.concatenate([drot, dpos])  # (angular, linear)
        arm = self.v_idx_np[:7]
        J = controllers.body_jacobian(
            kin, self._anc, self._dof_body, self.hand_body, eef
        )[:, arm]
        body_vel = jnp.concatenate([eang, elin])
        tau = controllers.task_space_impedance(
            J, err, body_vel, self.task_kp, self.task_kd
        )
        tau = jnp.clip(tau, -self.effort_limit, self.effort_limit)
        qfrc = jnp.zeros(m.nv).at[self.v_idx[:7]].set(tau)
        # franka gravity compensation (disable_gravity=True on the robot,
        # industreal_base.py:137)
        com = kin.x + maths.quat_rotate(kin.quat, m.body_ipos)
        f = -self.franka_mass[:, None] * self.sim_params.gravity[None, :]
        xfrc = jnp.concatenate([jnp.cross(com, f), f], axis=-1)
        q_target = jnp.zeros(m.nq).at[self.q_idx[7:]].set(jnp.zeros(2))
        return qfrc, xfrc, q_target

    # ---- reset -----------------------------------------------------------
    def _sample(self, rng, max_disp):
        m = self.model
        ks, kz, ky, kd, kxy, kn = jax.random.split(rng, 6)
        socket_xy = self.socket_xy_initial + self.socket_xy_noise * (
            jax.random.uniform(ks, (2,)) * 2.0 - 1.0
        )
        socket_z = self.socket_z_bounds[0] + (
            self.socket_z_bounds[1] - self.socket_z_bounds[0]
        ) * jax.random.uniform(kz)
        socket_yaw = self.socket_rot_noise * (jax.random.uniform(ky) * 2 - 1)
        # curriculum displacement (reference _reset_plug :652-661)
        disp = self.curriculum_height_bound[0] + (
            max_disp - self.curriculum_height_bound[0]
        ) * jax.random.uniform(kd)
        socket_pos = jnp.concatenate([socket_xy, socket_z[None]])
        plug_pos = socket_pos + jnp.array([0.0, 0.0, SOCKET_HEIGHT]) - jnp.array(
            [0.0, 0.0, 1.0]
        ) * disp
        # xy noise only when not partially inserted (:675-681)
        above = plug_pos[2] > socket_pos[2] + SOCKET_HEIGHT
        xy_noise = self.plug_xy_noise * (jax.random.uniform(kxy, (2,)) * 2 - 1)
        plug_pos = plug_pos.at[:2].add(jnp.where(above, xy_noise, 0.0))

        q = m.qpos0
        q = q.at[self.sq: self.sq + 3].set(socket_pos)
        q = q.at[self.sq + 3].set(socket_yaw)
        q = q.at[self.pq: self.pq + 3].set(plug_pos)
        q = q.at[self.pq + 3: self.pq + 7].set(jnp.array([0.0, 0, 0, 1.0]))
        # fingers open at gripper_width_max while IK runs, then closed by
        # the PD target; start at plug radius for a one-shot grasp
        fingers = jnp.full(2, PLUG_DIAMETER / 2 - 1e-4)
        grasp = plug_pos + jnp.array([0.0, 0.0, PLUG_GRASP_OFFSET])

        # fixed-iteration DLS IK to the grasp pose (replaces the scripted
        # move_gripper_to_target_pose sim-step choreography :762-790)
        def ik_step(arm_q, _):
            qq = q.at[self.q_idx[:7]].set(arm_q)
            kin = _dyn.forward_kinematics(m, qq, jnp.zeros(m.nv), self._meta)
            eef, eq, _, _ = self._fingertip(kin)
            err = controllers.pose_error(eef, eq, grasp, self.down_quat)
            J = controllers.body_jacobian(
                kin, self._anc, self._dof_body, self.hand_body, eef
            )[:, self.v_idx_np[:7]]
            dq = controllers.get_delta_dof_pos(err, J, method="dls", lam=0.1)
            return arm_q + dq, None

        arm_q, _ = jax.lax.scan(ik_step, self.arm_init, None, length=24)
        q = q.at[self.q_idx].set(jnp.concatenate([arm_q, fingers]))
        obs_noise = self.socket_pos_obs_noise * (
            jax.random.uniform(kn, (3,)) * 2.0 - 1.0
        )
        task = {
            "max_disp": max_disp,
            "obs_noise": obs_noise,
            "prev_rew": jnp.zeros(()),
            "success": jnp.zeros(()),
            "engaged": jnp.zeros(()),
        }
        return q, jnp.zeros(m.nv), task

    def sample_init(self, rng):
        return self._sample(rng, jnp.asarray(self.initial_max_disp))

    def resample_init(self, rng, old_task):
        # curriculum max-displacement persists across resets (SBC)
        return self._sample(rng, old_task["max_disp"])

    # ---- obs / states ------------------------------------------------------
    def observe(self, q, qd, kin, sensors, task, actions, progress):
        eef, eq, _, _ = self._fingertip(kin)
        socket_pos, socket_quat = self._socket_state(q)
        goal = self._gripper_goal(socket_pos, socket_quat)
        noisy_goal = self._gripper_goal(
            socket_pos + task["obs_noise"], socket_quat
        )
        arm_q = q[self.q_idx[:7]]
        return jnp.concatenate(
            [arm_q, eef, eq, noisy_goal, socket_quat, noisy_goal - eef]
        )

    def observe_state(self, q, qd, kin, sensors, task, actions, progress):
        eef, eq, elin, eang = self._fingertip(kin)
        socket_pos, socket_quat = self._socket_state(q)
        goal = self._gripper_goal(socket_pos, socket_quat)
        noisy_goal = self._gripper_goal(
            socket_pos + task["obs_noise"], socket_quat
        )
        plug_pos, plug_quat = self._plug_state(q)
        arm_q = q[self.q_idx[:7]]
        arm_qd = qd[self.v_idx[:7]]
        delta = goal - eef
        return jnp.concatenate(
            [arm_q, arm_qd, eef, eq, elin, eang, goal, socket_quat, delta,
             plug_pos, plug_quat, (noisy_goal - eef) - delta]
        )

    # ---- reward ------------------------------------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        plug_pos, plug_quat = self._plug_state(q)
        socket_pos, socket_quat = self._socket_state(q)
        # SDF-based dense reward (algo_utils :237-275)
        rew = self.sdf_reward_scale * algo.sdf_reward(
            self.sample_pts, plug_pos, plug_quat, socket_pos, socket_quat,
            self.plug_grid,
        )
        # SAPU weight / filter (:158-193 + task _update_rew_buf :383-409)
        interpen = algo.max_interpen_dist(
            self.sample_pts, plug_pos, plug_quat, socket_pos, socket_quat,
            self.socket_grid,
        )
        low, scale = algo.sapu_reward_scale(interpen, self.interpen_thresh)
        rew = jnp.where(low, rew * scale, task["prev_rew"])

        kp_plug, kp_socket = self._keypoints(q)
        plug_c, _, socket_c, socket_cq = self._centers(q)
        socket_top = socket_c + maths.quat_rotate(
            socket_cq, jnp.array([0.0, 0.0, self.engage_top_offset])
        )
        engaged = algo.check_plug_engaged(
            plug_c, socket_top, kp_plug, kp_socket,
            self.engage_base_height, self.close_error_thresh,
        )
        inserted = algo.check_plug_inserted(
            plug_c, socket_c, kp_plug, kp_socket,
            self.success_height_thresh, self.close_error_thresh,
        ) & low  # ignore high-interpenetration successes (:432-443)
        last = progress >= self.max_episode_length - 1
        # engagement bonus + SBC scale only at the last step (:412-427,:446-452)
        eng_scale = algo.engagement_reward_scale(
            plug_c, socket_c, engaged, self.success_height_thresh
        )
        rew_last = rew + eng_scale * self.engagement_bonus
        sbc = algo.curriculum_reward_scale(
            task["max_disp"], self.curriculum_height_bound
        )
        rew_last = jnp.where(rew_last < 0.0, rew_last / sbc, rew_last * sbc)
        rew = jnp.where(last, rew_last, rew)
        task = dict(
            task,
            prev_rew=rew,
            success=inserted.astype(jnp.float32),
            engaged=engaged.astype(jnp.float32),
        )
        return rew, last, task

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        return {
            "successes": task["success"],
            "engaged": task["engaged"],
            "curr_max_disp": task["max_disp"],
        }

    # ---- SBC population update (runtime hook, full batch) -------------------
    def population_update(self, task, done, progress):
        """Step the shared max-displacement from the insertion success
        rate over envs finishing this step (reference get_new_max_disp
        :302-318 driven by extras['insertion_successes'] :432-459)."""
        last = (progress >= self.max_episode_length - 1).astype(jnp.float32)
        n_last = jnp.sum(last)
        succ_rate = jnp.sum(task["success"] * last) / jnp.maximum(n_last, 1.0)
        stepped = algo.new_max_disp(
            succ_rate, task["max_disp"],
            self.curriculum_height_bound, self.curriculum_height_step,
            self.curriculum_success_thresh, self.curriculum_failure_thresh,
        )
        task = dict(task)
        task["max_disp"] = jnp.where(n_last > 0, stepped, task["max_disp"])
        return task

    def true_objective(self, q, qd):
        plug_pos, _ = self._plug_state(q)
        socket_pos, _ = self._socket_state(q)
        return -jnp.linalg.norm(plug_pos - socket_pos)
