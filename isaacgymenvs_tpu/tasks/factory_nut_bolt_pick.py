"""Factory: NutBoltPick -- a Franka reaches for and grasps an M16 nut
resting on the work surface, using inverse-dynamics joint-space control
and a keypoint-alignment reward.

Parity target: reference isaacgymenvs/tasks/factory/factory_task_nut_bolt_pick.py
(obs = fingertip midpoint pos/quat/linvel/angvel + nut grasp pose
compute_observations :158-169 = 20 dims; keypoint reward with
uniformly-spaced keypoints along the gripper axis compute_reward :173-202 +
_get_keypoint_offsets :335-340; 12-dim action = delta pos/rot/force/torque
targets, cfg numActions; ctrl joint_space_id with dls IK and prop/deriv
gains 40/8, cfg/task/FactoryTaskNutBoltPick.yaml:60-77 + the controller
library factory_control.py:74-176) with asset dims from
assets/factory/yaml/factory_asset_info_nut_bolt.yaml (nut m16: width
0.024/0.0277, height 0.013).

TPU-native design notes (documented divergences):
  * the hex nut is a procedural cylinder actor (radius = half the
    edge-to-edge width) with rim contact points for the work surface and
    one analytic cylinder geom for finger-pair narrowphase -- instead of
    PhysX SDF mesh collision (the SDF subsystem exists for mesh queries;
    wiring SDF geoms into the contact pipeline is follow-up work);
  * the scripted post-episode close-and-lift evaluation
    (close_and_lift :201, _check_lift_success) is out of scope: the RL
    training signal in the reference is the keypoint reward alone
    (success_bonus defaults to 0.0), which is reproduced exactly;
  * the gripper stays at its open setpoint during the episode (the
    reference policy likewise has no gripper authority during stepping).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import controllers, maths
from ..engine import dynamics as _dyn
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..model.compose import compose
from ..model.spec import GEOM_CYLINDER, FREE, ModelBuilder, cylinder_inertia
from ..utils.assets import asset_path

NUT_RADIUS = 0.02771281 / 2.0  # m16 width_max / 2
NUT_HEIGHT = 0.013


def _nut_actor(density: float = 7850.0):
    """Procedural M16-nut stand-in: cylinder geom + hex-rim contact
    points (the TPU answer to the reference's SDF mesh collision)."""
    b = ModelBuilder()
    mass, inertia = cylinder_inertia(density, NUT_RADIUS, NUT_HEIGHT / 2)
    body = b.add_body(
        parent=-1, name="nut", pos=(0, 0, 0), quat=(0, 0, 0, 1),
        jnt_type=FREE, mass=mass, inertia=inertia,
    )
    b.qpos0_free[body] = (
        np.array([0.0, 0.0, NUT_HEIGHT / 2], np.float32),
        np.array([0, 0, 0, 1], np.float32),
    )
    # the cylinder geom supplies both the finger-pair narrowphase target
    # and (via finalize's per-geom candidate points) the rim contact
    # points the nut rests on
    b.add_geom(
        body, GEOM_CYLINDER, (0, 0, 0), (0, 0, 0, 1),
        (NUT_RADIUS, NUT_HEIGHT / 2, 0.0), friction=0.3,
    )
    return b.finalize()


class FactoryTaskNutBoltPick(VecTask):
    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg["env"]
        rl = cfg.get("rl", {})
        self.pos_action_scale = jnp.asarray(
            rl.get("pos_action_scale", [0.1, 0.1, 0.1])
        )
        self.rot_action_scale = jnp.asarray(
            rl.get("rot_action_scale", [0.1, 0.1, 0.1])
        )
        self.num_keypoints = int(rl.get("num_keypoints", 4))
        self.keypoint_scale = float(rl.get("keypoint_scale", 0.5))
        self.keypoint_reward_scale = float(rl.get("keypoint_reward_scale", 1.0))
        self.action_penalty_scale = float(rl.get("action_penalty_scale", 0.0))
        self.success_bonus = float(rl.get("success_bonus", 0.0))
        env.setdefault("episodeLength", int(rl.get("max_episode_length", 100)))
        rand = cfg.get("randomize", {})
        self.arm_init = jnp.asarray(
            rand.get(
                "franka_arm_initial_dof_pos",
                [0.3413, -0.8011, -0.0670, -1.8299, 0.0266, 1.0185, 1.0927],
            )
        )
        self.nut_xy_init = jnp.asarray(
            rand.get("nut_pos_xy_initial", [0.0, -0.3])
        )
        self.nut_xy_noise = jnp.asarray(
            rand.get("nut_pos_xy_initial_noise", [0.1, 0.1])
        )
        self.num_obs = 20
        self.num_acts = 12
        super().__init__(cfg)
        self._setup()

    # ------------------------------------------------------------------
    def build_model(self):
        franka = load_urdf(
            asset_path("urdf/franka_description/robots/franka_panda.urdf"),
            fix_base=True,
        )
        # gripper prop/deriv gains (ctrl.all gripper gains :62-63)
        nv = franka.nv
        stiff = np.zeros(nv, np.float32)
        damp = np.zeros(nv, np.float32)
        stiff[nv - 2 :] = 50.0
        damp[nv - 2 :] = 2.0
        franka = franka.replace(
            dof_stiffness=jnp.asarray(stiff), dof_damping=jnp.asarray(damp)
        )
        nut = _nut_actor()
        model, refs = compose([franka, nut], ["", "nut:"])
        self.franka_ref, self.nut_ref = refs
        # contacts: nut rim vs work surface (z=0 plane) + finger contact
        # points vs the nut cylinder; arm links never reach the table
        nut_body = self.nut_ref.body0
        fingers = {
            model.body_names.index("panda_leftfinger"),
            model.body_names.index("panda_rightfinger"),
        }
        nut_geom = next(
            g for g in range(model.ngeom) if model.geom_body[g] == nut_body
        )
        keep, ppp = [], []
        for c in range(model.ncp):
            if model.cpoint_body[c] == nut_body:
                keep.append(c)
            elif model.cpoint_body[c] in fingers:
                keep.append(c)
                ppp.append(c)
        remap = {c: i for i, c in enumerate(keep)}
        karr = np.asarray(keep)
        model = model.replace(
            cpoint_body=tuple(model.cpoint_body[c] for c in keep),
            cpoint_pos=model.cpoint_pos[karr],
            cpoint_radius=model.cpoint_radius[karr],
            cpoint_friction=model.cpoint_friction[karr],
            ppair_point=tuple(remap[c] for c in ppp),
            ppair_geom=tuple(nut_geom for _ in ppp),
        )
        return model, self.sim_params_from_cfg()

    def _setup(self):
        m = self.model
        sdofs = self.scalar_dof_indices  # 9 franka dofs
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        self.q_idx = jnp.asarray(sq)
        self.v_idx = jnp.asarray(sdofs)
        self.v_idx_np = np.asarray(sdofs)
        self.effort_limit = jnp.asarray(np.asarray(m.dof_max_effort)[sdofs][:7])
        self.hand_body = m.body_names.index("panda_hand")
        self.eef_offset = jnp.array([0.0, 0.0, 0.1])  # fingertip midpoint
        self.nq = m.q_adr[self.nut_ref.body0]
        self.nv_ = m.v_adr[self.nut_ref.body0]
        self.kp = jnp.full(7, 40.0)  # joint_space_id prop/deriv gains
        self.kd = jnp.full(7, 8.0)
        self._anc = jnp.asarray(_dyn.ancestor_matrix(m))
        self._dof_mask = jnp.asarray(_dyn.dof_ancestor_mask(m))
        self._meta = _dyn.kin_meta(m)
        self._dof_body = np.asarray(m.dof_body)
        # gravity compensation on the robot: the reference creates the
        # franka with disable_gravity=True (factory_base.py:132); here
        # that is an explicit per-body counter-wrench on the arm
        nut_body = self.nut_ref.body0
        self.franka_mass = jnp.asarray(
            np.where(
                np.arange(m.nbody) < nut_body, np.asarray(m.body_mass), 0.0
            ),
            jnp.float32,
        )
        # keypoints along the gripper approach axis (:335-340)
        z = jnp.linspace(0.0, 1.0, self.num_keypoints) - 0.5
        self.keypoint_offsets = (
            jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)
            * self.keypoint_scale
        )
        # grasp frame: fingers-down onto the nut top face
        self.down_quat = jnp.array([1.0, 0.0, 0.0, 0.0])  # pi about x

    # ---- init ---------------------------------------------------------
    def sample_init(self, rng):
        m = self.model
        kq, kn, ky = jax.random.split(rng, 3)
        arm = self.arm_init + 0.02 * jax.random.uniform(
            kq, (7,), minval=-1.0, maxval=1.0
        )
        dof = jnp.concatenate([arm, jnp.array([0.04, 0.04])])
        q = m.qpos0.at[self.q_idx].set(dof)
        xy = self.nut_xy_init + self.nut_xy_noise * jax.random.uniform(
            kn, (2,), minval=-1.0, maxval=1.0
        )
        yaw = jax.random.uniform(ky, (), minval=-jnp.pi, maxval=jnp.pi)
        nq = self.nq
        q = q.at[nq : nq + 3].set(
            jnp.concatenate([xy, jnp.array([NUT_HEIGHT / 2])])
        )
        q = q.at[nq + 3 : nq + 7].set(
            maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1]))
        )
        return q, jnp.zeros(m.nv), ()

    # ---- control: joint-space inverse dynamics -------------------------
    def compute_force(self, action, q, qd, task):
        """factory_control.py joint_space_id: delta-pose target -> dls IK
        joint displacement -> inertially-compensated joint PD."""
        m = self.model
        kin = _dyn.forward_kinematics(m, q, qd, self._meta)
        eef = kin.x[self.hand_body] + maths.quat_rotate(
            kin.quat[self.hand_body], self.eef_offset
        )
        dpos = action[0:3] * self.pos_action_scale
        drot = action[3:6] * self.rot_action_scale
        # pose error in (angular, linear) row order to match our jacobian
        err = jnp.concatenate([drot, dpos])
        arm = self.v_idx_np[:7]
        J = controllers.body_jacobian(
            kin, self._anc, self._dof_body, self.hand_body, eef
        )[:, arm]
        dq = controllers.get_delta_dof_pos(err, J, method="dls", lam=0.1)
        M = _dyn.mass_matrix(m, kin, (self._anc, self._dof_mask))
        M77 = M[np.ix_(arm, arm)]
        tau = controllers.joint_space_pd(
            self.kp * dq, qd[self.v_idx[:7]], 1.0, self.kd, mass_matrix=M77
        )
        tau = jnp.clip(tau, -self.effort_limit, self.effort_limit)
        qfrc = jnp.zeros(m.nv).at[self.v_idx[:7]].set(tau)
        # gravity compensation on all franka bodies (disable_gravity)
        com = kin.x + maths.quat_rotate(kin.quat, m.body_ipos)
        f = -self.franka_mass[:, None] * self.sim_params.gravity[None, :]
        xfrc = jnp.concatenate([jnp.cross(com, f), f], axis=-1)
        # gripper: held open at its setpoint (see module docstring)
        q_target = jnp.zeros(m.nq).at[self.q_idx[7:]].set(jnp.full(2, 0.04))
        return qfrc, xfrc, q_target

    # ---- observations (:158-169, 20 dims) ------------------------------
    def _grasp_pose(self, q):
        nq = self.nq
        pos = q[nq : nq + 3] + jnp.array([0.0, 0.0, NUT_HEIGHT / 2])
        quat = maths.quat_mul(q[nq + 3 : nq + 7], self.down_quat)
        return pos, quat

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        v = kin.v[self.hand_body]
        eef = kin.x[self.hand_body] + maths.quat_rotate(
            kin.quat[self.hand_body], self.eef_offset
        )
        eef_quat = kin.quat[self.hand_body]
        linvel = v[3:] + jnp.cross(v[:3], eef)
        grasp_pos, grasp_quat = self._grasp_pose(q)
        return jnp.concatenate(
            [eef, eef_quat, linvel, v[:3], grasp_pos, grasp_quat]
        )

    # ---- reward (:173-202) ---------------------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        eef = kin.x[self.hand_body] + maths.quat_rotate(
            kin.quat[self.hand_body], self.eef_offset
        )
        eef_quat = kin.quat[self.hand_body]
        grasp_pos, grasp_quat = self._grasp_pose(q)
        kp_gripper = eef[None, :] + maths.quat_rotate(
            jnp.broadcast_to(eef_quat, (self.num_keypoints, 4)),
            self.keypoint_offsets,
        )
        kp_nut = grasp_pos[None, :] + maths.quat_rotate(
            jnp.broadcast_to(grasp_quat, (self.num_keypoints, 4)),
            self.keypoint_offsets,
        )
        keypoint_dist = jnp.sum(jnp.linalg.norm(kp_nut - kp_gripper, axis=-1))
        action_penalty = jnp.linalg.norm(actions)
        reward = (
            -keypoint_dist * self.keypoint_reward_scale
            - action_penalty * self.action_penalty_scale
        )
        done = progress >= self.max_episode_length - 1
        return reward, done, task

    def true_objective(self, q, qd):
        grasp_pos, _ = self._grasp_pose(q)
        return -jnp.linalg.norm(grasp_pos)
