"""FrankaCabinet: open the top drawer of a cabinet with a Franka arm.

Parity target: reference isaacgymenvs/tasks/franka_cabinet.py (obs 23 / 9
acts :77-78, dof drive props :163-202, start poses :209-215, grasp-frame
construction :295-340, integrated position targets pre_physics_step
:365-372, reward compute_franka_reward :466-530 incl. around-handle and
opening bonuses and the bad-style -1 clamp) and cfg/task/FrankaCabinet.yaml.

The arm and cabinet compose into one fixed-base forest; finger/hand
contact points pair against the drawer handle mesh so the drawer is pulled
by real contact forces.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..engine import dynamics as _dyn
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..model.compose import compose
from ..utils.assets import asset_path


class FrankaCabinet(VecTask):
    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg["env"]
        self.action_scale = float(env.get("actionScale", 7.5))
        self.start_position_noise = float(env.get("startPositionNoise", 0.0))
        self.num_props = int(env.get("numProps", 0))  # prop clutter: not simulated
        self.dof_vel_scale = float(env.get("dofVelocityScale", 0.1))
        self.dist_reward_scale = float(env.get("distRewardScale", 2.0))
        self.rot_reward_scale = float(env.get("rotRewardScale", 0.5))
        self.around_handle_reward_scale = float(env.get("aroundHandleRewardScale", 0.25))
        self.open_reward_scale = float(env.get("openRewardScale", 7.5))
        self.finger_dist_reward_scale = float(env.get("fingerDistRewardScale", 5.0))
        self.action_penalty_scale = float(env.get("actionPenaltyScale", 0.01))
        self.distX_offset = 0.04
        env.setdefault("episodeLength", 500)
        self.num_obs = 23
        self.num_acts = 9
        super().__init__(cfg)
        self._setup()

    def build_model(self):
        env = self.cfg["env"]
        franka = load_urdf(
            asset_path(
                env.get("asset", {}).get(
                    "assetFileNameFranka",
                    "urdf/franka_description/robots/franka_panda.urdf",
                )
            ),
            fix_base=True,
        )
        # drive props (franka_cabinet.py:163-198)
        stiff = np.array([400, 400, 400, 400, 400, 400, 400, 1.0e6, 1.0e6], np.float32)
        damp = np.array([80, 80, 80, 80, 80, 80, 80, 1.0e2, 1.0e2], np.float32)
        franka = franka.replace(
            dof_stiffness=jnp.asarray(stiff), dof_damping=jnp.asarray(damp)
        )
        cabinet = load_urdf(
            asset_path(
                env.get("asset", {}).get(
                    "assetFileNameCabinet",
                    "urdf/sektion_cabinet_model/urdf/sektion_cabinet_2.urdf",
                )
            ),
            fix_base=True,
        )
        cabinet = cabinet.replace(
            dof_damping=jnp.full(cabinet.nv, 10.0)  # :200-202
        )
        model, refs = compose([franka, cabinet], ["", "cab:"])
        self.franka_ref, self.cab_ref = refs

        # start poses: franka at (1,0,0) yawed 180deg; cabinet at (0,0,0.4)
        model = model.replace(
            body_pos=model.body_pos
            .at[0].set(jnp.array([1.0, 0.0, 0.0]))
            .at[self.cab_ref.body0].set(jnp.array([0.0, 0.0, 0.4])),
            body_quat=model.body_quat.at[0].set(jnp.array([0.0, 0.0, 1.0, 0.0])),
        )

        # finger/hand contact points vs drawer handle + drawer front
        finger_bodies = {
            model.body_names.index("panda_leftfinger"),
            model.body_names.index("panda_rightfinger"),
            model.body_names.index("panda_hand"),
        }
        handle_body = model.body_names.index("cab:drawer_handle_top")
        drawer_body = model.body_names.index("cab:drawer_top")
        finger_pts = tuple(
            c for c in range(model.ncp) if model.cpoint_body[c] in finger_bodies
        )
        handle_geoms = [
            g for g in range(model.ngeom) if model.geom_body[g] == handle_body
        ]
        ppp, ppg = [], []
        for g in handle_geoms[:1]:  # handle bar geom
            ppp += list(finger_pts)
            ppg += [g] * len(finger_pts)
        model = model.replace(
            ppair_point=tuple(ppp),
            ppair_geom=tuple(ppg),
            plane_contacts=False,  # everything is fixed-base, off the floor
        )
        return model, self.sim_params_from_cfg()

    def _setup(self):
        m = self.model
        sdofs = self.scalar_dof_indices
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        self.all_q_idx = jnp.asarray(sq)
        self.all_v_idx = jnp.asarray(sdofs)
        self.franka_dofs = jnp.arange(9)
        self.cab_dofs = jnp.arange(9, 13)
        lo = np.asarray(m.dof_limit_lower)[sdofs]
        hi = np.asarray(m.dof_limit_upper)[sdofs]
        self.dof_lower = jnp.asarray(lo[:9])
        self.dof_upper = jnp.asarray(hi[:9])
        self.default_dof = jnp.asarray(
            [1.157, -1.066, -0.155, -2.239, -1.841, 1.003, 0.469, 0.035, 0.035]
        )  # franka_cabinet.py:92
        self.hand_body = m.body_names.index("panda_link7")
        self.lfinger_body = m.body_names.index("panda_leftfinger")
        self.rfinger_body = m.body_names.index("panda_rightfinger")
        self.drawer_body = m.body_names.index("cab:drawer_top")
        self.drawer_q = 11  # drawer_top_joint scalar-dof index (cab dof 2)
        # actually index within all scalar dofs: frankas 0-8, cabinet 9-12
        # (door_right, door_left, drawer_top, drawer_bottom)
        # grasp frames (franka_cabinet.py:314-330)
        meta = _dyn.kin_meta(m)
        q0 = m.qpos0.at[self.all_q_idx[:9]].set(self.default_dof)
        kin = _dyn.forward_kinematics(m, q0, jnp.zeros(m.nv), meta)
        hand_q = kin.quat[self.hand_body]
        hand_p = kin.x[self.hand_body]
        finger_mid = 0.5 * (kin.x[self.lfinger_body] + kin.x[self.rfinger_body])
        inv_q, inv_p = maths.tf_inverse(hand_q, hand_p)
        local_p = maths.tf_apply(inv_q, inv_p, finger_mid) + jnp.array([0, 0, 0.04])
        self.franka_local_grasp_pos = local_p
        self.franka_local_grasp_rot = maths.quat_mul(inv_q, hand_q)  # identity
        self.drawer_local_grasp_pos = jnp.array([0.3, 0.01, 0.0])
        # drawer local grasp: get_axis_params(0.01, 2, 0.3) = (0.3, 0, 0.01)
        self.drawer_local_grasp_pos = jnp.array([0.3, 0.0, 0.01])
        self.drawer_local_grasp_rot = jnp.array([0.0, 0.0, 0.0, 1.0])
        self.gripper_forward_axis = jnp.array([0.0, 0.0, 1.0])
        self.drawer_inward_axis = jnp.array([-1.0, 0.0, 0.0])
        self.gripper_up_axis = jnp.array([0.0, 1.0, 0.0])
        self.drawer_up_axis = jnp.array([0.0, 0.0, 1.0])

    # ---- init / control -------------------------------------------------
    def sample_init(self, rng):
        m = self.model
        kq = rng
        noise = 0.25 * (jax.random.uniform(kq, (9,)) - 0.5)
        pos = jnp.clip(self.default_dof + noise, self.dof_lower, self.dof_upper)
        q = m.qpos0.at[self.all_q_idx[:9]].set(pos)
        q = q.at[self.all_q_idx[9:]].set(jnp.zeros(4))
        qd = jnp.zeros(m.nv)
        return q, qd, {"targets": pos}

    def compute_force(self, action, q, qd, task):
        m = self.model
        targets = jnp.clip(
            task["targets"] + self.action_scale * self.dt * action,
            self.dof_lower, self.dof_upper,
        )
        q_target = jnp.zeros(m.nq).at[self.all_q_idx[:9]].set(targets)
        return jnp.zeros(m.nv), jnp.zeros((m.nbody, 6)), q_target

    # ---- observations ---------------------------------------------------
    def _grasp_frames(self, q, kin):
        hand_q, hand_p = kin.quat[self.hand_body], kin.x[self.hand_body]
        drawer_q, drawer_p = kin.quat[self.drawer_body], kin.x[self.drawer_body]
        fg_rot, fg_pos = maths.tf_combine(
            hand_q, hand_p, self.franka_local_grasp_rot, self.franka_local_grasp_pos
        )
        dg_rot, dg_pos = maths.tf_combine(
            drawer_q, drawer_p, self.drawer_local_grasp_rot, self.drawer_local_grasp_pos
        )
        return fg_rot, fg_pos, dg_rot, dg_pos

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        dof_pos = q[self.all_q_idx[:9]]
        dof_vel = qd[self.all_v_idx[:9]]
        cab_pos = q[self.all_q_idx[9:]]
        cab_vel = qd[self.all_v_idx[9:]]
        dof_scaled = 2.0 * (dof_pos - self.dof_lower) / (
            self.dof_upper - self.dof_lower
        ) - 1.0
        _, fg_pos, _, dg_pos = self._grasp_frames(q, kin)
        return jnp.concatenate(
            [
                dof_scaled,
                dof_vel * self.dof_vel_scale,
                dg_pos - fg_pos,
                cab_pos[2:3],  # drawer_top_joint
                cab_vel[2:3],
            ]
        )

    # ---- reward ---------------------------------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        fg_rot, fg_pos, dg_rot, dg_pos = self._grasp_frames(q, kin)
        lf = kin.x[self.lfinger_body]
        rf = kin.x[self.rfinger_body]
        drawer_open = q[self.all_q_idx[11]]

        d = jnp.linalg.norm(fg_pos - dg_pos)
        dist_reward = (1.0 / (1.0 + d * d)) ** 2
        dist_reward = jnp.where(d <= 0.02, dist_reward * 2, dist_reward)

        axis1 = maths.tf_vector(fg_rot, self.gripper_forward_axis)
        axis2 = maths.tf_vector(dg_rot, self.drawer_inward_axis)
        axis3 = maths.tf_vector(fg_rot, self.gripper_up_axis)
        axis4 = maths.tf_vector(dg_rot, self.drawer_up_axis)
        dot1 = jnp.dot(axis1, axis2)
        dot2 = jnp.dot(axis3, axis4)
        rot_reward = 0.5 * (jnp.sign(dot1) * dot1**2 + jnp.sign(dot2) * dot2**2)

        around = (lf[2] > dg_pos[2]) & (rf[2] < dg_pos[2])
        around_handle_reward = 0.5 * around
        finger_dist_reward = jnp.where(
            around,
            (0.04 - jnp.abs(lf[2] - dg_pos[2])) + (0.04 - jnp.abs(rf[2] - dg_pos[2])),
            0.0,
        )
        action_penalty = jnp.sum(actions**2)
        open_reward = drawer_open * around_handle_reward + drawer_open

        rewards = (
            self.dist_reward_scale * dist_reward
            + self.rot_reward_scale * rot_reward
            + self.around_handle_reward_scale * around_handle_reward
            + self.open_reward_scale * open_reward
            + self.finger_dist_reward_scale * finger_dist_reward
            - self.action_penalty_scale * action_penalty
        )
        rewards = jnp.where(drawer_open > 0.01, rewards + 0.5, rewards)
        rewards = jnp.where(drawer_open > 0.2, rewards + around_handle_reward, rewards)
        rewards = jnp.where(
            drawer_open > 0.39, rewards + 2.0 * around_handle_reward, rewards
        )
        bad = (lf[0] < dg_pos[0] - self.distX_offset) | (
            rf[0] < dg_pos[0] - self.distX_offset
        )
        rewards = jnp.where(bad, -1.0, rewards)

        # reference resets only on success/timeout; 'bad style' is a -1
        # penalty, not a termination (franka_cabinet.py:546-555)
        done = (drawer_open > 0.39) | (progress >= self.max_episode_length - 1)
        targets = jnp.clip(
            task["targets"] + self.action_scale * self.dt * actions,
            self.dof_lower, self.dof_upper,
        )
        return rewards, done, {"targets": targets}

    def true_objective(self, q, qd):
        return q[self.all_q_idx[11]]
