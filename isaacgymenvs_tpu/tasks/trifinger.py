"""Trifinger: cube repositioning/reorientation with a 3-finger platform.

Parity target: reference isaacgymenvs/tasks/trifinger.py (obs spec
compute_trifinger_observations_states :1050-1085 -- 41-dim policy obs +
optional asymmetric state; torque command mode with safety damping
:315-320; goal sampling by difficulty _sample_object_goal_poses :927-980;
keypoint reward with logistic kernel compute_trifinger_reward :1090-1160;
max torque 0.36 Nm :200) and cfg/task/Trifinger.yaml.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..model.compose import compose
from ..utils.assets import asset_path
from .franka_cube_stack import _box_actor

OBJ_SIZE = 0.065
MAX_TORQUE = 0.36
MAX_VELOCITY = 10.0  # rad/s (reference _max_velocity_radps :202)
ARENA_RADIUS = 0.195

# PD gains of the finger drives at 250 Hz + the safety-check damping
# (reference _robot_dof_gains :311-320, from the rrc_simulation stack)
STIFFNESS = np.tile(np.array([10.0, 10.0, 10.0], np.float32), 3)
DAMPING = np.tile(np.array([0.1, 0.3, 0.001], np.float32), 3)
SAFETY_DAMPING = np.tile(np.array([0.08, 0.08, 0.04], np.float32), 3)


def gen_keypoints(pos, quat, size=OBJ_SIZE):
    """8 cube-corner keypoints in world frame (reference gen_keypoints)."""
    corners = (
        jnp.array(
            [
                [sx, sy, sz]
                for sx in (-1, 1)
                for sy in (-1, 1)
                for sz in (-1, 1)
            ],
            jnp.float32,
        )
        * size
        / 2.0
    )
    return pos[None, :] + maths.quat_rotate(quat[None, :], corners)


def lgsk_kernel(x, scale=30.0, eps=2.0):
    """Logistic kernel reward shaping (reference lgsk_kernel)."""
    scaled = x * scale
    return 1.0 / (scaled.shape[0] * 0 + 1.0) * (
        1.0 / (jnp.exp(scaled) + eps + jnp.exp(-scaled))
    )


class Trifinger(VecTask):
    # per-component MDP specs (reference trifinger.py:326-352); the obs
    # layout and its normalization bounds are derived from these
    OBS_SPEC = {
        "robot_q": 9,
        "robot_u": 9,
        "object_q": 7,
        "object_q_des": 7,
        "command": 9,
    }
    STATE_EXTRA_SPEC = {
        "object_u": 6,
        "fingertip_state": 3 * 13,
        "robot_a": 9,
        "fingertip_wrench": 3 * 6,
    }
    ACTION_SPEC = {"command": 9}

    def __init__(self, cfg):
        env = cfg["env"]
        self.task_difficulty = int(env.get("task_difficulty", 4))
        self.asymmetric_obs = bool(env.get("asymmetric_obs", True))
        self.normalize_action = bool(env.get("normalize_action", True))
        self.normalize_obs = bool(env.get("normalize_obs", True))
        self.apply_safety_damping = bool(env.get("apply_safety_damping", True))
        self.command_mode = str(env.get("command_mode", "torque"))
        term = (env.get("termination_conditions") or {}).get("success", {})
        self.position_tolerance = float(term.get("position_tolerance", 0.02))
        self.orientation_tolerance = float(
            term.get("orientation_tolerance", 0.4)
        )
        rt = env.get("reward_terms", {})
        self.finger_move_penalty_weight = float(
            rt.get("finger_move_penalty", {}).get("weight", -0.5)
        )
        self.finger_reach_object_weight = float(
            rt.get("finger_reach_object_rate", {}).get("weight", -250.0)
        )
        self.object_dist_weight = float(
            rt.get("object_dist", {}).get("weight", 2000.0)
        )
        self.object_rot_weight = float(
            rt.get("object_rot", {}).get("weight", 2000.0)
        )
        self.use_keypoints = bool(
            rt.get("keypoints_dist", {}).get("activate", True)
        )
        env.setdefault("episodeLength", 750)
        self.num_obs = sum(self.OBS_SPEC.values())
        self.num_states = (
            self.num_obs + sum(self.STATE_EXTRA_SPEC.values())
            if self.asymmetric_obs
            else 0
        )
        self.num_acts = sum(self.ACTION_SPEC.values())
        super().__init__(cfg)
        self._setup()

    def dr_actor_ranges(self):
        return getattr(self, "_actor_ranges", None)

    def build_model(self):
        robot = load_urdf(
            asset_path(
                "trifinger/robot_properties_fingers/urdf/pro/trifingerpro.urdf"
            ),
            fix_base=True,
        )
        # safety damping + PD are applied EXPLICITLY in compute_force
        # with a second torque saturation, matching the reference's
        # applied-torque pipeline (:1027-1041)
        robot = robot.replace(
            dof_max_effort=jnp.full(robot.nv, MAX_TORQUE),
        )
        obj = _box_actor(
            "object", [OBJ_SIZE] * 3, 264.0, False, [0.0, 0.0, OBJ_SIZE / 2]
        )
        model, refs = compose([robot, obj], ["", "object:"])
        self.robot_ref, self.obj_ref = refs
        self._actor_ranges = {
            "robot": (0, self.obj_ref.body0),
            "object": (self.obj_ref.body0, self.obj_ref.body0 + obj.nbody),
        }
        # robot base: the trifinger platform hangs above the table (z=0 top)
        model = model.replace(
            body_pos=model.body_pos.at[0].set(jnp.array([0.0, 0.0, 0.0]))
        )
        # fingertip contact: tip links' candidate points vs the object box;
        # object corners vs ground plane handle table contact
        tips = [i for i, n in enumerate(model.body_names) if "tip_link" in n]
        obj_geom = self.obj_ref.geom0
        tip_pts = tuple(
            c for c in range(model.ncp) if model.cpoint_body[c] in tips
        )
        model = model.replace(
            ppair_point=tip_pts,
            ppair_geom=tuple(obj_geom for _ in tip_pts),
        )
        # prune plane contacts to the object corners only (the robot hangs)
        obj_body = self.obj_ref.body0
        keep = [c for c in range(model.ncp) if model.cpoint_body[c] == obj_body]
        # keep tip points too -- they index into cpoint arrays for pairs
        keep_all = sorted(set(keep) | set(tip_pts))
        remap = {c: i for i, c in enumerate(keep_all)}
        model = model.replace(
            cpoint_body=tuple(model.cpoint_body[c] for c in keep_all),
            cpoint_pos=model.cpoint_pos[np.asarray(keep_all)],
            cpoint_radius=model.cpoint_radius[np.asarray(keep_all)],
            cpoint_friction=model.cpoint_friction[np.asarray(keep_all)],
            ppair_point=tuple(remap[c] for c in tip_pts),
        )
        # plane contact list still includes tip points; they hang above the
        # table and never activate (top-K selection skips them)
        return model, self.sim_params_from_cfg()

    def _setup(self):
        m = self.model
        sdofs = self.scalar_dof_indices
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        self.q_idx = jnp.asarray(sq)
        self.v_idx = jnp.asarray(sdofs)
        self.default_dof = jnp.tile(jnp.asarray([0.0, 0.9, -2.0]), 3)
        self.dof_lower = jnp.tile(jnp.asarray([-0.33, 0.0, -2.7]), 3)
        self.dof_upper = jnp.tile(jnp.asarray([1.0, 1.57, 0.0]), 3)
        self.tip_bodies = jnp.asarray(
            [i for i, n in enumerate(m.body_names) if "tip_link" in n]
        )
        self.oq = m.q_adr[self.obj_ref.body0]
        self.ov = m.v_adr[self.obj_ref.body0]
        # action scale (reference __configure_mdp_spaces :598-607)
        if self.command_mode == "position":
            self.action_lo, self.action_hi = self.dof_lower, self.dof_upper
        else:
            self.action_lo = jnp.full(9, -MAX_TORQUE)
            self.action_hi = jnp.full(9, MAX_TORQUE)
        # observation normalization bounds (:620-641): robot_q limits,
        # robot_u +/-10, object + goal pose (position box x quat +/-1),
        # command (+/-1 when the policy emits normalized actions)
        obj_lo = jnp.concatenate(
            [jnp.array([-0.3, -0.3, 0.0]), -jnp.ones(4)]
        )
        obj_hi = jnp.concatenate([jnp.array([0.3, 0.3, 0.3]), jnp.ones(4)])
        act_lo = -jnp.ones(9) if self.normalize_action else self.action_lo
        act_hi = jnp.ones(9) if self.normalize_action else self.action_hi
        self.obs_lo = jnp.concatenate(
            [self.dof_lower, jnp.full(9, -MAX_VELOCITY), obj_lo, obj_lo, act_lo]
        )
        self.obs_hi = jnp.concatenate(
            [self.dof_upper, jnp.full(9, MAX_VELOCITY), obj_hi, obj_hi, act_hi]
        )

    # ---- goal sampling (difficulty levels, :927-980) -------------------
    def _sample_goal(self, key):
        kxy, kz, kq = jax.random.split(key, 3)
        r = ARENA_RADIUS * jnp.sqrt(jax.random.uniform(kxy, ()))
        th = jax.random.uniform(kxy, (), minval=-jnp.pi, maxval=jnp.pi)
        xy = jnp.stack([r * jnp.cos(th), r * jnp.sin(th)])
        if self.task_difficulty == 1:
            pos = jnp.concatenate([xy, jnp.array([OBJ_SIZE / 2])])
            quat = jnp.array([0.0, 0, 0, 1])
        elif self.task_difficulty == 2:
            pos = jnp.array([0.0, 0.0, OBJ_SIZE / 2 + 0.05])
            quat = jnp.array([0.0, 0, 0, 1])
        elif self.task_difficulty == 3:
            z = jax.random.uniform(kz, (), minval=OBJ_SIZE, maxval=0.3)
            pos = jnp.concatenate([xy, z[None]])
            quat = jnp.array([0.0, 0, 0, 1])
        else:  # difficulty 4: random pose incl. orientation
            z = jax.random.uniform(kz, (), minval=OBJ_SIZE, maxval=0.3)
            pos = jnp.concatenate([xy, z[None]])
            u = jax.random.uniform(kq, (2,), minval=-1.0, maxval=1.0)
            quat = maths.quat_mul(
                maths.quat_from_angle_axis(u[0] * jnp.pi, jnp.array([1.0, 0, 0])),
                maths.quat_from_angle_axis(u[1] * jnp.pi, jnp.array([0.0, 1, 0])),
            )
        return jnp.concatenate([pos, quat])

    def sample_init(self, rng):
        m = self.model
        kd, kv, ko, kg = jax.random.split(rng, 4)
        dof = self.default_dof + 0.03 * jax.random.normal(kd, (9,))
        dof = jnp.clip(dof, self.dof_lower, self.dof_upper)
        q = m.qpos0.at[self.q_idx].set(dof)
        qd = jnp.zeros(m.nv)
        # object: random yaw pose on the table (:900-925 'random' type)
        kxy, kyaw = jax.random.split(ko)
        r = ARENA_RADIUS * jnp.sqrt(jax.random.uniform(kxy, ()))
        th = jax.random.uniform(kxy, (), minval=-jnp.pi, maxval=jnp.pi)
        yaw = jax.random.uniform(kyaw, (), minval=-jnp.pi, maxval=jnp.pi)
        pos = jnp.array([r * jnp.cos(th), r * jnp.sin(th), OBJ_SIZE / 2])
        quat = maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1]))
        q = q.at[self.oq : self.oq + 3].set(pos)
        q = q.at[self.oq + 3 : self.oq + 7].set(quat)
        goal = self._sample_goal(kg)
        tip0 = jnp.zeros((3, 3))
        return q, qd, {
            "goal": goal,
            "last_tips": tip0,
            "last_obj": pos,
            "success": jnp.zeros(()),
            "success_pos": jnp.zeros(()),
            "success_rot": jnp.zeros(()),
        }

    # ---- control (reference _apply... :1000-1043) -----------------------
    def compute_force(self, action, q, qd, task):
        """torque mode: actions ARE joint torques; position mode: PD to
        the commanded joint positions -- both saturated to +/-0.36 Nm,
        then safety-damped and saturated AGAIN (reference :1027-1041)."""
        m = self.model
        if self.normalize_action:
            cmd = self.action_lo + (action + 1.0) * 0.5 * (
                self.action_hi - self.action_lo
            )
        else:
            cmd = action
        qj = q[self.q_idx]
        uj = qd[self.v_idx]
        if self.command_mode == "position":
            tau = jnp.asarray(STIFFNESS) * (cmd - qj) - jnp.asarray(DAMPING) * uj
        else:
            tau = cmd
        tau = jnp.clip(tau, -MAX_TORQUE, MAX_TORQUE)
        if self.apply_safety_damping:
            tau = tau - jnp.asarray(SAFETY_DAMPING) * uj
            tau = jnp.clip(tau, -MAX_TORQUE, MAX_TORQUE)
        qfrc = jnp.zeros(m.nv).at[self.v_idx].set(tau)
        return qfrc, jnp.zeros((m.nbody, 6))

    # ---- observations ---------------------------------------------------
    def obs_spec(self):
        """Named observation slices from OBS_SPEC (the reference's
        per-component MDP spec, __configure_mdp_spaces :592-660) for the
        dict-obs API (obs_dict/step_dict/observation_dict_space)."""
        spec, off = {}, 0
        for name, n in self.OBS_SPEC.items():
            spec[name] = (off, n)
            off += n
        return spec

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        obs = jnp.concatenate(
            [
                q[self.q_idx],
                qd[self.v_idx],
                q[self.oq : self.oq + 7],
                task["goal"],
                actions,
            ]
        )
        if self.normalize_obs:
            # scale_transform to [-1, 1] per component (reference :775-781)
            obs = 2.0 * (obs - self.obs_lo) / (self.obs_hi - self.obs_lo) - 1.0
        return obs

    def observe_state(self, q, qd, kin, sensors, task, actions, progress):
        tips = self.tip_bodies
        tip_state = jnp.concatenate(
            [
                kin.x[tips],
                kin.quat[tips],
                kin.v[tips, 3:] + jnp.cross(kin.v[tips, :3], kin.x[tips]),
                kin.v[tips, :3],
            ],
            axis=-1,
        ).reshape(-1)
        wrench = jnp.concatenate(
            [sensors.body_force[tips], sensors.body_torque[tips]], axis=-1
        ).reshape(-1)
        return jnp.concatenate(
            [
                self.observe(q, qd, kin, sensors, task, actions, progress),
                qd[self.ov : self.ov + 6],
                tip_state,
                sensors.dof_force[self.v_idx],
                wrench,
            ]
        )

    # ---- reward (keypoints + finger shaping, :1090-1160) ---------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        obj_pos = q[self.oq : self.oq + 3]
        obj_quat = q[self.oq + 3 : self.oq + 7]
        goal = task["goal"]
        tips = kin.x[self.tip_bodies]

        tip_vel = (tips - task["last_tips"]) / self.dt
        move_pen = self.finger_move_penalty_weight * jnp.sum(tip_vel**2)

        curr = jnp.linalg.norm(tips - obj_pos[None, :], axis=-1)
        prev = jnp.linalg.norm(
            task["last_tips"] - task["last_obj"][None, :], axis=-1
        )
        reach = self.finger_reach_object_weight * jnp.sum(curr - prev)

        kp_obj = gen_keypoints(obj_pos, obj_quat)
        kp_goal = gen_keypoints(goal[:3], goal[3:7])
        dist = jnp.linalg.norm(kp_obj - kp_goal, axis=-1)
        scaled = dist * 30.0
        kernel = 1.0 / (jnp.exp(scaled) + 2.0 + jnp.exp(-scaled))
        pose_reward = self.object_dist_weight * self.dt * jnp.mean(kernel)

        reward = move_pen + reach + pose_reward
        done = progress >= self.max_episode_length - 1
        # success stats per difficulty (reference _check_termination
        # :1070-1096): position within tolerance; difficulty 4 also
        # orientation within tolerance
        pos_ok = jnp.linalg.norm(obj_pos - goal[:3]) <= self.position_tolerance
        dq = maths.quat_mul(obj_quat, maths.quat_conjugate(goal[3:7]))
        ang = 2.0 * jnp.arcsin(
            jnp.clip(jnp.linalg.norm(dq[:3]), 0.0, 1.0)
        )
        rot_ok = ang <= self.orientation_tolerance
        success = pos_ok & rot_ok if self.task_difficulty == 4 else pos_ok
        new_task = {
            "goal": goal,
            "last_tips": tips,
            "last_obj": obj_pos,
            "success": success.astype(jnp.float32),
            "success_pos": pos_ok.astype(jnp.float32),
            "success_rot": rot_ok.astype(jnp.float32),
        }
        return reward, done, new_task

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        return {
            "successes": task["success"],
            "successes_pos": task["success_pos"],
            "successes_quat": task["success_rot"],
        }

    def true_objective(self, q, qd):
        return -jnp.linalg.norm(q[self.oq : self.oq + 3])
