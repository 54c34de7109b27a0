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
ARENA_RADIUS = 0.195


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
    def __init__(self, cfg):
        env = cfg["env"]
        self.task_difficulty = int(env.get("task_difficulty", 4))
        self.asymmetric_obs = bool(env.get("asymmetric_obs", True))
        self.normalize_action = bool(env.get("normalize_action", True))
        self.apply_safety_damping = bool(env.get("apply_safety_damping", True))
        self.command_mode = str(env.get("command_mode", "torque"))
        rt = env.get("reward_terms", {})
        self.finger_move_penalty_weight = float(
            rt.get("finger_move_penalty", {}).get("weight", -0.05)
        )
        self.finger_reach_object_weight = float(
            rt.get("finger_reach_object_rate", {}).get("weight", -250.0)
        )
        self.object_dist_weight = float(
            rt.get("object_dist", {}).get("weight", 2000.0)
        )
        self.object_rot_weight = float(
            rt.get("object_rot", {}).get("weight", 300.0)
        )
        self.use_keypoints = bool(
            rt.get("keypoints_dist", {}).get("activate", True)
        )
        env.setdefault("episodeLength", 750)
        self.num_obs = 41
        self.num_states = 113 if self.asymmetric_obs else 0
        self.num_acts = 9
        super().__init__(cfg)
        self._setup()

    def build_model(self):
        robot = load_urdf(
            asset_path(
                "trifinger/robot_properties_fingers/urdf/pro/trifingerpro.urdf"
            ),
            fix_base=True,
        )
        # torque-mode dofs with safety damping (reference :315-320 applies
        # [0.08, 0.08, 0.04] per finger as velocity damping)
        damp = np.tile(np.array([0.08, 0.08, 0.04], np.float32), 3)
        robot = robot.replace(
            dof_damping=jnp.asarray(damp),
            dof_max_effort=jnp.full(robot.nv, MAX_TORQUE),
        )
        obj = _box_actor(
            "object", [OBJ_SIZE] * 3, 264.0, False, [0.0, 0.0, OBJ_SIZE / 2]
        )
        model, refs = compose([robot, obj], ["", "object:"])
        self.robot_ref, self.obj_ref = refs
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
        return q, qd, {"goal": goal, "last_tips": tip0, "last_obj": pos}

    # ---- control: normalized torques + safety damping ------------------
    def compute_force(self, action, q, qd, task):
        m = self.model
        tau = action * MAX_TORQUE if self.normalize_action else action
        tau = jnp.clip(tau, -MAX_TORQUE, MAX_TORQUE)
        qfrc = jnp.zeros(m.nv).at[self.v_idx].set(tau)
        return qfrc, jnp.zeros((m.nbody, 6))

    # ---- observations ---------------------------------------------------
    def observe(self, q, qd, kin, sensors, task, actions, progress):
        return jnp.concatenate(
            [
                q[self.q_idx],
                qd[self.v_idx],
                q[self.oq : self.oq + 7],
                task["goal"],
                actions,
            ]
        )

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
        new_task = {"goal": goal, "last_tips": tips, "last_obj": obj_pos}
        return reward, done, new_task

    def true_objective(self, q, qd):
        return -jnp.linalg.norm(q[self.oq : self.oq + 3])
