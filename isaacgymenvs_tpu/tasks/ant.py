"""Ant locomotion.

Parity target: reference isaacgymenvs/tasks/ant.py (obs layout
compute_ant_observations :375-408, reward compute_ant_reward :325-372, reset
sampling :255-262, effort control :281-285, start pose z=0.44 :163-164,
foot force sensors :171-178) and cfg/task/Ant.yaml.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..envcore.vec_task import VecTask
from ..model import load_mjcf
from ..utils.assets import asset_path


class Ant(VecTask):
    def __init__(self, cfg):
        env = cfg["env"]
        self.power_scale = float(env.get("powerScale", 1.0))
        self.dof_vel_scale = float(env.get("dofVelocityScale", 0.2))
        self.contact_force_scale = float(env.get("contactForceScale", 0.1))
        self.heading_weight = float(env.get("headingWeight", 0.5))
        self.up_weight = float(env.get("upWeight", 0.1))
        self.actions_cost_scale = float(env.get("actionsCost", 0.005))
        self.energy_cost_scale = float(env.get("energyCost", 0.05))
        self.joints_at_limit_cost_scale = float(env.get("jointsAtLimitCost", 0.1))
        self.death_cost = float(env.get("deathCost", -2.0))
        self.termination_height = float(env.get("terminationHeight", 0.31))
        self.start_height = 0.44  # reference ant.py:164
        env.setdefault("episodeLength", 1000)
        self.num_obs = 60
        self.num_acts = 8
        super().__init__(cfg)
        m = self.model
        self.dof_idx = jnp.asarray(self.scalar_dof_indices)  # 8 hinge dofs
        sq = np.asarray(
            [m.q_adr[m.dof_body[d]] for d in self.scalar_dof_indices]
        )
        self.dof_q_idx = jnp.asarray(sq)
        lo = np.asarray(m.dof_limit_lower)[self.scalar_dof_indices]
        hi = np.asarray(m.dof_limit_upper)[self.scalar_dof_indices]
        self.dof_lower = jnp.asarray(lo)
        self.dof_upper = jnp.asarray(hi)
        # initial dof pos: 0 unless the limit range excludes 0 (ant.py:97-100)
        init = np.where(lo > 0.0, lo, np.where(hi < 0.0, hi, 0.0))
        self.initial_dof_pos = jnp.asarray(init, jnp.float32)
        self.feet = jnp.asarray(
            [i for i, n in enumerate(m.body_names) if "foot" in n]
        )
        self.targets = jnp.array([1000.0, 0.0, 0.0])

    def build_model(self):
        asset = self.cfg["env"].get("asset", {}).get("assetFileName", "mjcf/nv_ant.xml")
        return load_mjcf(asset_path(asset)), self.sim_params_from_cfg()

    # ---- init / reset ---------------------------------------------------
    def sample_init(self, rng):
        kq, kv = jax.random.split(rng)
        m = self.model
        dq = jax.random.uniform(kq, (8,), minval=-0.2, maxval=0.2)
        dof_pos = jnp.clip(self.initial_dof_pos + dq, self.dof_lower, self.dof_upper)
        dof_vel = jax.random.uniform(kv, (8,), minval=-0.1, maxval=0.1)
        q = m.qpos0
        q = q.at[2].set(self.start_height)  # root z (start pose)
        q = q.at[self.dof_q_idx].set(dof_pos)
        qd = jnp.zeros(m.nv).at[self.dof_idx].set(dof_vel)
        to_target = self.targets.at[2].set(0.0) - q[:3].at[2].set(0.0)
        potential = -jnp.linalg.norm(to_target) / self.dt
        # task state: (potentials, prev_potentials) (ant.py:114-115, 265-268)
        return q, qd, (potential, potential)

    # ---- control --------------------------------------------------------
    def compute_force(self, action, q, qd, task):
        qfrc = self.qfrc_from_actuators(action * self.power_scale)
        return qfrc, jnp.zeros((self.model.nbody, 6))

    # ---- observations ---------------------------------------------------
    def observe(self, q, qd, kin, sensors, task, actions, progress):
        torso_pos = q[0:3]
        torso_rot = q[3:7]
        velocity = qd[0:3]
        ang_velocity = qd[3:6]
        potentials, _ = task

        to_target = (self.targets - torso_pos).at[2].set(0.0)

        # start rotation is identity so inv_start_rot is identity (ant.py:105)
        up_proj = maths.quat_rotate(torso_rot, jnp.array([0.0, 0.0, 1.0]))[2]
        heading_vec = maths.quat_rotate(torso_rot, jnp.array([1.0, 0.0, 0.0]))
        heading_proj = jnp.dot(heading_vec, maths.normalize(to_target))

        vel_loc = maths.quat_rotate_inverse(torso_rot, velocity)
        angvel_loc = maths.quat_rotate_inverse(torso_rot, ang_velocity)
        roll, _, yaw = maths.get_euler_xyz(torso_rot)
        walk_target_angle = jnp.arctan2(
            self.targets[2] - torso_pos[2], self.targets[0] - torso_pos[0]
        )
        angle_to_target = walk_target_angle - yaw

        dof_pos = q[self.dof_q_idx]
        dof_vel = qd[self.dof_idx]
        dof_pos_scaled = maths.unscale(dof_pos, self.dof_lower, self.dof_upper)

        # foot force sensors: 6D wrench per foot (force, torque)
        sensor = jnp.concatenate(
            [sensors.body_force[self.feet], sensors.body_torque[self.feet]],
            axis=-1,
        ).reshape(-1)

        return jnp.concatenate(
            [
                torso_pos[2:3],
                vel_loc,
                angvel_loc,
                jnp.stack([
                    maths.normalize_angle(yaw),
                    maths.normalize_angle(roll),
                    maths.normalize_angle(angle_to_target),
                    up_proj,
                    heading_proj,
                ]),
                dof_pos_scaled,
                dof_vel * self.dof_vel_scale,
                sensor * self.contact_force_scale,
                actions,
            ]
        )

    # ---- reward ---------------------------------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        _, prev_from_last = task
        torso_pos = q[0:3]
        to_target = (self.targets - torso_pos).at[2].set(0.0)
        potentials = -jnp.linalg.norm(to_target) / self.dt
        prev_potentials = prev_from_last

        heading_proj = obs[11]
        up_proj = obs[10]
        heading_reward = jnp.where(
            heading_proj > 0.8,
            self.heading_weight,
            self.heading_weight * heading_proj / 0.8,
        )
        up_reward = jnp.where(up_proj > 0.93, self.up_weight, 0.0)

        actions_cost = jnp.sum(actions**2)
        electricity_cost = jnp.sum(jnp.abs(actions * obs[20:28]))
        dof_at_limit_cost = jnp.sum(obs[12:20] > 0.99)

        alive_reward = 0.5
        progress_reward = potentials - prev_potentials

        total = (
            progress_reward
            + alive_reward
            + up_reward
            + heading_reward
            - self.actions_cost_scale * actions_cost
            - self.energy_cost_scale * electricity_cost
            - dof_at_limit_cost * self.joints_at_limit_cost_scale
        )
        fallen = obs[0] < self.termination_height
        total = jnp.where(fallen, self.death_cost, total)
        done = fallen | (progress >= self.max_episode_length - 1)
        # task state advances: potentials roll forward (ant.py:392-393)
        return total, done, (potentials, potentials)

    def true_objective(self, q, qd):
        """Forward velocity -- PBT objective (reference ant.py:245-250)."""
        return qd[0]
