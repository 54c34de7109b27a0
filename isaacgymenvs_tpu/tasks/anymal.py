"""Anymal: velocity-command-tracking quadruped locomotion.

Parity target: reference isaacgymenvs/tasks/anymal.py (obs layout
compute_anymal_observations :307-340, reward compute_anymal_reward
:264-305 -- exp tracking terms + torque penalty, clipped at 0; PD position
drive Kp=85/Kd=2 :199-203; commands resampled per reset :246-250;
termination on base/knee contact :297-299) and cfg/task/Anymal.yaml.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..utils.assets import asset_path


class Anymal(VecTask):
    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg["env"]
        learn = env.get("learn", {})
        control = env.get("control", {})
        self.lin_vel_scale = float(learn.get("linearVelocityScale", 2.0))
        self.ang_vel_scale = float(learn.get("angularVelocityScale", 0.25))
        self.dof_pos_scale = float(learn.get("dofPositionScale", 1.0))
        self.dof_vel_scale = float(learn.get("dofVelocityScale", 0.05))
        self.rew_lin_vel_xy_scale = float(learn.get("linearVelocityXYRewardScale", 1.0))
        self.rew_ang_vel_z_scale = float(learn.get("angularVelocityZRewardScale", 0.5))
        self.rew_torque_scale = float(learn.get("torqueRewardScale", -0.000025))
        self.kp = float(control.get("stiffness", 85.0))
        self.kd = float(control.get("damping", 2.0))
        self.action_scale = float(control.get("actionScale", 0.5))
        cr = env.get("randomCommandVelocityRanges", {})
        self.cmd_x_range = tuple(cr.get("linear_x", (-2.0, 2.0)))
        self.cmd_y_range = tuple(cr.get("linear_y", (-1.0, 1.0)))
        self.cmd_yaw_range = tuple(cr.get("yaw", (-1.0, 1.0)))
        base_init = env.get("baseInitState", {})
        self.base_init_pos = np.asarray(base_init.get("pos", [0.0, 0.0, 0.62]))
        env.setdefault("controlFrequencyInv", int(control.get("controlFrequencyInv", 1)))
        dt = float(cfg.get("sim", {}).get("dt", 0.02))
        ep_s = float(learn.get("episodeLength_s", 50.0))
        env.setdefault(
            "episodeLength",
            int(ep_s / (dt * int(env.get("controlFrequencyInv", 1))) + 0.5),
        )
        self.num_obs = 48
        self.num_acts = 12
        super().__init__(cfg)

        m = self.model
        self.dof_idx = jnp.asarray(self.scalar_dof_indices)
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in self.scalar_dof_indices])
        self.dof_q_idx = jnp.asarray(sq)
        # default joint angles by NAME (cfg/task/Anymal.yaml defaultJointAngles)
        angles_cfg = env.get("defaultJointAngles", {})
        names = [m.joint_names[m.dof_body[d]] for d in self.scalar_dof_indices]
        self.default_dof_pos = jnp.asarray(
            [float(angles_cfg.get(n, 0.0)) for n in names], jnp.float32
        )
        # termination bodies: base + knees (THIGH), reference anymal.py:195-197
        self.base_body = 0
        self.knee_bodies = jnp.asarray(
            [i for i, n in enumerate(m.body_names) if "THIGH" in n]
        )

    def build_model(self):
        asset = self.cfg["env"].get("urdfAsset", {}).get(
            "file", "urdf/anymal_c/urdf/anymal.urdf"
        )
        # density 0.001 for inertial-free links (reference anymal.py:176)
        m = load_urdf(asset_path(asset), collapse_fixed=True, default_density=0.001)
        # PD drive gains as dof properties (reference anymal.py:199-203);
        # drive damping is integrated implicitly by the engine
        env = self.cfg["env"]
        control = env.get("control", {})
        kp = float(control.get("stiffness", 85.0))
        kd = float(control.get("damping", 2.0))
        nscalar = int(np.sum([t in (1, 2) for t in m.jnt_type]))
        stiff = np.zeros(m.nv, np.float32)
        damp = np.zeros(m.nv, np.float32)
        for i, t in enumerate(m.jnt_type):
            if t in (1, 2):
                stiff[m.v_adr[i]] = kp
                damp[m.v_adr[i]] = kd
        m = m.replace(
            dof_stiffness=jnp.asarray(stiff), dof_damping=jnp.asarray(damp)
        )
        m = self._prune_contact_points(m)
        return m, self.sim_params_from_cfg()

    @staticmethod
    def _prune_contact_points(m):
        """Keep ground-contact candidates that matter: feet spheres +
        knee/shank cylinders + the base chassis box. (The reference relies
        on PhysX broadphase; flat-ground locomotion only ever touches
        these.)"""
        from ..model.spec import GEOM_BOX, GEOM_SPHERE

        names = m.body_names
        keep = []
        per_body_kept: dict = {}
        for c in range(m.ncp):
            body = m.cpoint_body[c]
            n = names[body]
            r = float(m.cpoint_radius[c])
            kept = per_body_kept.get(body, 0)
            if "SHANK" in n and r > 0.0:
                keep.append(c)  # foot sphere
            elif "THIGH" in n and kept < 8:
                keep.append(c)  # knee cylinder (termination sensing)
                per_body_kept[body] = kept + 1
            elif body == 0 and kept < 8 and r == 0.0:
                keep.append(c)  # chassis box corners (termination sensing)
                per_body_kept[body] = kept + 1
        keep = np.asarray(keep)
        return m.replace(
            cpoint_body=tuple(m.cpoint_body[c] for c in keep),
            cpoint_pos=m.cpoint_pos[keep],
            cpoint_radius=m.cpoint_radius[keep],
            cpoint_friction=m.cpoint_friction[keep],
        )

    # ---- init / reset ---------------------------------------------------
    def sample_init(self, rng):
        kq, kv, kc = jax.random.split(rng, 3)
        m = self.model
        # dof_pos = default * U(0.5, 1.5), dof_vel ~ U(-0.1, 0.1)
        # (reference anymal.py:241-244)
        scale = jax.random.uniform(kq, (12,), minval=0.5, maxval=1.5)
        dof_pos = self.default_dof_pos * scale
        dof_vel = jax.random.uniform(kv, (12,), minval=-0.1, maxval=0.1)
        q = m.qpos0
        q = q.at[0:3].set(jnp.asarray(self.base_init_pos, jnp.float32))
        q = q.at[3:7].set(jnp.array([0.0, 0.0, 0.0, 1.0]))
        q = q.at[self.dof_q_idx].set(dof_pos)
        qd = jnp.zeros(m.nv).at[self.dof_idx].set(dof_vel)
        kx, ky, kw = jax.random.split(kc, 3)
        commands = jnp.stack(
            [
                jax.random.uniform(kx, (), minval=self.cmd_x_range[0], maxval=self.cmd_x_range[1]),
                jax.random.uniform(ky, (), minval=self.cmd_y_range[0], maxval=self.cmd_y_range[1]),
                jax.random.uniform(kw, (), minval=self.cmd_yaw_range[0], maxval=self.cmd_yaw_range[1]),
            ]
        )
        return q, qd, commands

    # ---- control: PD position targets -----------------------------------
    def compute_force(self, action, q, qd, task):
        targets = self.action_scale * action + self.default_dof_pos
        q_target = jnp.zeros(self.model.nq).at[self.dof_q_idx].set(targets)
        return (
            jnp.zeros(self.model.nv),
            jnp.zeros((self.model.nbody, 6)),
            q_target,
        )

    def _pd_torques(self, q, qd, actions):
        targets = self.action_scale * actions + self.default_dof_pos
        return self.kp * (targets - q[self.dof_q_idx]) - self.kd * qd[self.dof_idx]

    # ---- observations ---------------------------------------------------
    def observe(self, q, qd, kin, sensors, task, actions, progress):
        base_quat = q[3:7]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, qd[0:3]) * self.lin_vel_scale
        base_ang_vel = maths.quat_rotate_inverse(base_quat, qd[3:6]) * self.ang_vel_scale
        projected_gravity = maths.quat_rotate_inverse(
            base_quat, jnp.array([0.0, 0.0, -1.0])
        )
        dof_pos_scaled = (q[self.dof_q_idx] - self.default_dof_pos) * self.dof_pos_scale
        commands_scaled = task * jnp.array(
            [self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale]
        )
        return jnp.concatenate(
            [
                base_lin_vel,
                base_ang_vel,
                projected_gravity,
                commands_scaled,
                dof_pos_scaled,
                qd[self.dof_idx] * self.dof_vel_scale,
                actions,
            ]
        )

    # ---- reward ---------------------------------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        base_quat = q[3:7]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, qd[0:3])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, qd[3:6])
        commands = task

        lin_vel_error = jnp.sum(jnp.square(commands[:2] - base_lin_vel[:2]))
        ang_vel_error = jnp.square(commands[2] - base_ang_vel[2])
        rew_lin = jnp.exp(-lin_vel_error / 0.25) * self.rew_lin_vel_xy_scale
        rew_ang = jnp.exp(-ang_vel_error / 0.25) * self.rew_ang_vel_z_scale
        torques = self._pd_torques(q, qd, actions)
        rew_torque = jnp.sum(jnp.square(torques)) * self.rew_torque_scale
        total = jnp.maximum(rew_lin + rew_ang + rew_torque, 0.0)

        # termination: base or knee ground contact force > 1 N
        # (reference anymal.py:297-299)
        base_hit = jnp.linalg.norm(sensors.body_force[self.base_body]) > 1.0
        knee_hit = jnp.any(
            jnp.linalg.norm(sensors.body_force[self.knee_bodies], axis=-1) > 1.0
        )
        done = base_hit | knee_hit | (progress >= self.max_episode_length - 1)
        return total, done, commands

    def true_objective(self, q, qd):
        return qd[0]
