"""Quadcopter: hover at a fixed target with tiltable rotors.

Parity target: reference isaacgymenvs/tasks/quadcopter.py (procedural
model :120-203 -- chassis disc + 4 arms with pitch/roll-tilting rotors;
PD dof targets stiffness 1000 :247-248; integrated dof-target + thrust
actions :305-321; LOCAL-space rotor thrust; obs :355-366; reward
compute_quadcopter_reward :385-420) and cfg/task/Quadcopter.yaml.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..envcore.vec_task import VecTask
from ..model.spec import (
    FREE,
    GEOM_CYLINDER,
    GEOM_SPHERE,
    HINGE,
    ModelBuilder,
    cylinder_inertia,
    sphere_inertia,
)


def _axis_angle_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    s = math.sin(angle / 2)
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s, math.cos(angle / 2)])


class Quadcopter(VecTask):
    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg["env"]
        env.setdefault("episodeLength", int(env.get("maxEpisodeLength", 500)))
        self.max_thrust = 2.0
        self.num_obs = 21
        self.num_acts = 12
        super().__init__(cfg)

    def build_model(self):
        chassis_radius = 0.1
        chassis_thickness = 0.03
        rotor_radius = 0.04
        rotor_thickness = 0.01
        rotor_arm_radius = 0.01

        b = ModelBuilder()
        m_ch, i_ch = cylinder_inertia(50.0, chassis_radius, 0.5 * chassis_thickness)
        chassis = b.add_body(
            parent=-1, name="chassis", pos=(0, 0, 0), quat=(0, 0, 0, 1),
            jnt_type=FREE, mass=m_ch, inertia=i_ch,
        )
        b.qpos0_free[chassis] = (
            np.array([0, 0, 1.0], np.float32),
            np.array([0, 0, 0, 1], np.float32),
        )
        b.add_geom(
            chassis, GEOM_CYLINDER, (0, 0, 0), (0, 0, 0, 1),
            (chassis_radius, 0.5 * chassis_thickness, 0), 1.0,
        )

        m_arm, i_arm = sphere_inertia(200.0, rotor_arm_radius)
        m_rot, i_rot = cylinder_inertia(1000.0, rotor_radius, 0.5 * rotor_thickness)
        deg30 = math.radians(30.0)
        self.rotor_bodies = []
        rotor_angles = [0.25 * math.pi, 0.75 * math.pi, 1.25 * math.pi, 1.75 * math.pi]
        arm_offset = chassis_radius + 0.25 * rotor_arm_radius
        rotor_offset = rotor_radius + 0.25 * rotor_arm_radius
        for i, angle in enumerate(rotor_angles):
            arm_quat = _axis_angle_quat((0, 0, 1), angle)
            arm_pos = np.array(
                [arm_offset * math.cos(angle), arm_offset * math.sin(angle), 0.0]
            )
            arm = b.add_body(
                parent=chassis, name=f"rotor_arm{i}",
                pos=arm_pos, quat=arm_quat,
                jnt_type=HINGE, jnt_axis=(0, 1, 0), jnt_pos=(0, 0, 0),
                joint_name=f"rotor_pitch{i}",
                mass=m_arm, inertia=i_arm,
                limit=(-deg30, deg30),
                stiffness=1000.0, damping=0.0,  # quadcopter.py:247-248
            )
            b.add_geom(
                arm, GEOM_SPHERE, (0, 0, 0), (0, 0, 0, 1),
                (rotor_arm_radius, 0, 0), 1.0,
            )
            rotor = b.add_body(
                parent=arm, name=f"rotor{i}",
                pos=(rotor_offset, 0, 0), quat=(0, 0, 0, 1),
                jnt_type=HINGE, jnt_axis=(1, 0, 0), jnt_pos=(0, 0, 0),
                joint_name=f"rotor_roll{i}",
                mass=m_rot, inertia=i_rot,
                limit=(-deg30, deg30),
                stiffness=1000.0, damping=0.0,
            )
            b.add_geom(
                rotor, GEOM_CYLINDER, (0, 0, 0), (0, 0, 0, 1),
                (rotor_radius, 0.5 * rotor_thickness, 0), 1.0,
            )
            self.rotor_bodies.append(rotor)

        model = b.finalize()
        self.dof_lower = jnp.asarray(
            np.asarray(model.dof_limit_lower)[self.scalar_dof_indices_of(model)]
        )
        self.dof_upper = jnp.asarray(
            np.asarray(model.dof_limit_upper)[self.scalar_dof_indices_of(model)]
        )
        return model, self.sim_params_from_cfg()

    @staticmethod
    def scalar_dof_indices_of(model):
        from ..engine import dynamics as _dyn

        sq = np.asarray(_dyn.scalar_dof_q_adr(model))
        return np.where(sq >= 0)[0]

    def sample_init(self, rng):
        m = self.model
        kp, kd = jax.random.split(rng)
        dp = jax.random.uniform(
            kp, (3,),
            minval=jnp.array([-1.5, -1.5, -0.2]),
            maxval=jnp.array([1.5, 1.5, 1.5]),
        )
        q = m.qpos0.at[0:3].add(dp)
        sdofs = self.scalar_dof_indices
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        dof_pos = jax.random.uniform(kd, (8,), minval=-0.2, maxval=0.2)
        q = q.at[jnp.asarray(sq)].set(dof_pos)
        qd = jnp.zeros(m.nv)
        # task: (dof targets (8,), thrusts (4,)) -- both integrated
        return q, qd, (dof_pos, jnp.zeros(4))

    def _integrate_targets(self, task, action):
        targets, thrusts = task
        targets = jnp.clip(
            targets + self.dt * 8.0 * jnp.pi * action[0:8],
            self.dof_lower, self.dof_upper,
        )
        thrusts = jnp.clip(
            thrusts + self.dt * 200.0 * action[8:12], 0.0, self.max_thrust
        )
        return targets, thrusts

    def compute_force(self, action, q, qd, task):
        m = self.model
        targets, thrusts = self._integrate_targets(task, action)
        sdofs = self.scalar_dof_indices
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        q_target = jnp.zeros(m.nq).at[jnp.asarray(sq)].set(targets)
        # thrust along each rotor's LOCAL z: needs rotor orientation -> FK
        from ..engine import dynamics as _dyn

        kin = _dyn.forward_kinematics(m, q, qd)
        xfrc = jnp.zeros((m.nbody, 6))
        for i, body in enumerate(self.rotor_bodies):
            f_w = maths.quat_rotate(
                kin.quat[body], jnp.array([0.0, 0.0, 1.0])
            ) * thrusts[i]
            x_b = kin.x[body]
            xfrc = xfrc.at[body].set(jnp.concatenate([jnp.cross(x_b, f_w), f_w]))
        return jnp.zeros(m.nv), xfrc, q_target

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        m = self.model
        sdofs = jnp.asarray(self.scalar_dof_indices)
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in self.scalar_dof_indices])
        target = jnp.array([0.0, 0.0, 1.0])
        return jnp.concatenate(
            [
                (target - q[0:3]) / 3.0,
                q[3:7],
                qd[0:3] / 2.0,
                qd[3:6] / jnp.pi,
                q[jnp.asarray(sq)],
            ]
        )

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        root_pos = q[0:3]
        target_dist = jnp.sqrt(
            root_pos[0] ** 2 + root_pos[1] ** 2 + (1.0 - root_pos[2]) ** 2
        )
        pos_reward = 1.0 / (1.0 + target_dist * target_dist)
        ups = maths.quat_axis(q[3:7], 2)
        tiltage = jnp.abs(1.0 - ups[2])
        up_reward = 1.0 / (1.0 + tiltage * tiltage)
        spinnage = jnp.abs(qd[5])
        spinnage_reward = 1.0 / (1.0 + spinnage * spinnage)
        reward = pos_reward + pos_reward * (up_reward + spinnage_reward)

        die = (target_dist > 3.0) | (root_pos[2] < 0.3)
        done = die | (progress >= self.max_episode_length - 1)
        return reward, done, self._integrate_targets(task, actions)
