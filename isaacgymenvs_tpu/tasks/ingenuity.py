"""Ingenuity: Mars-helicopter target chasing with direct rotor thrust.

Parity target: reference isaacgymenvs/tasks/ingenuity.py (procedural model
:125-235 -- chassis box + two rotor discs; Mars gravity :114-117; LOCAL-
space thrust vectors :262-292 apply_rigid_body_force_tensors; moving
target resampled every 500 steps :296-307; obs :318-323; reward
compute_ingenuity_reward :350-380) and cfg/task/Ingenuity.yaml.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..envcore.vec_task import VecTask
from ..model.spec import (
    FIXED,
    FREE,
    GEOM_BOX,
    GEOM_CYLINDER,
    ModelBuilder,
    box_inertia,
    cylinder_inertia,
)


class Ingenuity(VecTask):
    def __init__(self, cfg):
        env = cfg["env"]
        env.setdefault("episodeLength", int(env.get("maxEpisodeLength", 2000)))
        cfg.setdefault("sim", {}).setdefault("gravity", [0.0, 0.0, -3.721])
        self.thrust_upper_limit = 2000.0
        self.thrust_lateral_component = 0.2
        self.num_obs = 13
        self.num_acts = 6
        super().__init__(cfg)

    def build_model(self):
        # dimensions from the reference's procedural MJCF (ingenuity.py:126-130)
        chassis_size = 0.06
        rotor_radius = 0.15
        rotor_thickness = 0.01

        b = ModelBuilder()
        m_ch, i_ch = box_inertia(50.0, (chassis_size, chassis_size, chassis_size))
        chassis = b.add_body(
            parent=-1, name="chassis", pos=(0, 0, 0), quat=(0, 0, 0, 1),
            jnt_type=FREE, mass=m_ch, inertia=i_ch,
        )
        b.qpos0_free[chassis] = (
            np.array([0, 0, 1.0], np.float32),
            np.array([0, 0, 0, 1], np.float32),
        )
        b.add_geom(
            chassis, GEOM_BOX, (0, 0, 0), (0, 0, 0, 1),
            (chassis_size, chassis_size, chassis_size), 1.0,
        )
        m_r, i_r = cylinder_inertia(1000.0, rotor_radius, 0.5 * rotor_thickness)
        self.rotor_bodies = []
        for i in range(2):
            # zero-range hinges in the reference -> welded here
            rotor = b.add_body(
                parent=chassis, name=f"rotor_physics_{i}",
                pos=(0, 0, 0.025 * i), quat=(0, 0, 0, 1),
                jnt_type=FIXED, mass=m_r, inertia=i_r,
            )
            b.add_geom(
                rotor, GEOM_CYLINDER, (0, 0, 0), (0, 0, 0, 1),
                (rotor_radius, 0.5 * rotor_thickness, 0), 1.0,
            )
            self.rotor_bodies.append(rotor)
        self.rotor_offsets = np.array([[0, 0, 0.0], [0, 0, 0.025]], np.float32)
        return b.finalize(), self.sim_params_from_cfg()

    def _sample_target(self, key):
        kx, kz = jax.random.split(key)
        xy = jax.random.uniform(kx, (2,), minval=-5.0, maxval=5.0)
        z = jax.random.uniform(kz, (), minval=1.0, maxval=2.0)
        return jnp.concatenate([xy, z[None]])

    def sample_init(self, rng):
        m = self.model
        kp, kt, kkeep = jax.random.split(rng, 3)
        dp = jax.random.uniform(
            kp, (3,),
            minval=jnp.array([-1.5, -1.5, -0.2]),
            maxval=jnp.array([1.5, 1.5, 1.5]),
        )
        q = m.qpos0.at[0:3].add(dp)
        qd = jnp.zeros(m.nv)
        target = self._sample_target(kt)
        # task state: (target (3,), per-env key for mid-episode resampling)
        return q, qd, (target, kkeep)

    def compute_force(self, action, q, qd, task):
        m = self.model
        # thrust vectors in chassis LOCAL space (ingenuity.py:275-292)
        scale = 2000.0
        v0 = jnp.clip(action[2] * scale, -self.thrust_upper_limit, self.thrust_upper_limit)
        v1 = jnp.clip(action[5] * scale, -self.thrust_upper_limit, self.thrust_upper_limit)
        lat0 = jnp.clip(action[0:2], -self.thrust_lateral_component, self.thrust_lateral_component)
        lat1 = jnp.clip(action[3:5], -self.thrust_lateral_component, self.thrust_lateral_component)
        t0 = self.dt * v0
        t1 = self.dt * v1
        f0_local = jnp.concatenate([t0 * lat0, t0[None]])
        f1_local = jnp.concatenate([t1 * lat1, t1[None]])

        root_pos, root_quat = q[0:3], q[3:7]
        xfrc = jnp.zeros((m.nbody, 6))
        for i, (body, f_local) in enumerate(
            zip(self.rotor_bodies, (f0_local, f1_local))
        ):
            f_w = maths.quat_rotate(root_quat, f_local)
            x_b = root_pos + maths.quat_rotate(
                root_quat, jnp.asarray(self.rotor_offsets[i])
            )
            xfrc = xfrc.at[body].set(
                jnp.concatenate([jnp.cross(x_b, f_w), f_w])
            )
        return jnp.zeros(m.nv), xfrc

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        target, _ = task
        return jnp.concatenate(
            [
                (target - q[0:3]) / 3.0,
                q[3:7],
                qd[0:3] / 2.0,
                qd[3:6] / jnp.pi,
            ]
        )

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        target, key = task
        root_pos = q[0:3]
        target_dist = jnp.linalg.norm(target - root_pos)
        pos_reward = 1.0 / (1.0 + target_dist * target_dist)
        ups = maths.quat_axis(q[3:7], 2)
        tiltage = jnp.abs(1.0 - ups[2])
        up_reward = 5.0 / (1.0 + tiltage * tiltage)
        spinnage = jnp.abs(qd[5])
        spinnage_reward = 1.0 / (1.0 + spinnage * spinnage)
        reward = pos_reward + pos_reward * (up_reward + spinnage_reward)

        die = (target_dist > 8.0) | (root_pos[2] < 0.5)
        done = die | (progress >= self.max_episode_length - 1)

        # target resampled every 500 steps mid-episode (ingenuity.py:296-300)
        resample = (progress % 500 == 0) & (progress > 0)
        new_target = self._sample_target(jax.random.fold_in(key, progress))
        target = jnp.where(resample, new_target, target)
        return reward, done, (target, key)
