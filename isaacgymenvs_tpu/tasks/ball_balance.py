"""BallBalance: keep a ball centered on a tray driven by three legs.

Parity target: reference isaacgymenvs/tasks/ball_balance.py (procedural
balance-bot model :136-224, tray force sensors :265-271, foot attractors
:305-320, velocity-integrated PD position targets :409-425, obs layout
:336-351, reward/reset compute_bbot_reward :459-476) and
cfg/task/BallBalance.yaml.

Model construction is procedural (ModelBuilder, mirroring the reference's
runtime-written MJCF): a free-floating tray on three 2-segment legs whose
feet are pinned to the ground by bilateral point anchors, plus a free ball
interacting with the tray through a declared sphere-vs-cylinder contact
pair.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..envcore.vec_task import VecTask
from ..model.spec import (
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_SPHERE,
    FREE,
    HINGE,
    ModelBuilder,
    capsule_inertia,
    cylinder_inertia,
    sphere_inertia,
)


def _euler_zyx_quat(roll, pitch, yaw):
    """gymapi.Quat.from_euler_zyx equivalent (xyzw)."""
    cy, sy = math.cos(yaw / 2), math.sin(yaw / 2)
    cp, sp = math.cos(pitch / 2), math.sin(pitch / 2)
    cr, sr = math.cos(roll / 2), math.sin(roll / 2)
    return np.array(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ]
    )


class BallBalance(VecTask):
    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg["env"]
        self.action_speed_scale = float(env.get("actionSpeedScale", 20.0))
        env.setdefault("episodeLength", int(env.get("maxEpisodeLength", 500)))
        self.ball_radius = 0.1  # reference ball_balance.py:274
        self.num_obs = 24
        self.num_acts = 3
        super().__init__(cfg)

    def build_model(self):
        # dimensions exactly as the reference's procedural asset
        # (ball_balance.py:138-146)
        tray_radius = 0.5
        tray_thickness = 0.02
        leg_radius = 0.02
        leg_outer_offset = tray_radius - 0.1
        leg_length = leg_outer_offset - 2 * leg_radius
        leg_inner_offset = leg_outer_offset - leg_length / math.sqrt(2)
        tray_height = leg_length * math.sqrt(2) + 2 * leg_radius + 0.5 * tray_thickness
        self.tray_height = tray_height
        self.leg_length = leg_length
        self.leg_outer_offset = leg_outer_offset
        self.leg_angles = [0.0, 2.0 / 3.0 * math.pi, 4.0 / 3.0 * math.pi]

        b = ModelBuilder()
        m_tray, i_tray = cylinder_inertia(100.0, tray_radius, 0.5 * tray_thickness)
        tray = b.add_body(
            parent=-1,
            name="tray",
            pos=(0, 0, 0),
            quat=(0, 0, 0, 1),
            jnt_type=FREE,
            mass=m_tray,
            inertia=i_tray,
        )
        b.qpos0_free[tray] = (
            np.array([0, 0, tray_height], np.float32),
            np.array([0, 0, 0, 1], np.float32),
        )
        b.add_geom(
            tray, GEOM_CYLINDER, (0, 0, 0), (0, 0, 0, 1),
            (tray_radius, 0.5 * tray_thickness, 0), 1.0,
        )

        m_leg, i_leg = capsule_inertia(1000.0, leg_radius, 0.5 * leg_length)
        lower_legs = []
        for i, angle in enumerate(self.leg_angles):
            # upper leg: capsule along local z, hinged to the tray
            uf = np.array(
                [
                    leg_outer_offset * math.cos(angle),
                    leg_outer_offset * math.sin(angle),
                    -leg_radius - 0.5 * tray_thickness,
                ]
            )
            ut = np.array(
                [
                    leg_inner_offset * math.cos(angle),
                    leg_inner_offset * math.sin(angle),
                    uf[2] - leg_length / math.sqrt(2),
                ]
            )
            upos = 0.5 * (uf + ut)
            uquat = _euler_zyx_quat(0.0, -0.75 * math.pi, angle)
            upper = b.add_body(
                parent=tray,
                name=f"upper_leg{i}",
                pos=upos,
                quat=uquat,
                jnt_type=HINGE,
                jnt_axis=(0, 1, 0),
                jnt_pos=(0, 0, -0.5 * leg_length),
                joint_name=f"upper_leg_joint{i}",
                mass=m_leg,
                inertia=i_leg,
                limit=(-math.radians(45), math.radians(45)),
            )
            b.add_geom(
                upper, GEOM_CAPSULE, (0, 0, 0), (0, 0, 0, 1),
                (leg_radius, 0.5 * leg_length, 0), 1.0,
            )
            lower = b.add_body(
                parent=upper,
                name=f"lower_leg{i}",
                pos=(-0.5 * leg_length, 0, 0.5 * leg_length),
                quat=_euler_zyx_quat(0.0, -0.5 * math.pi, 0.0),
                jnt_type=HINGE,
                jnt_axis=(0, 1, 0),
                jnt_pos=(0, 0, -0.5 * leg_length),
                joint_name=f"lower_leg_joint{i}",
                mass=m_leg,
                inertia=i_leg,
                limit=(-math.radians(70), math.radians(90)),
                stiffness=4000.0,  # PD drive gains (ball_balance.py:293-295)
                damping=100.0,
            )
            b.add_geom(
                lower, GEOM_CAPSULE, (0, 0, 0), (0, 0, 0, 1),
                (leg_radius, 0.5 * leg_length, 0), 1.0,
            )
            lower_legs.append(lower)

        m_ball, i_ball = sphere_inertia(200.0, self.ball_radius)
        ball = b.add_body(
            parent=-1,
            name="ball",
            pos=(0, 0, 0),
            quat=(0, 0, 0, 1),
            jnt_type=FREE,
            mass=m_ball,
            inertia=i_ball,
        )
        b.qpos0_free[ball] = (
            np.array([0.2, 0, 2.0], np.float32),
            np.array([0, 0, 0, 1], np.float32),
        )
        b.add_geom(
            ball, GEOM_SPHERE, (0, 0, 0), (0, 0, 0, 1),
            (self.ball_radius, 0, 0), 1.0,
        )

        model = b.finalize()
        self.tray_body = tray
        self.ball_body = ball
        ball_q = model.q_adr[ball]
        self.ball_q = ball_q

        # ball-vs-tray contact: the sphere's center candidate point vs the
        # tray cylinder as a POINT-pair (same narrowphase as the sphere
        # geom-pair in contacts.py source 2, but ppair rows are covered by
        # the fused whole-step kernel -- engine/fused.py cylinder branch)
        tray_geom = model.geom_body.index(tray)
        ball_cp = model.cpoint_body.index(ball)
        # foot anchors: attractors pinning lower-leg tips to the ground
        # (reference ball_balance.py:305-320)
        att_body = tuple(lower_legs)
        att_offset = np.tile(
            np.array([0, 0, 0.5 * leg_length], np.float32), (3, 1)
        )
        att_target = np.stack(
            [
                np.array(
                    [
                        leg_outer_offset * math.cos(a),
                        leg_outer_offset * math.sin(a),
                        leg_radius,
                    ],
                    np.float32,
                )
                for a in self.leg_angles
            ]
        )
        model = model.replace(
            ppair_point=(ball_cp,),
            ppair_geom=(tray_geom,),
            att_body=att_body,
            att_offset=jnp.asarray(att_offset),
            att_target=jnp.asarray(att_target),
        )
        return model, self.sim_params_from_cfg()

    # dof layout: scalar dofs [u0, l0, u1, l1, u2, l2]; actuated = lowers
    @property
    def _actuated(self):
        return np.array([1, 3, 5])

    def sample_init(self, rng):
        m = self.model
        kd, kdir, kh, ks = jax.random.split(rng, 4)
        q = m.qpos0
        qd = jnp.zeros(m.nv)
        # ball state sampling (reference ball_balance.py:369-390)
        dist = jax.random.uniform(kd, (), minval=0.001, maxval=0.5)
        ang = jax.random.uniform(kdir, (), minval=-jnp.pi, maxval=jnp.pi)
        direc = jnp.array([jnp.cos(ang), jnp.sin(ang)])
        hpos = dist * direc
        height = jax.random.uniform(kh, (), minval=1.0, maxval=2.0)
        speedscale = (dist - 0.001) / (0.5 - 0.001)
        hspeed = jax.random.uniform(ks, (), minval=0.0, maxval=5.0)
        hvel = -speedscale * hspeed * direc
        bq = self.ball_q
        q = q.at[bq + 0].set(hpos[0]).at[bq + 1].set(hpos[1]).at[bq + 2].set(height)
        bv = self.model.v_adr[self.ball_body]
        qd = qd.at[bv + 0].set(hvel[0]).at[bv + 1].set(hvel[1]).at[bv + 2].set(-5.0)
        # task state: integrated dof position targets (6,)
        return q, qd, jnp.zeros(6)

    def compute_force(self, action, q, qd, task):
        # targets += dt * speed_scale * action on the actuated dofs,
        # clamped to limits (reference ball_balance.py:417-421)
        m = self.model
        targets = task
        act_idx = jnp.asarray(self._actuated)
        targets = targets.at[act_idx].add(self.dt * self.action_speed_scale * action)
        sdofs = self.scalar_dof_indices
        lo = m.dof_limit_lower[jnp.asarray(sdofs)]
        hi = m.dof_limit_upper[jnp.asarray(sdofs)]
        targets = jnp.clip(targets, lo, hi)
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        q_target = jnp.zeros(m.nq).at[jnp.asarray(sq)].set(targets)
        return jnp.zeros(m.nv), jnp.zeros((m.nbody, 6)), q_target

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        m = self.model
        sdofs = jnp.asarray(self.scalar_dof_indices)
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in self.scalar_dof_indices])
        dof_pos = q[jnp.asarray(sq)]
        dof_vel = qd[sdofs]
        act = jnp.asarray(self._actuated)
        bq, bv = self.ball_q, m.v_adr[self.ball_body]
        ball_pos = q[bq : bq + 3]
        ball_vel = qd[bv : bv + 3]
        # tray force sensors at the three leg mounts: shared force, torques
        # re-referenced to each sensor point (ball_balance.py:344-350)
        bf = sensors.body_force[self.tray_body]
        bt = sensors.body_torque[self.tray_body]
        tray_quat = kin.quat[self.tray_body]
        torques = []
        for a in self.leg_angles:
            p_local = jnp.array(
                [
                    self.leg_outer_offset * math.cos(a),
                    self.leg_outer_offset * math.sin(a),
                    0.0,
                ]
            )
            r = maths.quat_rotate(tray_quat, p_local)
            torques.append(bt - jnp.cross(r, bf))
        return jnp.concatenate(
            [
                dof_pos[act],
                dof_vel[act],
                ball_pos,
                ball_vel,
                bf / 20.0,
                torques[0] / 20.0,
                torques[1] / 20.0,
                torques[2] / 20.0,
            ]
        )

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        m = self.model
        bq, bv = self.ball_q, m.v_adr[self.ball_body]
        ball_pos = q[bq : bq + 3]
        ball_vel = qd[bv : bv + 3]
        ball_dist = jnp.sqrt(
            ball_pos[0] ** 2 + (ball_pos[2] - 0.7) ** 2 + ball_pos[1] ** 2
        )
        ball_speed = jnp.linalg.norm(ball_vel)
        pos_reward = 1.0 / (1.0 + ball_dist)
        speed_reward = 1.0 / (1.0 + ball_speed)
        reward = pos_reward * speed_reward
        done = (progress >= self.max_episode_length - 1) | (
            ball_pos[2] < self.ball_radius * 1.5
        )
        # persist integrated targets (recomputed exactly as compute_force)
        act_idx = jnp.asarray(self._actuated)
        targets = task.at[act_idx].add(self.dt * self.action_speed_scale * actions)
        sdofs = self.scalar_dof_indices
        lo = m.dof_limit_lower[jnp.asarray(sdofs)]
        hi = m.dof_limit_upper[jnp.asarray(sdofs)]
        targets = jnp.clip(targets, lo, hi)
        return reward, done, targets
