"""AnymalTerrain: rough-terrain locomotion with a terrain curriculum.

Parity target: reference isaacgymenvs/tasks/anymal_terrain.py (188-dim obs
with 140-point height scan :327-339 + init_height_points :503-513, 13-term
reward :315-367 with per-term episode sums :369-425, PD-torque decimation
loop :441-451, random robot pushes :437-439, terrain-level curriculum
promotion/demotion on reset update_terrain_level :427-435, additive obs
noise vector _get_noise_scale_vec :174) and cfg/task/AnymalTerrain.yaml.
The procedural terrain grid is a dense heightfield (utils/terrain_utils)
sampled bilinearly by the engine instead of a trimesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..engine.dynamics import Terrain
from ..utils.terrain_utils import TerrainGrid
from .anymal import Anymal


class AnymalTerrain(Anymal):
    def __init__(self, cfg):
        env = cfg["env"]
        t = env.get("terrain", {})
        self.terrain_type = str(t.get("terrainType", "trimesh"))
        self.curriculum = bool(t.get("curriculum", True))
        self.num_levels = int(t.get("numLevels", 10))
        self.num_types = int(t.get("numTerrains", 20))
        learn = env.get("learn", {})
        self.height_meas_scale = float(learn.get("heightMeasurementScale", 5.0))
        self.rew_scales_extra = {
            "lin_vel_z": float(learn.get("linearVelocityZRewardScale", -4.0)),
            "ang_vel_xy": float(learn.get("angularVelocityXYRewardScale", -0.05)),
            "orient": float(learn.get("orientationRewardScale", 0.0)),
            "base_height": float(learn.get("baseHeightRewardScale", 0.0)),
            "joint_acc": float(learn.get("jointAccRewardScale", -0.0005)),
            "collision": float(learn.get("kneeCollisionRewardScale", -0.25)),
            "stumble": float(learn.get("feetStumbleRewardScale", -2.0)),
            "action_rate": float(learn.get("actionRateRewardScale", -0.01)),
            "air_time": float(learn.get("feetAirTimeRewardScale", 1.0)),
            "hip": float(learn.get("hipRewardScale", 0.0)),
            "termination": float(learn.get("terminalReward", 0.0)),
        }
        self.allow_knee_contacts = bool(learn.get("allowKneeContacts", True))
        self.push_robots = bool(learn.get("pushRobots", True))
        self.push_interval = int(
            float(learn.get("pushInterval_s", 15.0))
            / (float(cfg.get("sim", {}).get("dt", 0.005))
               * int(env.get("control", {}).get("decimation", 4)))
            + 0.5
        )
        env.setdefault(
            "controlFrequencyInv", int(env.get("control", {}).get("decimation", 4))
        )
        # additive observation noise vector + static surface-friction draw
        # (reference _get_noise_scale_vec :174 and the per-actor friction
        # sample at creation): expressed as per-obs-key + setup-only DR
        # specs so the jitted DR path applies them
        self._inject_learn_noise(cfg, learn)
        super().__init__(cfg)
        self.num_obs = 188

        # height-scan grid: 14 x 10 points (anymal_terrain.py:503-513)
        gx = 0.1 * np.array([-8, -7, -6, -5, -4, -3, -2, 2, 3, 4, 5, 6, 7, 8])
        gy = 0.1 * np.array([-5, -4, -3, -2, -1, 1, 2, 3, 4, 5])
        pts = np.stack(np.meshgrid(gx, gy, indexing="ij"), -1).reshape(-1, 2)
        self.height_points = jnp.asarray(pts, jnp.float32)  # (140, 2)
        self.num_height_points = len(pts)
        # patch size for the dense height-scan lookup: the scan's world
        # extent around the base (any yaw) plus bilinear support
        hs = float(
            self.cfg["env"].get("terrain", {}).get("horizontalScale", 0.1)
        ) or 0.1
        radius = float(np.max(np.linalg.norm(pts, axis=1)))
        p = int(np.ceil(2.0 * radius / hs)) + 4
        self._scan_patch = ((p + 7) // 8) * 8  # sublane-aligned

        if self.terrain_type not in ("plane", "none"):
            grid = TerrainGrid(
                num_levels=self.num_levels,
                num_terrains=self.num_types,
                horizontal_scale=float(
                    self.cfg["env"]["terrain"].get("horizontalScale", 0.1)
                ) if "terrain" in self.cfg["env"] else 0.1,
                curriculum=self.curriculum,
            )
            self.grid = grid
            self.terrain = Terrain(
                height=jnp.asarray(grid.height),
                horizontal_scale=grid.hs,
                origin=jnp.zeros(2),
            )
            self.terrain_origins = jnp.asarray(grid.env_origins)
        else:
            self.grid = None
            self.terrain_origins = None
        self.feet_bodies = jnp.asarray(
            [i for i, n in enumerate(self.model.body_names) if "SHANK" in n]
        )
        self.max_episode_length_s = float(
            self.cfg["env"].get("learn", {}).get("episodeLength_s", 20.0)
        )


    def _inject_learn_noise(self, cfg, learn):
        task_cfg = cfg.get("task") or {}
        params = task_cfg.get("randomization_params") or {}
        if learn.get("addNoise", True):
            nl = float(learn.get("noiseLevel", 1.0))
            lin = float(learn.get("linearVelocityScale", 2.0))
            ang = float(learn.get("angularVelocityScale", 0.25))
            dpos = float(learn.get("dofPositionScale", 1.0))
            dvel = float(learn.get("dofVelocityScale", 0.05))
            hms = float(learn.get("heightMeasurementScale", 5.0))
            svec = {
                "base_lin_vel": nl * float(learn.get("linearVelocityNoise", 0.1)) * lin,
                "base_ang_vel": nl * float(learn.get("angularVelocityNoise", 0.2)) * ang,
                "gravity": nl * float(learn.get("gravityNoise", 0.05)),
                "dof_pos": nl * float(learn.get("dofPositionNoise", 0.01)) * dpos,
                "dof_vel": nl * float(learn.get("dofVelocityNoise", 1.5)) * dvel,
                "heights": nl * float(learn.get("heightMeasurementNoise", 0.06)) * hms,
            }
            obs = dict(params.get("observations") or {})
            for k, sc in svec.items():
                if sc != 0.0:
                    # reference noise: (2*U-1) * scale -> uniform [-s, s]
                    obs.setdefault(k, {
                        "range": [-sc, sc],
                        "operation": "additive",
                        "distribution": "uniform",
                    })
            params["observations"] = obs
        if learn.get("randomizeFriction", True):
            lo, hi = learn.get("frictionRange", [0.5, 1.25])
            ap = params.setdefault("actor_params", {})
            an = ap.setdefault("anymal", {})
            rs = an.setdefault("rigid_shape_properties", {})
            # base contact friction is 1.0, so a scaling draw over the
            # range equals the reference's absolute assignment
            rs.setdefault("friction", {
                "range": [float(lo), float(hi)],
                "operation": "scaling",
                "distribution": "uniform",
                "setup_only": True,
            })
        if params:
            task_cfg["randomization_params"] = params
            task_cfg["randomize"] = True
            cfg["task"] = task_cfg

    def obs_spec(self):
        """{key: (offset, size)} slices of the 188-dim obs vector (used
        by the per-key DR observation noise)."""
        return {
            "base_lin_vel": (0, 3),
            "base_ang_vel": (3, 3),
            "gravity": (6, 3),
            "commands": (9, 3),
            "dof_pos": (12, 12),
            "dof_vel": (24, 12),
            "heights": (36, self.num_height_points),
            "actions": (36 + self.num_height_points, 12),
        }

    def perturb_state(self, key, q, qd, frames, task):
        """Random robot pushes: overwrite base xy velocity with U[-1,1]
        every pushInterval sim steps (reference push_robots :437-439)."""
        if not self.push_robots or self.push_interval <= 0:
            return q, qd
        push = (frames > 0) & (frames % self.push_interval == 0)
        v = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0)
        qd = qd.at[0:2].set(jnp.where(push, v, qd[0:2]))
        return q, qd

    # ---- init / reset with terrain curriculum -------------------------
    def sample_init(self, rng, level=None, ttype=None):
        q, qd, commands = super().sample_init(rng)
        kl, kt, kxy = jax.random.split(jax.random.fold_in(rng, 99), 3)
        if self.terrain_origins is not None:
            if level is None:
                max_init = self.num_levels if not self.curriculum else max(
                    1, self.num_levels // 2
                )
                level = jax.random.randint(kl, (), 0, max_init)
            if ttype is None:
                ttype = jax.random.randint(kt, (), 0, self.num_types)
            origin = self.terrain_origins[level, ttype]
            dxy = jax.random.uniform(kxy, (2,), minval=-0.5, maxval=0.5)
            xy = origin[0:2] + dxy
            q = q.at[0:2].set(xy)
            # spawn height from the LOCAL ground under the feet (max over a
            # footprint patch) so stairs/obstacles never intersect the robot
            probe = jnp.stack(
                [jnp.array([dx, dy]) for dx in (-0.5, 0.0, 0.5) for dy in (-0.35, 0.0, 0.35)]
            )
            ground = jnp.max(self.terrain.sample(xy[None, :] + probe))
            q = q.at[2].add(ground)
        else:
            level = jnp.zeros((), jnp.int32)
            ttype = jnp.zeros((), jnp.int32)
            origin = jnp.zeros(3)
        task = {
            "commands": commands,
            "level": level,
            "type": ttype,
            "origin": origin,
            "last_actions": jnp.zeros(12),
            "last_dof_vel": jnp.zeros(12),
            "feet_air_time": jnp.zeros(len(self.feet_bodies)),
            "ep_sums": jnp.zeros(13),
        }
        return q, qd, task

    def resample_init(self, rng, old_task):
        """Respawn at the CURRENT curriculum level (promoted/demoted when
        the episode ended, update_terrain_level semantics)."""
        return self.sample_init(
            rng, level=old_task["level"], ttype=old_task["type"]
        )

    def compute_force(self, action, q, qd, task):
        targets = self.action_scale * action + self.default_dof_pos
        q_target = jnp.zeros(self.model.nq).at[self.dof_q_idx].set(targets)
        return (
            jnp.zeros(self.model.nv),
            jnp.zeros((self.model.nbody, 6)),
            q_target,
        )

    # ---- observations --------------------------------------------------
    def _heights_at(self, q):
        """Yaw-rotated height scan around the base (get_heights :515-538)."""
        if self.terrain is None:
            return jnp.zeros(self.num_height_points)
        yaw_quat = maths.calc_heading_quat(q[3:7])
        pts3 = jnp.concatenate(
            [self.height_points, jnp.zeros((self.num_height_points, 1))], -1
        )
        world = maths.quat_rotate(yaw_quat, pts3)[:, :2] + q[0:2]
        # patch-sliced dense lookup (Terrain.sample_patch): the scan
        # grid spans ~±0.9 m of the base, so one (P, P) patch per env
        # replaces 4 x 140 pointwise gathers with two small einsums
        return self.terrain.sample_patch(q[0:2], world, P=self._scan_patch)

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        base_quat = q[3:7]
        commands = task["commands"]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, qd[0:3])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, qd[3:6])
        projected_gravity = maths.quat_rotate_inverse(
            base_quat, jnp.array([0.0, 0.0, -1.0])
        )
        dof_pos_scaled = (q[self.dof_q_idx] - self.default_dof_pos) * self.dof_pos_scale
        commands_scaled = commands * jnp.array(
            [self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale]
        )
        heights = jnp.clip(
            q[2] - 0.5 - self._heights_at(q), -1.0, 1.0
        ) * self.height_meas_scale
        return jnp.concatenate(
            [
                base_lin_vel * self.lin_vel_scale,
                base_ang_vel * self.ang_vel_scale,
                projected_gravity,
                commands_scaled,
                dof_pos_scaled,
                qd[self.dof_idx] * self.dof_vel_scale,
                heights,
                actions,
            ]
        )

    # ---- reward (13 terms, :315-367) ----------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        base_quat = q[3:7]
        commands = task["commands"]
        base_lin_vel = maths.quat_rotate_inverse(base_quat, qd[0:3])
        base_ang_vel = maths.quat_rotate_inverse(base_quat, qd[3:6])
        projected_gravity = maths.quat_rotate_inverse(
            base_quat, jnp.array([0.0, 0.0, -1.0])
        )
        rs = self.rew_scales_extra

        lin_err = jnp.sum(jnp.square(commands[:2] - base_lin_vel[:2]))
        ang_err = jnp.square(commands[2] - base_ang_vel[2])
        r_lin = jnp.exp(-lin_err / 0.25) * self.rew_lin_vel_xy_scale
        r_ang = jnp.exp(-ang_err / 0.25) * self.rew_ang_vel_z_scale
        r_linz = jnp.square(base_lin_vel[2]) * rs["lin_vel_z"]
        r_angxy = jnp.sum(jnp.square(base_ang_vel[:2])) * rs["ang_vel_xy"]
        r_orient = jnp.sum(jnp.square(projected_gravity[:2])) * rs["orient"]
        ground_h = self.terrain.sample(q[0:2]) if self.terrain is not None else 0.0
        r_height = jnp.square(q[2] - ground_h - 0.52) * rs["base_height"]
        torques = self._pd_torques(q, qd, actions)
        r_torque = jnp.sum(jnp.square(torques)) * self.rew_torque_scale
        dof_vel = qd[self.dof_idx]
        r_acc = jnp.sum(jnp.square(task["last_dof_vel"] - dof_vel)) * rs["joint_acc"]
        knee_force = jnp.linalg.norm(
            sensors.body_force[self.knee_bodies], axis=-1
        )
        r_coll = jnp.sum(knee_force > 1.0) * rs["collision"]
        feet_f = sensors.body_force[self.feet_bodies]
        stumble = (jnp.linalg.norm(feet_f[:, :2], axis=-1) > 5.0) & (
            jnp.abs(feet_f[:, 2]) < 1.0
        )
        r_stumble = jnp.sum(stumble) * rs["stumble"]
        r_act_rate = jnp.sum(jnp.square(task["last_actions"] - actions)) * rs["action_rate"]

        contact = feet_f[:, 2] > 1.0
        air = task["feet_air_time"]
        first_contact = (air > 0.0) & contact
        air = air + self.dt
        r_air = jnp.sum((air - 0.5) * first_contact) * rs["air_time"]
        r_air = r_air * (jnp.linalg.norm(commands[:2]) > 0.1)
        air = air * (~contact)

        hip = jnp.asarray([0, 3, 6, 9])
        r_hip = jnp.sum(
            jnp.abs(q[self.dof_q_idx][hip] - self.default_dof_pos[hip])
        ) * rs["hip"]

        terms = jnp.stack([
            r_lin, r_ang, r_linz, r_angxy, r_orient, r_height, r_torque,
            r_acc, r_coll, r_act_rate, r_air, r_hip, r_stumble,
        ])
        total = jnp.maximum(jnp.sum(terms), 0.0)

        base_hit = jnp.linalg.norm(sensors.body_force[self.base_body]) > 1.0
        knee_hit = jnp.any(knee_force > 1.0) & (~jnp.asarray(self.allow_knee_contacts))
        timeout = progress >= self.max_episode_length - 1
        done = base_hit | knee_hit | timeout
        total = total + rs["termination"] * (done & ~timeout)

        # terrain curriculum on episode end (update_terrain_level :427-435)
        level = task["level"]
        if self.terrain_origins is not None and self.curriculum:
            dist = jnp.linalg.norm(q[0:2] - task["origin"][0:2])
            demote = dist < jnp.linalg.norm(commands[:2]) * self.max_episode_length_s * 0.25
            promote = dist > self.grid.env_length / 2
            new_level = jnp.clip(
                level - demote.astype(jnp.int32) + promote.astype(jnp.int32),
                0, self.num_levels - 1,
            )
            level = jnp.where(done, new_level, level)

        new_task = {
            "commands": commands,
            "level": level,
            "type": task["type"],
            "origin": task["origin"],
            "last_actions": actions,
            "last_dof_vel": dof_vel,
            "feet_air_time": air,
            "ep_sums": task["ep_sums"] + terms,
        }
        return total, done, new_task

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        """Per-term episode reward sums (extras['episode'], :421-425) and
        the terrain level for curriculum monitoring."""
        return {
            "episode_sums": task["ep_sums"],
            "terrain_level": task["level"].astype(jnp.float32),
        }

    def true_objective(self, q, qd):
        return qd[0]
