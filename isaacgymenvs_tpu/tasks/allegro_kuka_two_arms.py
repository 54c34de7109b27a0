"""AllegroKukaTwoArms: two KUKA+Allegro arms facing a shared table; the
goal volume is biased toward one random arm, so solving the task requires
bimanual handover.

Parity target: reference isaacgymenvs/tasks/allegro_kuka/
allegro_kuka_two_arms.py (arms at x = -/+armXOfs with identity rotation
:597-601; table at (0, armYOfs, 0.38) :621-627; object start above the
table center :392-402; full_state obs composition :176-212 = per-arm dof
pos/vel + palm pos/rot/vel/angvel + fingertip rel pos + keypoints rel
palm, then object rot/vel/angvel, keypoints rel goal, scales, max-kp-dist,
lifted flag, progress, reward slot; reward compute_kuka_reward :818-880 --
NO kuka/allegro action penalties, and the fingertip distance-delta reward
is NOT gated on lifting because "we want the 2nd arm to be relatively
close at all times" :749-758; goal volume origin [0,0,0.8], extent
x[-.2,.2] y[-.5,.5] z[-.12,.25], x additionally shifted +/-0.75 toward a
random arm -- two_arms_reorientation.py _reset_target :97-137) +
allegro_kuka_two_arms_regrasping.py (single centroid keypoint, object
back on table per goal reset) + cfg/task/AllegroKukaTwoArmsLSTM.yaml
(armXOfs 1.1, armYOfs 0.0).

Divergences: inherited from the single-arm family (resting object spawn
instead of a 0.25 m drop; success-triggered tolerance decay instead of
frame-interval curriculum; regrasping's object return to the table is an
episode boundary with successes/tolerance carried through resample_init).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..model import load_urdf
from ..model.compose import compose
from ..utils.assets import asset_path
from .allegro_kuka import (
    FINGERTIPS,
    OBJ_SIZE,
    AllegroKukaReorientation,
)
from .franka_cube_stack import _box_actor
from .shadow_hand import randomize_rotation

TABLE_TOP = 0.53  # table_wide.urdf: 1.1 x 0.4 x 0.3 box centered at z=0.38


class AllegroKukaTwoArmsReorientation(AllegroKukaReorientation):
    NUM_ARMS = 2

    def __init__(self, cfg):
        env = cfg["env"]
        self.arm_x_ofs = float(env.get("armXOfs", 1.1))
        self.arm_y_ofs = float(env.get("armYOfs", 0.0))
        super().__init__(cfg)

    def _full_state_size(self):
        # full_state composition (two_arms.py:176-212): per-arm blocks
        # then the shared object/goal tail -- 160 + 9*num_keypoints dims
        return (
            2 * 23 * self.NUM_ARMS          # dof pos + vel
            + 13 * self.NUM_ARMS            # palm pos(3) rot(4) vel(3) angvel(3)
            + 10                            # obj rot + vel + angvel
            + 3 * 4 * self.NUM_ARMS         # fingertip rel pos
            + 3 * self.num_keypoints * self.NUM_ARMS  # keypoints rel palm
            + 3 * self.num_keypoints        # keypoints rel goal
            + 3 + 1 + 1 + 2 + 1             # scales, maxkp, lifted, progress, rew
        )

    # ------------------------------------------------------------------
    def build_model(self):
        arms = []
        for i in range(self.NUM_ARMS):
            arm = load_urdf(
                asset_path(
                    "urdf/kuka_allegro_description/kuka_allegro_touch_sensor.urdf"
                ),
                fix_base=True,
            )
            nv = arm.nv
            stiff = np.full(nv, 40.0, np.float32)
            damp = np.full(nv, 5.0, np.float32)
            effort = np.concatenate([np.full(7, 300.0), np.full(16, 0.35)])
            bp = np.asarray(arm.body_pos).copy()
            # arms at x = -/+ armXOfs, identity rotation (two_arms.py:597)
            bp[0] = [self.arm_x_ofs * (-1 if i == 0 else 1), self.arm_y_ofs, 0.0]
            arms.append(arm.replace(
                body_pos=jnp.asarray(bp),
                dof_stiffness=jnp.asarray(stiff),
                dof_damping=jnp.asarray(damp),
                dof_max_effort=jnp.asarray(effort, jnp.float32),
            ))
        cube = _box_actor(
            "cube", [OBJ_SIZE] * 3, 400.0, False,
            [0.0, self.arm_y_ofs, TABLE_TOP + 0.25],
        )
        table = _box_actor(
            "table", [1.1, 0.4, 0.3], 1000.0, True,
            [0.0, self.arm_y_ofs, TABLE_TOP - 0.15],
        )
        model, refs = compose(
            arms + [cube, table], ["a0:", "a1:", "cube:", "table:"]
        )
        self.arm_refs = refs[: self.NUM_ARMS]
        self.cube_ref, self.table_ref = refs[self.NUM_ARMS:]
        self._actor_ranges = {
            "allegro": (0, self.cube_ref.body0),  # both arm+hand actors
            "object": (self.cube_ref.body0, self.table_ref.body0),
        }
        cube_body = self.cube_ref.body0
        cube_geom = next(
            g for g in range(model.ngeom) if model.geom_body[g] == cube_body
        )
        table_geom = next(
            g for g in range(model.ngeom)
            if model.geom_body[g] == self.table_ref.body0
        )
        tips = {
            model.body_names.index(f"a{i}:{t}")
            for t in FINGERTIPS for i in range(self.NUM_ARMS)
        }
        keep, ppp, ppg = [], [], []
        per_tip: dict = {}
        for c in range(model.ncp):
            b = model.cpoint_body[c]
            if b == cube_body:
                keep.append(c)
                ppp.append(c)
                ppg.append(table_geom)
            elif b in tips and per_tip.get(b, 0) < 6:
                per_tip[b] = per_tip.get(b, 0) + 1
                keep.append(c)
                ppp.append(c)
                ppg.append(cube_geom)
        remap = {c: i for i, c in enumerate(keep)}
        karr = np.asarray(keep)
        model = model.replace(
            cpoint_body=tuple(model.cpoint_body[c] for c in keep),
            cpoint_pos=model.cpoint_pos[karr],
            cpoint_radius=model.cpoint_radius[karr],
            cpoint_friction=model.cpoint_friction[karr],
            ppair_point=tuple(remap[c] for c in ppp),
            ppair_geom=tuple(ppg),
            plane_contacts=False,
        )
        return model, self.sim_params_from_cfg()

    def _setup(self):
        m = self.model
        sdofs = self.scalar_dof_indices  # 46 dofs, arm0's then arm1's
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        self.q_idx = jnp.asarray(sq)
        self.v_idx = jnp.asarray(sdofs)
        self.dof_lower = jnp.asarray(np.asarray(m.dof_limit_lower)[sdofs])
        self.dof_upper = jnp.asarray(np.asarray(m.dof_limit_upper)[sdofs])
        names = m.body_names
        self.tip_bodies = jnp.asarray([
            names.index(f"a{i}:{t}")
            for i in range(self.NUM_ARMS) for t in FINGERTIPS
        ])
        self.palm_bodies = jnp.asarray([
            next(
                j for j, n in enumerate(names)
                if n.startswith(f"a{i}:") and "palm" in n.lower()
            )
            for i in range(self.NUM_ARMS)
        ])
        self.palm_offset = jnp.array([0.0, -0.02, 0.16])
        self.oq = m.q_adr[self.cube_ref.body0]
        self.ov = m.v_adr[self.cube_ref.body0]
        self.obj_init_z = TABLE_TOP + OBJ_SIZE / 2
        self.obj_init_y = self.arm_y_ofs
        # goal volume (two_arms.py:243-247)
        self.vol_origin = jnp.array([0.0, 0.0, 0.8])
        self.vol_lo = jnp.array([-0.2, -0.5, -0.12])
        self.vol_hi = jnp.array([0.2, 0.5, 0.25])

    # ---- init ---------------------------------------------------------
    def _sample_goal(self, key):
        """Base volume + x displaced +/-0.75 toward a random arm
        (two_arms_reorientation.py _reset_target :108-120)."""
        kp_, kr, ks = jax.random.split(key, 3)
        u = jax.random.uniform(kp_, (3,))
        pos = self.vol_origin + self.vol_lo + u * (self.vol_hi - self.vol_lo)
        side = jnp.where(jax.random.uniform(ks) > 0.5, 0.75, -0.75)
        pos = pos.at[0].add(side)
        rr = jax.random.uniform(kr, (2,), minval=-1.0, maxval=1.0)
        return pos, randomize_rotation(rr[0], rr[1])

    def _init_with_tolerance(self, rng, tolerance, successes=None):
        m = self.model
        kd, kv, ko, ky, kg, kk = jax.random.split(rng, 6)
        nd = 23 * self.NUM_ARMS
        dof = 0.1 * jax.random.uniform(kd, (nd,), minval=-1.0, maxval=1.0)
        dof = jnp.clip(dof, self.dof_lower, self.dof_upper)
        q = m.qpos0.at[self.q_idx].set(dof)
        qd = jnp.zeros(m.nv).at[self.v_idx].set(
            0.1 * jax.random.uniform(kv, (nd,), minval=-1.0, maxval=1.0)
        )
        dxy = jax.random.uniform(ko, (2,), minval=-1.0, maxval=1.0) * jnp.array(
            [0.1, 0.1]
        )
        pos = jnp.array(
            [0.0, self.obj_init_y, self.obj_init_z]
        ) + jnp.concatenate([dxy, jnp.zeros(1)])
        yaw = jax.random.uniform(ky, (), minval=-jnp.pi, maxval=jnp.pi)
        q = q.at[self.oq: self.oq + 3].set(pos)
        q = q.at[self.oq + 3: self.oq + 7].set(
            maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1]))
        )
        goal_pos, goal_rot = self._sample_goal(kg)
        task = {
            "goal_pos": goal_pos,
            "goal_rot": goal_rot,
            "successes": jnp.zeros(()),
            "near_goal_steps": jnp.zeros((), jnp.int32),
            "lifted": jnp.zeros((), bool),
            "closest_tip_dist": -jnp.ones(4 * self.NUM_ARMS),
            "closest_kp_dist": -jnp.ones(()),
            "tolerance": tolerance,
            "targets": dof,
            "last_success": jnp.zeros((), bool),
            "key": kk,
            "rew_terms": {
                k: jnp.zeros(())
                for k in (
                    "fingertip_delta_rew",
                    "lifting_rew",
                    "lift_bonus_rew",
                    "keypoint_rew",
                    "bonus_rew",
                )
            },
        }
        if successes is not None:
            task["successes"] = successes
        return q, qd, task

    # ---- observations (full_state :176-212) -----------------------------
    def observe(self, q, qd, kin, sensors, task, actions, progress):
        obj_pos = q[self.oq: self.oq + 3]
        obj_rot = q[self.oq + 3: self.oq + 7]
        palms = kin.x[self.palm_bodies] + maths.quat_rotate(
            kin.quat[self.palm_bodies],
            jnp.broadcast_to(self.palm_offset, (self.NUM_ARMS, 3)),
        )
        palm_quat = kin.quat[self.palm_bodies]
        pv = kin.v[self.palm_bodies]
        palm_lin = pv[:, 3:] + jnp.cross(pv[:, :3], palms)
        tips = kin.x[self.tip_bodies]
        kp_obj = self._keypoints(obj_pos, obj_rot)
        kp_goal = self._keypoints(task["goal_pos"], task["goal_rot"])
        kp_dist = jnp.linalg.norm(kp_obj - kp_goal, axis=-1)
        kp_rel_palm = (
            kp_obj[None, :, :] - palms[:, None, :]
        ).reshape(-1)  # per-arm keypoints rel palm
        return jnp.concatenate([
            q[self.q_idx],
            qd[self.v_idx],
            palms.reshape(-1),
            palm_quat.reshape(-1),
            palm_lin.reshape(-1),
            pv[:, :3].reshape(-1),
            obj_rot,
            qd[self.ov: self.ov + 3],
            qd[self.ov + 3: self.ov + 6],
            (tips - obj_pos[None, :]).reshape(-1),
            kp_rel_palm,
            (kp_obj - kp_goal).reshape(-1),
            jnp.full(3, OBJ_SIZE),
            jnp.max(kp_dist)[None],
            task["lifted"].astype(jnp.float32)[None],
            jnp.stack([
                progress.astype(jnp.float32) / self.max_episode_length,
                task["successes"],
            ]),
            jnp.zeros(1),  # reward slot (filled post-hoc in the reference)
        ])

    # ---- reward (compute_kuka_reward :818-880) --------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        obj_pos = q[self.oq: self.oq + 3]
        obj_rot = q[self.oq + 3: self.oq + 7]
        tips = kin.x[self.tip_bodies]

        z_lift = 0.05 + obj_pos[2] - self.obj_init_z
        lifting_rew = jnp.clip(z_lift, 0.0, 0.5)
        lifted = (z_lift > self.lifting_threshold) | task["lifted"]
        just_lifted = lifted & ~task["lifted"]
        lifting_rew = lifting_rew * (~lifted) * self.lifting_rew_scale
        lift_bonus = self.lifting_bonus * just_lifted

        # fingertip deltas over BOTH arms, not lift-gated (:749-758)
        tip_dist = jnp.linalg.norm(tips - obj_pos[None, :], axis=-1)
        closest = jnp.where(
            task["closest_tip_dist"] < 0, tip_dist, task["closest_tip_dist"]
        )
        tip_delta = jnp.clip(closest - tip_dist, 0.0, 10.0)
        closest = jnp.minimum(closest, tip_dist)
        tip_delta_rew = jnp.sum(tip_delta) * self.dist_delta_rew_scale

        kp_obj = self._keypoints(obj_pos, obj_rot)
        kp_goal = self._keypoints(task["goal_pos"], task["goal_rot"])
        kp_max = jnp.max(jnp.linalg.norm(kp_obj - kp_goal, axis=-1))
        closest_kp = jnp.where(
            task["closest_kp_dist"] < 0, kp_max, task["closest_kp_dist"]
        )
        kp_rew = (
            jnp.clip(closest_kp - kp_max, 0.0, 100.0)
            * lifted
            * self.keypoint_rew_scale
        )
        closest_kp = jnp.minimum(closest_kp, kp_max)

        tol_kp = task["tolerance"] * self.keypoint_scale / OBJ_SIZE
        near_goal = kp_max <= tol_kp
        near_goal_steps = task["near_goal_steps"] + near_goal
        is_success = near_goal_steps >= self.success_steps
        successes = task["successes"] + is_success
        bonus = near_goal * (self.reach_goal_bonus / self.success_steps)

        # two-arms reward has NO action penalties (:818-848)
        reward = lifting_rew + lift_bonus + tip_delta_rew + kp_rew + bonus

        key, kg = jax.random.split(task["key"])
        new_goal_pos, new_goal_rot = self._sample_goal(kg)
        goal_pos = jnp.where(is_success, new_goal_pos, task["goal_pos"])
        goal_rot = jnp.where(is_success, new_goal_rot, task["goal_rot"])
        tolerance = jnp.where(
            is_success,
            jnp.maximum(
                task["tolerance"] * self.tolerance_decay, self.target_tolerance
            ),
            task["tolerance"],
        )
        near_goal_steps = jnp.where(is_success, 0, near_goal_steps)
        closest_kp = jnp.where(is_success, -1.0, closest_kp)

        fell = obj_pos[2] < 0.1
        progress = jnp.where(is_success, 0, progress)
        done = (
            fell
            | (successes >= self.max_consecutive_successes)
            | (progress >= self.max_episode_length - 1)
        )
        new_task = {
            "goal_pos": goal_pos,
            "goal_rot": goal_rot,
            "successes": successes,
            "near_goal_steps": near_goal_steps,
            "lifted": lifted,
            "closest_tip_dist": closest,
            "closest_kp_dist": closest_kp,
            "tolerance": tolerance,
            "targets": task["targets"],
            "last_success": is_success,
            "key": key,
            # per-step terms for episode_cumulative stats (reference
            # allegro_kuka_two_arms.py:861-876; no action penalties)
            "rew_terms": {
                "fingertip_delta_rew": tip_delta_rew,
                "lifting_rew": lifting_rew,
                "lift_bonus_rew": lift_bonus,
                "keypoint_rew": kp_rew,
                "bonus_rew": bonus,
            },
        }
        return reward, done, new_task


class AllegroKukaTwoArmsRegrasping(AllegroKukaTwoArmsReorientation):
    """Regrasping with two arms: position-only goal (single centroid
    keypoint) biased toward a random arm -- handover training (reference
    allegro_kuka_two_arms_regrasping.py). The object's return to the
    table on each goal reset is an episode boundary here (see module
    docstring)."""

    KP_OFFSETS = ((0, 0, 0),)

    def resample_init(self, rng, old_task):
        carry = old_task["last_success"]
        successes = jnp.where(carry, old_task["successes"], 0.0)
        return self._init_with_tolerance(
            rng, old_task["tolerance"], successes=successes
        )

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        reward, done, new_task = super().reward_done(
            obs, q, qd, kin, sensors, task, actions, progress
        )
        return reward, done | new_task["last_success"], new_task
