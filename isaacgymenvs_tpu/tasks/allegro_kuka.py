"""AllegroKuka: a KUKA iiwa arm with an Allegro hand picks a cube off a
table and reorients it to a floating target pose (Reorientation subtask).

Parity target: reference isaacgymenvs/tasks/allegro_kuka/allegro_kuka_base.py
(full_state obs composition :185-232; staged reward compute_kuka_reward
:854-905 = fingertip distance-delta + lifting + lift bonus + keypoint
distance-delta gated on lifted + action penalties + success bonus;
_lifting_reward :788-812, _distance_delta_rewards :759-787,
_keypoint_reward :814-828; success/goal-reset machinery :860-875; resets
on fall/max-successes/timeout _compute_resets :841-851; table at
dy=-0.8 dz=0.38, object spawn dz+0.25 :402-412,620-625; success-tolerance
curriculum _extra_curriculum) + allegro_kuka_reorientation.py (4 cube-
diagonal keypoints _object_keypoint_offsets) + cfg/task/AllegroKuka.yaml
(scales :40-60, PD gains kuka/allegro 40/5, keypointScale 1.5, base size
0.05, success tolerance 0.075 -> 0.01 curriculum).

Divergences (documented): random object-shape cuboid curriculum and the
random-force perturbations are off by default; allegro effort clamping is
not applied inside the implicit PD drive (stiffness/damping match).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..envcore.vec_task import VecTask
from ..model import load_urdf
from ..model.compose import compose
from ..utils.assets import asset_path
from .franka_cube_stack import _box_actor
from .shadow_hand import randomize_rotation

OBJ_SIZE = 0.05
TABLE_TOP = 0.42  # dz=0.38 + half thickness
FINGERTIPS = ("index_link_3", "middle_link_3", "ring_link_3", "thumb_link_3")


class AllegroKukaReorientation(VecTask):
    use_pd_targets = True
    # object keypoint offsets in units of keypoint_scale; subtasks override
    # (reference _object_keypoint_offsets: 4 cube diagonals for
    # reorientation, a single centroid for regrasping/throw)
    KP_OFFSETS = ((1, 1, 1), (1, 1, -1), (-1, -1, 1), (-1, -1, -1))

    def __init__(self, cfg):
        env = cfg["env"]
        env.setdefault("episodeLength", 600)
        self.lifting_rew_scale = float(env.get("liftingRewScale", 20.0))
        self.lifting_bonus = float(env.get("liftingBonus", 300.0))
        self.lifting_threshold = float(env.get("liftingBonusThreshold", 0.15))
        self.keypoint_rew_scale = float(env.get("keypointRewScale", 200.0))
        self.dist_delta_rew_scale = float(env.get("distanceDeltaRewScale", 50.0))
        self.reach_goal_bonus = float(env.get("reachGoalBonus", 1000.0))
        self.kuka_pen_scale = float(env.get("kukaActionsPenaltyScale", 0.003))
        self.allegro_pen_scale = float(
            env.get("allegroActionsPenaltyScale", 0.0003)
        )
        self.success_tolerance = float(env.get("successTolerance", 0.075))
        self.target_tolerance = float(env.get("targetSuccessTolerance", 0.01))
        self.tolerance_decay = float(env.get("toleranceCurriculumIncrement", 0.9))
        self.max_consecutive_successes = int(
            env.get("maxConsecutiveSuccesses", 50)
        )
        self.success_steps = int(env.get("successSteps", 1))
        self.keypoint_scale = float(env.get("keypointScale", 1.5)) * OBJ_SIZE
        self.keypoint_offsets = (
            jnp.asarray(self.KP_OFFSETS, jnp.float32) * self.keypoint_scale
        )
        self.num_keypoints = len(self.KP_OFFSETS)
        # full_state composition (:185-232): 93 fixed dims + 6 per keypoint
        self.num_obs = self._full_state_size()
        self.num_acts = 23 * getattr(self, "NUM_ARMS", 1)
        # initial-state bank (reference allegro_kuka_base.py:95-101,
        # 1493-1600: saveStates accumulates per-episode snapshots dumped
        # to a binary file; loadInitialStates resets envs from that bank
        # instead of the random spawn). TPU-native: snapshots are (q, qd)
        # generalized-coordinate rows in a .npz; loading folds the bank
        # into the jitted reset as constant arrays + a random gather.
        self.save_states = bool(env.get("saveStates", False))
        self.save_states_file = str(env.get("saveStatesFile", ""))
        self.load_initial_states = bool(env.get("loadInitialStates", False))
        self.load_states_file = str(env.get("loadStatesFile", ""))
        self._episode_q = []  # host-side accumulation [(N, nq) snapshots]
        self._episode_qd = []
        self.initial_q = self.initial_qd = None
        super().__init__(cfg)
        self._setup()
        if self.load_initial_states:
            self._load_initial_states()

    def _full_state_size(self):
        """Overridden by the two-arms family (per-arm obs blocks)."""
        return 93 + 6 * self.num_keypoints

    # ------------------------------------------------------------------
    def dr_actor_ranges(self):
        return getattr(self, "_actor_ranges", None)

    def build_model(self):
        arm = load_urdf(
            asset_path("urdf/kuka_allegro_description/kuka_allegro_touch_sensor.urdf"),
            fix_base=True,
        )
        nv = arm.nv  # 7 kuka + 16 allegro
        stiff = np.full(nv, 40.0, np.float32)  # kuka/allegro stiffness 40
        damp = np.full(nv, 5.0, np.float32)
        effort = np.concatenate([np.full(7, 300.0), np.full(16, 0.35)])
        arm = arm.replace(
            dof_stiffness=jnp.asarray(stiff),
            dof_damping=jnp.asarray(damp),
            dof_max_effort=jnp.asarray(effort, jnp.float32),
        )
        cube = _box_actor(
            "cube", [OBJ_SIZE] * 3, 400.0, False, [0.0, -0.8, TABLE_TOP + 0.25]
        )
        table = _box_actor(
            "table", [0.6, 0.45, 0.08], 1000.0, True, [0.0, -0.8, TABLE_TOP - 0.04]
        )
        model, refs = compose([arm, cube, table], ["", "cube:", "table:"])
        self.arm_ref, self.cube_ref, self.table_ref = refs
        self._actor_ranges = {
            "allegro": (0, self.cube_ref.body0),
            "object": (self.cube_ref.body0, self.table_ref.body0),
        }
        cube_body = self.cube_ref.body0
        cube_geom = next(
            g for g in range(model.ngeom) if model.geom_body[g] == cube_body
        )
        table_geom = next(
            g
            for g in range(model.ngeom)
            if model.geom_body[g] == self.table_ref.body0
        )
        tips = {model.body_names.index(t) for t in FINGERTIPS}
        keep, ppp, ppg = [], [], []
        per_tip: dict = {}
        for c in range(model.ncp):
            b = model.cpoint_body[c]
            if b == cube_body:
                keep.append(c)
                ppp.append(c)
                ppg.append(table_geom)  # cube corners vs table top
            elif b in tips and per_tip.get(b, 0) < 6:
                per_tip[b] = per_tip.get(b, 0) + 1
                keep.append(c)
                ppp.append(c)
                ppg.append(cube_geom)  # fingertips vs cube
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
        sdofs = self.scalar_dof_indices  # 23 arm+hand dofs
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        self.q_idx = jnp.asarray(sq)
        self.v_idx = jnp.asarray(sdofs)
        self.dof_lower = jnp.asarray(np.asarray(m.dof_limit_lower)[sdofs])
        self.dof_upper = jnp.asarray(np.asarray(m.dof_limit_upper)[sdofs])
        self.tip_bodies = jnp.asarray(
            [m.body_names.index(t) for t in FINGERTIPS]
        )
        names = m.body_names
        palm = next(
            (i for i, n in enumerate(names) if "palm" in n.lower()),
            int(np.asarray(m.body_parent)[int(self.tip_bodies[0])]),
        )
        self.palm_body = palm
        self.palm_offset = jnp.array([0.0, -0.02, 0.16])
        self.oq = m.q_adr[self.cube_ref.body0]
        self.ov = m.v_adr[self.cube_ref.body0]
        self.obj_init_z = TABLE_TOP + OBJ_SIZE / 2
        # goal volume (allegro_kuka_base.py:252-257)
        self.vol_origin = jnp.array([0.0, 0.05, 0.8])
        self.vol_lo = jnp.array([-0.4, -0.05, -0.12])
        self.vol_hi = jnp.array([0.4, 0.3, 0.25])

    # ---- initial-state bank (reference :1493-1600) ----------------------
    def accumulate_env_states(self, state):
        """Host-side: snapshot every env's generalized state from a live
        EnvState (the reference accumulates per step during rollouts,
        allegro_kuka_base.py:1493-1504)."""
        self._episode_q.append(np.asarray(state.sim.q))
        self._episode_qd.append(np.asarray(state.sim.qd))

    def dump_env_states(self, path=None, rng=None):
        """Downsample accumulated snapshots (per env: len//10, max 50 --
        the reference's sampling rule, :1506-1544) and append them to the
        .npz bank at `path` (default saveStatesFile)."""
        path = path or self.save_states_file
        if not path:
            raise ValueError("dump_env_states needs a path or saveStatesFile")
        if not self._episode_q:
            return 0
        rng = np.random.default_rng(rng)
        ep_len = len(self._episode_q)
        qs = np.stack(self._episode_q)   # (T, N, nq)
        qds = np.stack(self._episode_qd)
        rows_q, rows_qd = [], []
        if ep_len > 20:
            n_save = min(ep_len // 10, 50)
            for e in range(qs.shape[1]):
                t_idx = rng.choice(ep_len, size=n_save, replace=False)
                rows_q.append(qs[t_idx, e])
                rows_qd.append(qds[t_idx, e])
            # only drop the accumulation once rows were actually saved;
            # short-episode dumps keep accumulating (reference keeps
            # per-env buffers until an episode is dumped)
            self._episode_q, self._episode_qd = [], []
        if not rows_q:
            return 0
        new_q = np.concatenate(rows_q)
        new_qd = np.concatenate(rows_qd)
        if os.path.exists(path):
            old = np.load(path)
            new_q = np.concatenate([old["q"], new_q])
            new_qd = np.concatenate([old["qd"], new_qd])
        np.savez(path, q=new_q, qd=new_qd)
        return len(new_q)

    def _load_initial_states(self):
        bank = np.load(self.load_states_file)
        q, qd = bank["q"], bank["qd"]
        if q.shape[1] != self.model.nq or qd.shape[1] != self.model.nv:
            raise ValueError(
                f"state bank shape {q.shape}/{qd.shape} does not match "
                f"model nq={self.model.nq} nv={self.model.nv}"
            )
        self.initial_q = jnp.asarray(q, jnp.float32)
        self.initial_qd = jnp.asarray(qd, jnp.float32)

    # ---- init ---------------------------------------------------------
    def _sample_goal(self, key):
        kp_, kr = jax.random.split(key)
        u = jax.random.uniform(kp_, (3,))
        pos = self.vol_origin + self.vol_lo + u * (self.vol_hi - self.vol_lo)
        rr = jax.random.uniform(kr, (2,), minval=-1.0, maxval=1.0)
        return pos, randomize_rotation(rr[0], rr[1])

    def sample_init(self, rng):
        return self._init_with_tolerance(
            rng, jnp.asarray(self.success_tolerance)
        )

    def resample_init(self, rng, old_task):
        """Success-tolerance curriculum persists across resets
        (reference _extra_curriculum + get/set_env_state :472-494)."""
        return self._init_with_tolerance(rng, old_task["tolerance"])

    def _init_with_tolerance(self, rng, tolerance, successes=None):
        m = self.model
        kd, kv, ko, ky, kg, kk = jax.random.split(rng, 6)
        nd = 23
        dof = 0.1 * jax.random.uniform(kd, (nd,), minval=-1.0, maxval=1.0)
        dof = jnp.clip(dof, self.dof_lower, self.dof_upper)
        q = m.qpos0.at[self.q_idx].set(dof)
        qd = jnp.zeros(m.nv).at[self.v_idx].set(
            0.1 * jax.random.uniform(kv, (nd,), minval=-1.0, maxval=1.0)
        )
        dxy = jax.random.uniform(ko, (2,), minval=-1.0, maxval=1.0) * jnp.array(
            [0.1, 0.1]
        )
        pos = jnp.array([0.0, -0.8, self.obj_init_z]) + jnp.concatenate(
            [dxy, jnp.zeros(1)]
        )
        yaw = jax.random.uniform(ky, (), minval=-jnp.pi, maxval=jnp.pi)
        q = q.at[self.oq : self.oq + 3].set(pos)
        q = q.at[self.oq + 3 : self.oq + 7].set(
            maths.quat_from_angle_axis(yaw, jnp.array([0.0, 0, 1]))
        )
        if self.initial_q is not None:
            # reset from the loaded bank (reference :1292-1311: consecutive
            # rows per reset batch; a uniform gather is the batched analogue).
            # PD targets stay at the freshly randomized dof pose, matching
            # the reference, which keeps prev/cur_targets at the randomized
            # allegro_pos after loading bank dof states (:1300-1311).
            kb = jax.random.fold_in(kd, 1)
            idx = jax.random.randint(kb, (), 0, self.initial_q.shape[0])
            q = self.initial_q[idx]
            qd = self.initial_qd[idx]
        goal_pos, goal_rot = self._sample_goal(kg)
        task = {
            "goal_pos": goal_pos,
            "goal_rot": goal_rot,
            "successes": jnp.zeros(()),
            "near_goal_steps": jnp.zeros((), jnp.int32),
            "lifted": jnp.zeros((), bool),
            "closest_tip_dist": -jnp.ones(4),  # sentinel: set on 1st step
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
                    "kuka_actions_penalty",
                    "allegro_actions_penalty",
                    "bonus_rew",
                )
            },
        }
        if successes is not None:
            task["successes"] = successes
        return q, qd, task

    # ---- control: PD position targets over all 23 dofs -----------------
    def compute_force(self, action, q, qd, task):
        m = self.model
        cur = maths.scale(action, self.dof_lower, self.dof_upper)
        cur = jnp.clip(cur, self.dof_lower, self.dof_upper)
        q_target = jnp.zeros(m.nq).at[self.q_idx].set(cur)
        return jnp.zeros(m.nv), jnp.zeros((m.nbody, 6)), q_target

    # ---- observations (full_state composition :185-232) ----------------
    def _keypoints(self, pos, quat):
        nk = self.num_keypoints
        return pos[None, :] + maths.quat_rotate(
            jnp.broadcast_to(quat, (nk, 4)), self.keypoint_offsets
        )

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        obj_pos = q[self.oq : self.oq + 3]
        obj_rot = q[self.oq + 3 : self.oq + 7]
        palm = kin.x[self.palm_body] + maths.quat_rotate(
            kin.quat[self.palm_body], self.palm_offset
        )
        palm_quat = kin.quat[self.palm_body]
        pv = kin.v[self.palm_body]
        palm_lin = pv[3:] + jnp.cross(pv[:3], palm)
        tips = kin.x[self.tip_bodies]
        tip_rel = (tips - obj_pos[None, :]).reshape(-1)
        kp_obj = self._keypoints(obj_pos, obj_rot)
        kp_goal = self._keypoints(task["goal_pos"], task["goal_rot"])
        kp_dist = jnp.linalg.norm(kp_obj - kp_goal, axis=-1)
        tip_dist = jnp.linalg.norm(tips - obj_pos[None, :], axis=-1)
        return jnp.concatenate(
            [
                q[self.q_idx],
                qd[self.v_idx],
                palm,
                palm_quat,
                palm_lin,
                pv[:3],
                obj_rot,
                qd[self.ov : self.ov + 3],
                qd[self.ov + 3 : self.ov + 6],
                tip_rel,
                (kp_obj - kp_goal).reshape(-1),
                (kp_obj - obj_pos[None, :]).reshape(-1),
                jnp.full(3, OBJ_SIZE),
                jnp.max(kp_dist)[None],
                task["lifted"].astype(jnp.float32)[None],
                jnp.stack(
                    [
                        progress.astype(jnp.float32) / self.max_episode_length,
                        task["successes"],
                    ]
                ),
                tip_dist,
                jnp.zeros(1),  # last reward slot (filled post-hoc in ref)
            ]
        )

    # ---- staged reward (compute_kuka_reward :854-905) ------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        obj_pos = q[self.oq : self.oq + 3]
        obj_rot = q[self.oq + 3 : self.oq + 7]
        tips = kin.x[self.tip_bodies]

        # lifting stage
        z_lift = 0.05 + obj_pos[2] - self.obj_init_z
        lifting_rew = jnp.clip(z_lift, 0.0, 0.5)
        lifted = (z_lift > self.lifting_threshold) | task["lifted"]
        just_lifted = lifted & ~task["lifted"]
        lifting_rew = lifting_rew * (~lifted) * self.lifting_rew_scale
        lift_bonus = self.lifting_bonus * just_lifted

        # fingertip approach stage (distance-delta, closest-so-far)
        tip_dist = jnp.linalg.norm(tips - obj_pos[None, :], axis=-1)
        closest = jnp.where(
            task["closest_tip_dist"] < 0, tip_dist, task["closest_tip_dist"]
        )
        tip_delta = jnp.clip(closest - tip_dist, 0.0, 10.0)
        closest = jnp.minimum(closest, tip_dist)
        tip_delta_rew = (
            jnp.sum(tip_delta) * (~lifted) * self.dist_delta_rew_scale
        )

        # keypoint stage (only after lifting)
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

        # action penalties on dof velocities (:831-840)
        kuka_pen = -self.kuka_pen_scale * jnp.sum(jnp.abs(qd[self.v_idx[:7]]))
        allegro_pen = -self.allegro_pen_scale * jnp.sum(
            jnp.abs(qd[self.v_idx[7:]])
        )
        pen = kuka_pen + allegro_pen

        # success machinery (:860-875)
        tol_kp = task["tolerance"] * self.keypoint_scale / OBJ_SIZE
        near_goal = kp_max <= tol_kp
        near_goal_steps = task["near_goal_steps"] + near_goal
        is_success = near_goal_steps >= self.success_steps
        successes = task["successes"] + is_success
        bonus = near_goal * (self.reach_goal_bonus / self.success_steps)

        reward = lifting_rew + lift_bonus + tip_delta_rew + kp_rew + pen + bonus

        # goal-only reset on success + tolerance curriculum
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
            # per-step reward terms for the trainer's episode_cumulative
            # stats (reference compute_kuka_reward term list,
            # allegro_kuka_base.py:913-928)
            "rew_terms": {
                "fingertip_delta_rew": tip_delta_rew,
                "lifting_rew": lifting_rew,
                "lift_bonus_rew": lift_bonus,
                "keypoint_rew": kp_rew,
                "kuka_actions_penalty": kuka_pen,
                "allegro_actions_penalty": allegro_pen,
                "bonus_rew": bonus,
            },
        }
        return reward, done, new_task

    def true_objective(self, q, qd):
        """PBT objective = consecutive successes (reference
        _true_objective in the reorientation subtask)."""
        return jnp.zeros(())

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        # successes feeds the play-loop eval-stats aggregation (the
        # reference's evalStats printer, allegro_kuka_base.py:932-969)
        return {
            "true_objective": task["successes"],
            "successes": task["successes"],
            # per-step term dict consumed by the trainer's in-rollout
            # episode_cumulative accumulator (learn/ppo.py; reference
            # rlgames_utils.py:157-172 deque observer)
            "episode_cumulative": task["rew_terms"],
        }


class AllegroKukaRegrasping(AllegroKukaReorientation):
    """Regrasping subtask: position-only goal (single centroid keypoint);
    each success puts the object back on the table for another grasp.

    Parity target: reference allegro_kuka_regrasping.py
    (_object_keypoint_offsets = [[0,0,0]] :49-51; _reset_target resets
    the object pose to the table and clears the lifted flag on every
    goal reset :77-100). TPU-shaped divergence: the object return to the
    table is an episode boundary (full env re-init) with the consecutive-
    success count and tolerance carried through `resample_init`, instead
    of a mid-episode root-state write.
    """

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
        # success ends the episode (object goes back on the table)
        return reward, done | new_task["last_success"], new_task


class AllegroKukaThrow(AllegroKukaRegrasping):
    """Throw subtask: the target bucket sits outside the arm's reach, so
    the object must be thrown (reference allegro_kuka_throw.py: goal
    volume displaced far from the table; single centroid keypoint; the
    lifting stage still gates the keypoint reward)."""

    def _setup(self):
        super()._setup()
        # bucket volume well beyond the reachable workspace
        # (allegro_kuka_throw.py _reset_target: x/y in [-1, 1] x [1.1, 2])
        self.vol_origin = jnp.array([0.0, 1.5, 0.35])
        self.vol_lo = jnp.array([-1.0, -0.4, -0.1])
        self.vol_hi = jnp.array([1.0, 0.5, 0.1])
