"""DeXtreme: AllegroHand in-hand reorientation hardened for sim-to-real
with ADR-controlled observation/action corruption and a Random Network
Adversary.

Parity target: reference isaacgymenvs/tasks/dextreme/allegro_hand_dextreme.py
(ADR param consumption via get_adr_tensor; action latency queue :1316,:1358
and apply_action_noise_latency :951; per-env affine obs/action corruption
tensors :1360-1368; simulated-camera cube-pose refresh/delay
get_random_cube_observation :739; RNA application :864-895 with
`rna_alpha` from ADR :1389-1390; ManualDR vs ADR subclasses :1347,:1500)
plus cfg/task/AllegroHandDextremeADR.yaml (`adr:` block :227-420).

TPU-native design notes (divergences, all documented in README):
  * the reference's dict observation space is flattened: the POLICY sees
    the corrupted ("_randomized") observation vector, the asymmetric
    CRITIC sees the clean full state -- the same information split,
    without a dict-obs pipeline;
  * ADR drives both the tensorized corruption stack (latency, affine
    noise, camera sim, RNA alpha) and, like the reference, routes
    physics-property params into the dict-DR engine via `range_path:`
    (dr/adr.py: evolving ranges override the matching static DR spec's
    range per step);
  * affine corruption: the reference samples per-episode additive biases
    and per-step white noise scaled by ADR stdevs; identical here, with
    unit draws stored at reset and scaled at use time so fresh ADR
    values apply without resampling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..utils.rna import RandomNetworkAdversary
from .allegro_hand import AllegroHand

ACT_HIST = 16  # action-latency queue depth (covers actionLatencyMax=15)


class AllegroHandDextremeADR(AllegroHand):
    """ADR variant: corruption magnitudes evolve with boundary-worker
    performance (EnvState.adr; runtime in envcore/vec_task.py)."""

    frames_in_task = True  # the EMA anneal needs the global frame count

    def __init__(self, cfg):
        env = cfg["env"]
        # actionsMovingAverage may be the reference's annealed-schedule
        # dict {range: [lo, up], schedule_steps, schedule_freq}: the EMA
        # coefficient anneals upper -> lower over schedule_steps frames
        # (allegro_hand_dextreme.py:898-909; freq only quantizes updates)
        ma = env.get("actionsMovingAverage", 1.0)
        if isinstance(ma, dict):
            rng_ = ma.get("range", [0.15, 0.2])
            self._ma_lower = float(rng_[0])
            self._ma_upper = float(rng_[1])
            self._ma_steps = float(ma.get("schedule_steps", 1.0))
            env["actionsMovingAverage"] = self._ma_upper
        else:
            self._ma_lower = self._ma_upper = float(ma)
            self._ma_steps = 1.0
        env.setdefault("observationType", "no_vel")
        env.setdefault("asymmetric_observations", True)
        env.setdefault("maxConsecutiveSuccesses", 50)
        self.action_delta_penalty_scale = float(
            env.get("actionDeltaPenaltyScale", -0.2)
        )
        self.apply_random_quat = bool(env.get("apply_random_quat", True))
        self.num_success_hold_steps = int(
            env.get("num_success_hold_steps", 1)
        )
        super().__init__(cfg)
        # policy obs: dof_pos(16) + cube pose(7) + goal_rot(4) +
        # quat_diff(4) + actions(16)
        self.num_obs = 47
        self.num_states = 88
        self.num_acts = 16
        if self.adr is None:
            raise ValueError(
                "AllegroHandDextremeADR requires an `adr:` cfg block with "
                "use_adr: true (cfg/task/AllegroHandDextremeADR.yaml)"
            )
        self._ai = {n: i for i, n in enumerate(self.adr.param_names())}
        # RNA input: dof_pos(16) + cube pose(7)
        self.rna = RandomNetworkAdversary(
            in_dim=23, num_actions=16,
            seed=int(self.cfg.get("seed", 0) or 0),
        )

    def _latency_cap(self, task):
        """Upper clamp on the per-step latency draw. The ADR variant is
        bounded only by the queue; ManualDR anneals the cap 0 ->
        actionLatencyMax over actionLatencyScheduledSteps (reference
        apply_action_noise_latency :1564-1576)."""
        return ACT_HIST - 1

    def _act_ma(self, task):
        t = task.get("_frames")
        if t is None or self._ma_lower == self._ma_upper:
            return self.act_moving_average
        frac = jnp.minimum(t.astype(jnp.float32) / self._ma_steps, 1.0)
        return self._ma_upper + (self._ma_lower - self._ma_upper) * frac

    def _sample_rot(self, key):
        # uniform random quaternion (reference get_random_quat via
        # apply_random_quat, allegro_hand_dextreme.py:1155,712)
        if not self.apply_random_quat:
            return super()._sample_rot(key)
        v = jax.random.normal(key, (4,))
        return v / jnp.linalg.norm(v)

    # -- adr param access ------------------------------------------------
    def _a(self, task, name, default=0.0):
        i = self._ai.get(name)
        return task["adr"][i] if i is not None else jnp.asarray(default)

    def adr_objective(self, task):
        """Consecutive successes -- the reference's ADR objective."""
        return task["successes"]

    # -- init ------------------------------------------------------------
    def sample_init(self, rng):
        rng, kb, kr = jax.random.split(rng, 3)
        q, qd, task = super().sample_init(rng)
        ka, kd_, kc = jax.random.split(kb, 3)
        oq = self.obj_q
        task.update(
            adr=jnp.zeros(self.adr.P),  # placeholder; runtime overwrites
            act_hist=jnp.zeros((ACT_HIST, 16)),
            bias_action_u=jax.random.normal(ka, (16,)),
            bias_dof_u=jax.random.normal(kd_, (16,)),
            bias_cube_u=jax.random.normal(kc, (7,)),
            rna_mask=self.rna.sample_mask(kr),
            cube_obs=q[oq : oq + 7],  # simulated-camera latched pose
            cube_age=jnp.zeros((), jnp.int32),
        )
        return q, qd, task

    # -- action corruption (latency -> affine -> RNA) --------------------
    def _corrupt_action(self, action, q, task):
        """Deterministic given task['key'] -- reward_done replays it to
        keep the moving-average target bookkeeping consistent with what
        physics actually applied."""
        kl, kw, ke = (
            jax.random.fold_in(task["key"], c) for c in (17, 18, 19)
        )
        # latency: delay the raw action stream by floor(action_latency)
        # (+1 with prob action_delay_prob), clamped to the queue depth
        lat = jnp.floor(self._a(task, "action_latency")).astype(jnp.int32)
        lat = lat + jax.random.bernoulli(
            ke, jnp.clip(self._a(task, "action_delay_prob"), 0.0, 1.0)
        ).astype(jnp.int32)
        lat = jnp.clip(lat, 0, self._latency_cap(task))
        hist = task["act_hist"]  # hist[0] = a_{t-1}
        stream = jnp.concatenate([action[None], hist[:-1]], axis=0)
        a = stream[lat]
        # affine corruption: + b (per episode) + c (white, per step)
        a = (
            a
            + self._a(task, "affine_action_additive") * task["bias_action_u"]
            + self._a(task, "affine_action_white")
            * jax.random.normal(kw, (16,))
        )
        # random network adversary
        rna_in = jnp.concatenate(
            [q[self.hand_q_idx], q[self.obj_q : self.obj_q + 7]]
        )
        a_rna = self.rna(task["rna_mask"], rna_in)
        alpha = jnp.clip(self._a(task, "rna_alpha"), 0.0, 1.0)
        a = (1.0 - alpha) * a + alpha * a_rna
        return jnp.clip(a, -1.0, 1.0)

    def compute_force(self, action, q, qd, task):
        return super().compute_force(
            self._corrupt_action(action, q, task), q, qd, task
        )

    # per-component layout of the flat policy obs: the reference's dict
    # observation keys in order (get_num_obs_dict
    # allegro_hand_dextreme.py:168; the flat vector is their fixed-order
    # concatenation -- consumers can re-dict it via obs_spec())
    OBS_SPEC = {
        "dof_pos_randomized": 16,
        "object_pose_cam_randomized": 7,
        "goal_pose": 4,
        "goal_relative_rot_cam_randomized": 4,
        "last_actions": 16,
    }

    def obs_spec(self):
        """{key: (offset, size)} view of the flat policy obs, matching
        the reference's dict-observation keys."""
        out, off = {}, 0
        for k, n in self.OBS_SPEC.items():
            out[k] = (off, n)
            off += n
        return out

    # -- observations ----------------------------------------------------
    def observe(self, q, qd, kin, sensors, task, actions, progress):
        """The corrupted policy view (the reference's `_randomized` keys,
        docs/dextreme.md:14-54)."""
        kd_, kc = (jax.random.fold_in(task["key"], c) for c in (23, 24))
        dof = maths.unscale(q[self.hand_q_idx], self.dof_lower, self.dof_upper)
        dof = (
            dof
            + self._a(task, "affine_dof_pos_additive") * task["bias_dof_u"]
            + self._a(task, "affine_dof_pos_white")
            * jax.random.normal(kd_, (16,))
        )
        cube = (
            task["cube_obs"]  # latched camera pose, not the live state
            + self._a(task, "affine_cube_pose_additive") * task["bias_cube_u"]
            + self._a(task, "affine_cube_pose_white")
            * jax.random.normal(kc, (7,))
        )
        goal_rot = task["goal_rot"]
        quat_diff = maths.quat_mul(cube[3:7], maths.quat_conjugate(goal_rot))
        return jnp.concatenate([dof, cube, goal_rot, quat_diff, actions])

    def observe_state(self, q, qd, kin, sensors, task, actions, progress):
        """Clean full state for the asymmetric critic."""
        return self._obs_impl(q, qd, kin, sensors, task, actions, "full_state")

    # -- reward + per-step task-state updates ----------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        reward, done, new_task = super().reward_done(
            obs, q, qd, kin, sensors, task, actions, progress
        )
        # the physics consumed the corrupted action; keep the moving-
        # average target state consistent by replaying the corruption
        a_c = self._corrupt_action(actions, q, task)
        new_task["targets"] = self._recompute_targets(task, a_c)
        # dextreme-only reward terms (reference compute_hand_reward
        # allegro_hand_dextreme.py:1617-1626): smoothness penalty on the
        # PD-target delta + hand dof velocity penalty -0.05*(v/4)^2
        tgt_delta = new_task["targets"] - task["targets"]
        reward = reward + self.action_delta_penalty_scale * jnp.sum(
            tgt_delta**2
        )
        hand_vel = qd[jnp.asarray(self.scalar_dof_indices)]
        reward = reward - 0.05 * jnp.sum((hand_vel / 4.0) ** 2)
        # action-latency queue push (raw policy action stream)
        new_task["act_hist"] = jnp.concatenate(
            [actions[None], task["act_hist"][:-1]], axis=0
        )
        # simulated camera: hold the cube pose for cube_pose_refresh_rate
        # steps, with an extra stochastic hold (:739)
        kh = jax.random.fold_in(task["key"], 29)
        age = task["cube_age"] + 1
        rate = jnp.floor(
            jnp.maximum(self._a(task, "cube_pose_refresh_rate", 1.0), 1.0)
        ).astype(jnp.int32)
        hold = jax.random.bernoulli(
            kh, jnp.clip(self._a(task, "cube_obs_delay_prob"), 0.0, 1.0)
        )
        refresh = (age >= rate) & ~hold
        oq = self.obj_q
        new_task["cube_obs"] = jnp.where(
            refresh, q[oq : oq + 7], task["cube_obs"]
        )
        new_task["cube_age"] = jnp.where(refresh, 0, age)
        # carried corruption state
        for k in ("adr", "bias_action_u", "bias_dof_u", "bias_cube_u",
                  "rna_mask"):
            new_task[k] = task[k]
        return reward, done, new_task

    def true_objective(self, q, qd):
        return jnp.zeros(())


class AllegroHandDextremeManualDR(AllegroHandDextremeADR):
    """ManualDR variant (reference :1347): the same corruption stack with
    FIXED magnitudes (midpoints of the cfg init ranges) -- no range
    evolution, no boundary workers."""

    def _latency_cap(self, task):
        t = task.get("_frames")
        if t is None or self._lat_sched <= 0:
            return ACT_HIST - 1
        cur = jnp.floor(
            self._lat_max
            * jnp.minimum(t.astype(jnp.float32) / self._lat_sched, 1.0)
        ).astype(jnp.int32)
        return jnp.minimum(cur, ACT_HIST - 1)

    def __init__(self, cfg):
        self._lat_max = float(cfg["env"].get("actionLatencyMax", 15))
        self._lat_sched = float(
            cfg["env"].get("actionLatencyScheduledSteps", 10_000_000)
        )
        adr_cfg = cfg["env"].get("adr") or cfg.get("adr") or {}
        adr_cfg["use_adr"] = True  # reuse the sampler machinery
        adr_cfg["update_adr_ranges"] = False
        cfg["env"]["adr"] = adr_cfg
        super().__init__(cfg)
