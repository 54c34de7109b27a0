"""ShadowHand: in-hand object reorientation to target poses.

Parity target: reference isaacgymenvs/tasks/shadow_hand.py (obs schemes
compute_fingertip_observations :473-497 / compute_full_observations :498-527
/ compute_full_state :528-586; reward compute_hand_reward :746-805 incl.
consecutive-success tracking and goal-only resets; reset sampling
reset_idx :604-670; position-target control with moving average
pre_physics_step :670-708; random object forces :700-712; fixed-tendon
coupling setup :255-266) and cfg/task/ShadowHand.yaml.

Scene = hand model (fixed base at z=0.5) + free object, composed into one
forest. The goal object is pure task state (never simulated; the reference
goal actor has gravity disabled and collision filtered away). Hand-object
contact uses candidate-point-vs-geom pairs (hand mesh contact points vs
the object's box/mesh geom).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..envcore.vec_task import VecTask
from ..model import load_mjcf, load_urdf
from ..model.compose import compose
from ..utils.assets import asset_path


def randomize_rotation(rand0, rand1):
    """(reference shadow_hand.py:808-811)"""
    x_unit = jnp.array([1.0, 0.0, 0.0])
    y_unit = jnp.array([0.0, 1.0, 0.0])
    return maths.quat_mul(
        maths.quat_from_angle_axis(rand0 * jnp.pi, x_unit),
        maths.quat_from_angle_axis(rand1 * jnp.pi, y_unit),
    )


class ShadowHand(VecTask):
    use_pd_targets = True
    # goal must stay within tolerance for hold_count > this to count as
    # reached (reference dextreme hold_count_buf:1630-1632; 0 = classic
    # ShadowHand immediate success)
    num_success_hold_steps = 0
    fingertip_names = (
        "robot0:ffdistal", "robot0:mfdistal", "robot0:rfdistal",
        "robot0:lfdistal", "robot0:thdistal",
    )

    def __init__(self, cfg):
        env = cfg["env"]
        self.dist_reward_scale = float(env.get("distRewardScale", -10.0))
        self.rot_reward_scale = float(env.get("rotRewardScale", 1.0))
        self.action_penalty_scale = float(env.get("actionPenaltyScale", -0.0002))
        self.success_tolerance = float(env.get("successTolerance", 0.1))
        self.reach_goal_bonus = float(env.get("reachGoalBonus", 250.0))
        self.fall_dist = float(env.get("fallDistance", 0.24))
        self.fall_penalty = float(env.get("fallPenalty", 0.0))
        self.rot_eps = float(env.get("rotEps", 0.1))
        self.vel_obs_scale = 0.2
        self.force_torque_obs_scale = 10.0
        self.reset_position_noise = float(env.get("resetPositionNoise", 0.01))
        self.reset_rotation_noise = float(env.get("resetRotationNoise", 0.0))
        self.reset_dof_pos_noise = float(env.get("resetDofPosRandomInterval", 0.2))
        self.reset_dof_vel_noise = float(env.get("resetDofVelRandomInterval", 0.0))
        self.force_scale = float(env.get("forceScale", 0.0))
        self.force_prob_range = tuple(env.get("forceProbRange", [0.001, 0.1]))
        self.force_decay = float(env.get("forceDecay", 0.99))
        self.force_decay_interval = float(env.get("forceDecayInterval", 0.08))
        self.dof_speed_scale = float(env.get("dofSpeedScale", 20.0))
        self.use_relative_control = bool(env.get("useRelativeControl", False))
        # capped-dof-velocity target mode (reference dextreme
        # apply_actions use_capped_dof_control branch)
        self.use_capped_dof_control = bool(
            env.get("use_capped_dof_control", False)
        )
        self.max_dof_radians_per_second = float(
            env.get("max_dof_radians_per_second", 2.0 * np.pi)
        )
        self.act_moving_average = float(env.get("actionsMovingAverage", 1.0))
        self.max_consecutive_successes = int(env.get("maxConsecutiveSuccesses", 0))
        # resetTime (seconds) > 0 overwrites episodeLength (reference
        # shadow_hand.py:81 + dextreme variants: round(t / (cfi * dt)))
        reset_time = float(env.get("resetTime", -1.0))
        if reset_time > 0.0:
            _dt = float(cfg.get("sim", {}).get("dt", 1.0 / 60.0))
            _cfi = int(env.get("controlFrequencyInv", 1))
            env["episodeLength"] = int(round(reset_time / (_cfi * _dt)))
        self.av_factor = float(env.get("averFactor", 0.1))
        self.object_type = str(env.get("objectType", "block"))
        self.ignore_z = self.object_type == "pen"
        self.obs_type = str(env.get("observationType", "full_state"))
        self.asymmetric_obs = bool(env.get("asymmetric_observations", False))
        # "no_vel" = the dextreme-era alias for the no-velocity layout
        num_obs_dict = {"openai": 42, "no_vel": 77, "full_no_vel": 77, "full": 157, "full_state": 211}
        self.num_obs = num_obs_dict[self.obs_type]
        self.num_states = 211 if self.asymmetric_obs else 0
        self.num_acts = 20
        env.setdefault("episodeLength", 600)
        super().__init__(cfg)
        self._setup_indices()

    # ------------------------------------------------------------------
    def dr_actor_ranges(self):
        return getattr(self, "_actor_ranges", None)

    def _sample_rot(self, key):
        """Goal/object rotation draw: ShadowHand uses the reference's
        two-angle randomize_rotation; DeXtreme overrides with uniform
        quaternions (apply_random_quat, allegro_hand_dextreme.py:712)."""
        r = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0)
        return randomize_rotation(r[0], r[1])

    def build_model(self):
        env = self.cfg["env"]
        hand = load_mjcf(
            asset_path("mjcf/open_ai_assets/hand/shadow_hand.xml")
        )
        # tendon limit springs (reference shadow_hand.py:255-266)
        nt = len(hand.tendon_names)
        stiff = np.zeros(nt, np.float32)
        damp = np.zeros(nt, np.float32)
        for i, n in enumerate(hand.tendon_names):
            if n.endswith("J1c"):
                stiff[i] = 30.0
                damp[i] = 0.1
        hand = hand.replace(
            tendon_stiffness=jnp.asarray(stiff), tendon_damping=jnp.asarray(damp)
        )
        # drive damping for the position servos (PhysX derives ~0.1 from
        # the MJCF damping defaults; kp came from the <position> actuators)
        hand = hand.replace(
            dof_damping=jnp.maximum(hand.dof_damping, 0.1)
        )

        asset_files = {
            "block": "urdf/objects/cube_multicolor.urdf",
            "egg": "mjcf/open_ai_assets/hand/egg.xml",
            "pen": "mjcf/open_ai_assets/hand/pen.xml",
        }
        obj_file = asset_files[self.object_type]
        if obj_file.endswith(".urdf"):
            obj = load_urdf(asset_path(obj_file))
        else:
            obj = load_mjcf(asset_path(obj_file))

        model, refs = compose([hand, obj], ["", "object:"])
        self.hand_ref, self.obj_ref = refs
        # DR actor scoping (reference randomizes per actor handle)
        self._actor_ranges = {
            "hand": (0, self.obj_ref.body0),
            "object": (self.obj_ref.body0, self.obj_ref.body0 + obj.nbody),
        }

        # hand base pose: z = 0.5 (shadow_hand.py:404-405); hand root fixed
        model = model.replace(
            body_pos=model.body_pos.at[0].set(jnp.array([0.0, 0.0, 0.5]))
        )

        # hand-object contact: every hand candidate point vs the object's
        # first geom; plane contacts off (nothing reaches the ground before
        # the fall-distance reset triggers)
        hand_pts = tuple(
            c
            for c in range(model.ncp)
            if model.cpoint_body[c] < self.obj_ref.body0
        )
        obj_geom = next(
            g
            for g in range(model.ngeom)
            if model.geom_body[g] >= self.obj_ref.body0
        )
        model = model.replace(
            ppair_point=hand_pts,
            ppair_geom=tuple(obj_geom for _ in hand_pts),
            plane_contacts=False,
        )
        return model, self.sim_params_from_cfg()

    def _setup_indices(self):
        m = self.model
        href, oref = self.hand_ref, self.obj_ref
        sdofs = self.scalar_dof_indices
        self.hand_dofs = jnp.asarray([d for d in sdofs if d < href.v0 + href.nv])
        self.num_hand_dofs = len(sdofs)  # 24 scalar dofs, all on the hand
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in self.scalar_dof_indices])
        self.hand_q_idx = jnp.asarray(sq)
        lo = np.asarray(m.dof_limit_lower)[self.scalar_dof_indices]
        hi = np.asarray(m.dof_limit_upper)[self.scalar_dof_indices]
        self.dof_lower = jnp.asarray(lo)
        self.dof_upper = jnp.asarray(hi)
        # actuated dofs (20, position servos), as scalar-dof positions
        act_dof = np.asarray(m.actuator_dof)
        sd_list = list(self.scalar_dof_indices)
        self.actuated_idx = jnp.asarray([sd_list.index(d) for d in act_dof])
        self.default_dof_pos = jnp.zeros(self.num_hand_dofs)
        # object q/v addressing
        self.obj_q = m.q_adr[oref.body0]
        self.obj_v = m.v_adr[oref.body0]
        self.obj_body = oref.body0
        # fingertips (reference fingertips list :120)
        self.fingertip_bodies = jnp.asarray(
            [m.body_names.index(t) for t in self.fingertip_names]
        )
        # start poses (shadow_hand.py:404-418)
        self.object_start_pos = jnp.array([0.0, -0.39, 0.6])
        self.goal_displacement = jnp.array([-0.2, -0.06, 0.12 - 0.04])
        if self.object_type == "pen":
            self.object_start_pos = jnp.array([0.0, -0.39, 0.52])
        self.goal_start_pos = self.object_start_pos + jnp.array([0.0, 0.0, -0.04])
        obj_mass = float(np.asarray(m.body_mass)[self.obj_body])
        self.object_mass = obj_mass

    # ---- init / reset ---------------------------------------------------
    def sample_init(self, rng):
        m = self.model
        kd, kv, kp, kr, kg, kfp, kkeep = jax.random.split(rng, 7)
        nhd = self.num_hand_dofs
        # hand dofs: default + noise * rand_delta (shadow_hand.py:646-655)
        r = jax.random.uniform(kd, (nhd,), minval=-1.0, maxval=1.0)
        delta_max = self.dof_upper - self.default_dof_pos
        delta_min = self.dof_lower - self.default_dof_pos
        rand_delta = delta_min + (delta_max - delta_min) * 0.5 * (r + 1.0)
        dof_pos = self.default_dof_pos + self.reset_dof_pos_noise * rand_delta
        dof_vel = self.reset_dof_vel_noise * jax.random.uniform(
            kv, (nhd,), minval=-1.0, maxval=1.0
        )
        q = m.qpos0
        q = q.at[self.hand_q_idx].set(dof_pos)
        qd = jnp.zeros(m.nv)
        qd = qd.at[jnp.asarray(self.scalar_dof_indices)].set(dof_vel)

        # object pose (shadow_hand.py:618-633)
        dp = jax.random.uniform(kp, (3,), minval=-1.0, maxval=1.0)
        obj_pos = self.object_start_pos + self.reset_position_noise * dp
        obj_rot = self._sample_rot(kr)
        oq = self.obj_q
        q = q.at[oq : oq + 3].set(obj_pos).at[oq + 3 : oq + 7].set(obj_rot)

        # goal rotation (reset_target_pose :587-602)
        goal_rot = self._sample_rot(kg)

        # random-force probability per env (log-uniform, :352-355)
        lo, hi = self.force_prob_range
        u = jax.random.uniform(kfp, ())
        force_prob = jnp.exp(
            (jnp.log(lo) - jnp.log(hi)) * u + jnp.log(hi)
        )
        task = {
            "goal_rot": goal_rot,
            "successes": jnp.zeros(()),
            "hold": jnp.zeros((), jnp.int32),
            "targets": dof_pos,  # prev position targets
            "rb_force": jnp.zeros(3),
            "force_prob": force_prob,
            "key": kkeep,
            "rew_terms": {
                k: jnp.zeros(())
                for k in (
                    "dist_rew",
                    "rot_rew",
                    "action_penalty",
                    "reach_goal_rew",
                    "fall_rew",
                    "timeout_rew",
                )
            },
        }
        return q, qd, task

    # ---- control --------------------------------------------------------
    def compute_force(self, action, q, qd, task):
        m = self.model
        prev = task["targets"]
        act_idx = self.actuated_idx
        lo = self.dof_lower[act_idx]
        hi = self.dof_upper[act_idx]
        if self.use_relative_control:
            targets = prev[act_idx] + self.dof_speed_scale * self.dt * action
            cur = jnp.clip(targets, lo, hi)
        else:
            cur = maths.scale(action, lo, hi)
            av = self._act_ma(task)
            cur = av * cur + (1.0 - av) * prev[act_idx]
            cur = jnp.clip(cur, lo, hi)
        full = prev.at[act_idx].set(cur)
        q_target = jnp.zeros(m.nq).at[self.hand_q_idx].set(full)

        # random object force (decayed impulse state, :700-712)
        xfrc = jnp.zeros((m.nbody, 6))
        if self.force_scale > 0.0:
            f_w = maths.quat_rotate(q[self.obj_q + 3 : self.obj_q + 7], task["rb_force"])
            x_b = q[self.obj_q : self.obj_q + 3]
            xfrc = xfrc.at[self.obj_body].set(
                jnp.concatenate([jnp.cross(x_b, f_w), f_w])
            )
        return jnp.zeros(m.nv), xfrc, q_target

    # ---- observations ---------------------------------------------------
    def _object_state(self, q, qd):
        oq, ov = self.obj_q, self.obj_v
        return (
            q[oq : oq + 3],
            q[oq + 3 : oq + 7],
            qd[ov : ov + 3],
            qd[ov + 3 : ov + 6],
        )

    def _fingertip_state(self, q, qd, kin):
        idx = self.fingertip_bodies
        pos = kin.x[idx]
        rot = kin.quat[idx]
        w = kin.v[idx, :3]
        vlin = kin.v[idx, 3:] + jnp.cross(w, pos)  # velocity at body origin
        return jnp.concatenate([pos, rot, vlin, w], axis=-1)  # (5, 13)

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        return self._obs_impl(q, qd, kin, sensors, task, actions, self.obs_type)

    def observe_state(self, q, qd, kin, sensors, task, actions, progress):
        return self._obs_impl(q, qd, kin, sensors, task, actions, "full_state")

    def _obs_impl(self, q, qd, kin, sensors, task, actions, obs_type):
        obj_pos, obj_rot, obj_linvel, obj_angvel = self._object_state(q, qd)
        goal_rot = task["goal_rot"]
        goal_pos = self.goal_start_pos
        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(goal_rot))
        ft_state = self._fingertip_state(q, qd, kin)  # (5, 13)
        dof_pos = q[self.hand_q_idx]
        dof_vel = qd[jnp.asarray(self.scalar_dof_indices)]

        if obs_type == "openai":
            return jnp.concatenate(
                [
                    ft_state[:, 0:3].reshape(-1),
                    obj_pos,
                    quat_diff,
                    actions,
                ]
            )
        if obs_type in ("full_no_vel", "no_vel"):
            return jnp.concatenate(
                [
                    maths.unscale(dof_pos, self.dof_lower, self.dof_upper),
                    obj_pos,
                    obj_rot,
                    goal_pos,
                    goal_rot,
                    quat_diff,
                    ft_state[:, 0:3].reshape(-1),
                    actions,
                ]
            )
        if obs_type == "full":
            return jnp.concatenate(
                [
                    maths.unscale(dof_pos, self.dof_lower, self.dof_upper),
                    self.vel_obs_scale * dof_vel,
                    obj_pos,
                    obj_rot,
                    obj_linvel,
                    self.vel_obs_scale * obj_angvel,
                    goal_pos,
                    goal_rot,
                    quat_diff,
                    ft_state.reshape(-1),
                    actions,
                ]
            )
        # full_state (211)
        dof_force = sensors.dof_force[jnp.asarray(self.scalar_dof_indices)]
        ft_wrench = jnp.concatenate(
            [
                sensors.body_force[self.fingertip_bodies],
                sensors.body_torque[self.fingertip_bodies],
            ],
            axis=-1,
        ).reshape(-1)
        return jnp.concatenate(
            [
                maths.unscale(dof_pos, self.dof_lower, self.dof_upper),
                self.vel_obs_scale * dof_vel,
                self.force_torque_obs_scale * dof_force,
                obj_pos,
                obj_rot,
                obj_linvel,
                self.vel_obs_scale * obj_angvel,
                goal_pos,
                goal_rot,
                quat_diff,
                ft_state.reshape(-1),
                self.force_torque_obs_scale * ft_wrench,
                actions,
            ]
        )

    # ---- reward ---------------------------------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        obj_pos, obj_rot, _, _ = self._object_state(q, qd)
        goal_rot = task["goal_rot"]
        goal_pos = self.goal_start_pos
        goal_dist = jnp.linalg.norm(obj_pos - goal_pos)
        tol = 2.0 * self.success_tolerance if self.ignore_z else self.success_tolerance

        quat_diff = maths.quat_mul(obj_rot, maths.quat_conjugate(goal_rot))
        rot_dist = 2.0 * jnp.arcsin(
            jnp.minimum(jnp.linalg.norm(quat_diff[0:3]), 1.0)
        )

        dist_rew = goal_dist * self.dist_reward_scale
        rot_rew = 1.0 / (jnp.abs(rot_dist) + self.rot_eps) * self.rot_reward_scale
        action_penalty = jnp.sum(actions**2)
        reward = dist_rew + rot_rew + action_penalty * self.action_penalty_scale

        in_tol = jnp.abs(rot_dist) <= tol
        hold = jnp.where(in_tol, task["hold"] + 1, 0)
        goal_reached = hold > self.num_success_hold_steps
        successes = task["successes"] + goal_reached
        reward = jnp.where(goal_reached, reward + self.reach_goal_bonus, reward)
        fell = goal_dist >= self.fall_dist
        reward = jnp.where(fell, reward + self.fall_penalty, reward)

        done = fell
        if self.max_consecutive_successes > 0:
            progress = jnp.where(in_tol, 0, progress)
            done = done | (successes >= self.max_consecutive_successes)
        done = done | (progress >= self.max_episode_length - 1)
        if self.max_consecutive_successes > 0:
            reward = jnp.where(
                progress >= self.max_episode_length - 1,
                reward + 0.5 * self.fall_penalty,
                reward,
            )

        # goal-only reset: resample target rotation on success (:587-602)
        key, kg, kf, kfd = jax.random.split(task["key"], 4)
        new_goal = self._sample_rot(kg)
        goal_rot = jnp.where(goal_reached, new_goal, goal_rot)

        # random force state update (decay + Poisson-style kicks, :700-712)
        rb_force = task["rb_force"] * (
            self.force_decay ** (self.dt / self.force_decay_interval)
        )
        if self.force_scale > 0.0:
            kick = jax.random.uniform(kf, ()) < task["force_prob"]
            new_force = (
                jax.random.normal(kfd, (3,))
                * self.object_mass
                * self.force_scale
            )
            rb_force = jnp.where(kick, new_force, rb_force)

        new_task = {
            "goal_rot": goal_rot,
            "successes": successes,
            "hold": jnp.where(goal_reached, 0, hold),
            "targets": self._recompute_targets(task, actions),
            "rb_force": rb_force,
            "force_prob": task["force_prob"],
            "key": key,
            # per-step reward terms for episode_cumulative stats
            # (reference dextreme producer, allegro_hand_dextreme.py
            # :455-464; the plain ShadowHand terms are the subset it
            # shares with compute_hand_reward)
            "rew_terms": {
                "dist_rew": dist_rew,
                "rot_rew": rot_rew,
                "action_penalty": action_penalty * self.action_penalty_scale,
                "reach_goal_rew": goal_reached * self.reach_goal_bonus,
                "fall_rew": fell * self.fall_penalty,
                "timeout_rew": (
                    (progress >= self.max_episode_length - 1)
                    * (0.5 * self.fall_penalty)
                    if self.max_consecutive_successes > 0
                    else jnp.zeros(())
                ),
            },
        }
        return reward, done, new_task

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        """Consecutive-success stat for the eval printer / TB (reference
        shadow_hand.py:426-435 success-stat printer + av_factor track)."""
        return {
            "consecutive_successes": task["successes"],
            "episode_cumulative": task["rew_terms"],
        }

    def _act_ma(self, task):
        """EMA coefficient for target smoothing; DeXtreme overrides with
        the annealed schedule (allegro_hand_dextreme.py:898-909)."""
        return self.act_moving_average

    def _recompute_targets(self, task, action):
        prev = task["targets"]
        act_idx = self.actuated_idx
        lo = self.dof_lower[act_idx]
        hi = self.dof_upper[act_idx]
        if self.use_relative_control:
            cur = jnp.clip(
                prev[act_idx] + self.dof_speed_scale * self.dt * action, lo, hi
            )
        elif self.use_capped_dof_control:
            # cap the per-step target delta at max_dof_radians_per_second
            tgt = maths.scale(action, lo, hi)
            max_d = (
                self.max_dof_radians_per_second
                * self.dt
                * self.control_freq_inv
            )
            delta = jnp.clip(tgt - prev[act_idx], -max_d, max_d)
            cur = jnp.clip(prev[act_idx] + delta, lo, hi)
        else:
            cur = maths.scale(action, lo, hi)
            av = self._act_ma(task)
            cur = av * cur + (1.0 - av) * prev[act_idx]
            cur = jnp.clip(cur, lo, hi)
        return prev.at[act_idx].set(cur)

    def true_objective(self, q, qd):
        return jnp.zeros(())
