"""HumanoidAMP: style-imitation humanoid (Adversarial Motion Priors).

Parity target: reference isaacgymenvs/tasks/amp/humanoid_amp_base.py
(obs compute_humanoid_observations :383-420, dof_to_obs :350-380, PD
action offset/scale :262-300, early termination compute_humanoid_reset
:537-561, task reward = 1 :531-535) + tasks/humanoid_amp.py (AMP obs
build_amp_observations :283-320, reference-state init _reset_ref_state_init
:182-209 incl. Hybrid :210, demo sampler fetch_amp_obs_demo :105-133) and
cfg/task/HumanoidAMP.yaml. The 3-dof joint clusters of amp_humanoid.xml
are hinge chains in our engine, so dof coordinates are intrinsic-xyz euler
angles; dof_to_obs converts each cluster back to a quaternion tan-norm so
policy and demo observations share one representation.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import maths
from ..amp.motion_lib import MotionLib
from ..envcore.vec_task import VecTask
from ..model import load_mjcf
from ..utils.assets import asset_path

KEY_BODY_NAMES = ["right_hand", "left_hand", "right_foot", "left_foot"]
NUM_AMP_OBS_PER_STEP = 105


class HumanoidAMP(VecTask):
    use_pd_targets = True

    def __init__(self, cfg):
        env = cfg["env"]
        self.pd_control = bool(env.get("pdControl", True))
        self.power_scale = float(env.get("powerScale", 1.0))
        self.state_init = str(env.get("stateInit", "Random"))
        self.hybrid_init_prob = float(env.get("hybridInitProb", 0.5))
        self.num_amp_obs_steps = int(env.get("numAMPObsSteps", 2))
        self.local_root_obs = bool(env.get("localRootObs", False))
        self.termination_height = float(env.get("terminationHeight", 0.5))
        self.enable_early_termination = bool(
            env.get("enableEarlyTermination", True)
        )
        self.contact_body_names = list(
            env.get("contactBodies", ["right_foot", "left_foot"])
        )
        self.motion_file = str(env.get("motion_file", "amp_humanoid_run.npy"))
        env.setdefault("episodeLength", 300)
        self.num_obs = NUM_AMP_OBS_PER_STEP
        self.num_acts = 28
        super().__init__(cfg)
        self._setup()

    # ------------------------------------------------------------------
    def build_model(self):
        model = load_mjcf(asset_path("mjcf/amp_humanoid.xml"))
        # PD drive gains from the MJCF joint stiffness/damping (the asset
        # encodes them; pdControl drives targets through them)
        return model, self.sim_params_from_cfg()

    def _setup(self):
        m = self.model
        sdofs = self.scalar_dof_indices
        assert len(sdofs) == 28, len(sdofs)
        self.dof_idx = jnp.asarray(sdofs)
        sq = np.asarray([m.q_adr[m.dof_body[d]] for d in sdofs])
        self.dof_q_idx = jnp.asarray(sq)
        lo = np.asarray(m.dof_limit_lower)[sdofs]
        hi = np.asarray(m.dof_limit_upper)[sdofs]

        # joint clusters: group consecutive scalar dofs by their named body
        # (expanded chains share the name suffixing '__f<k>')
        def cluster_name(d):
            n = m.body_names[m.dof_body[d]]
            return n.split("__f")[0]

        clusters = []  # (name, [dof positions in scalar-dof space])
        for i, d in enumerate(sdofs):
            n = cluster_name(d)
            if clusters and clusters[-1][0] == n:
                clusters[-1][1].append(i)
            else:
                clusters.append((n, [i]))
        self.dof_offsets = [0]
        for _, ds in clusters:
            self.dof_offsets.append(self.dof_offsets[-1] + len(ds))
        self.cluster_names = [n for n, _ in clusters]

        # PD action offset/scale (humanoid_amp_base.py:262-300)
        lim_low, lim_high = lo.copy(), hi.copy()
        for j, (_, ds) in enumerate(clusters):
            o = self.dof_offsets[j]
            size = len(ds)
            if size == 3:
                lim_low[o : o + 3] = -np.pi
                lim_high[o : o + 3] = np.pi
            else:
                mid = 0.5 * (lim_high[o] + lim_low[o])
                scale = 0.7 * (lim_high[o] - lim_low[o])
                lim_low[o] = mid - scale
                lim_high[o] = mid + scale
        self.pd_offset = jnp.asarray(0.5 * (lim_high + lim_low), jnp.float32)
        self.pd_scale = jnp.asarray(0.5 * (lim_high - lim_low), jnp.float32)

        self.key_bodies = jnp.asarray(
            [m.body_names.index(n) for n in KEY_BODY_NAMES]
        )
        contact_ids = [m.body_names.index(n) for n in self.contact_body_names]
        noncontact = np.ones(m.nbody, np.float32)
        noncontact[contact_ids] = 0.0
        noncontact[0] = 1.0
        self.noncontact_mask = jnp.asarray(noncontact)

        # motion library: map skeleton names -> our clusters
        path = asset_path(f"amp/motions/{self.motion_file}")
        skel = np.load(path, allow_pickle=True).item()["skeleton_tree"]
        node_names = list(skel["node_names"])
        dof_layout = [
            (node_names.index(n), len(ds)) for n, ds in clusters
        ]
        key_ids = [node_names.index(n) for n in KEY_BODY_NAMES]
        self.motion_lib = MotionLib([(path, 1.0)], dof_layout, key_ids)

    # ---- init / reset (reference-state init) --------------------------
    def sample_init(self, rng):
        m = self.model
        kmot, kt, khyb, kkeep = jax.random.split(rng, 4)
        mid = self.motion_lib.sample_motions(kmot, ())
        if self.state_init == "Start":
            t = jnp.zeros(())
        else:
            t = self.motion_lib.sample_time(kt, mid[None])[0]
        if self.state_init == "Hybrid":
            use_ref = jax.random.uniform(khyb, ()) < self.hybrid_init_prob
            t = jnp.where(use_ref, t, 0.0)  # default = qpos0 pose below
        (
            root_pos, root_rot, dof_pos, dof_vel,
            root_vel, root_ang_vel, _key,
        ) = self.motion_lib.get_motion_state(mid[None], t[None])

        q = m.qpos0
        q = q.at[0:3].set(root_pos[0]).at[3:7].set(maths.quat_unit(root_rot[0]))
        q = q.at[self.dof_q_idx].set(dof_pos[0])
        qd = jnp.zeros(m.nv)
        qd = qd.at[0:3].set(root_vel[0]).at[3:6].set(root_ang_vel[0])
        qd = qd.at[self.dof_idx].set(dof_vel[0])
        if self.state_init == "Hybrid":
            q_def = m.qpos0
            q = jnp.where(use_ref, q, q_def)
            qd = jnp.where(use_ref, qd, jnp.zeros(m.nv))

        amp_frame = self._amp_frame(q, qd, None)
        # full window of num_amp_obs_steps rows; reward_done rolls the
        # current frame into row 0, so post-update prev_amp IS the
        # [current, t-1, ..., t-K+1] AMP observation window
        task = {"prev_amp": jnp.tile(amp_frame, (self.num_amp_obs_steps, 1))}
        return q, qd, task

    # ---- control ------------------------------------------------------
    def compute_force(self, action, q, qd, task):
        m = self.model
        targets = self.pd_offset + self.pd_scale * action
        q_target = jnp.zeros(m.nq).at[self.dof_q_idx].set(targets)
        return jnp.zeros(m.nv), jnp.zeros((m.nbody, 6)), q_target

    # ---- observations (shared policy/amp layout) ----------------------
    def _dof_to_obs(self, dof_pos):
        """Per-cluster tan-norm (humanoid_amp_base.py dof_to_obs), with our
        euler-chain coordinates converted to cluster quaternions."""
        outs = []
        for j in range(len(self.cluster_names)):
            o = self.dof_offsets[j]
            size = self.dof_offsets[j + 1] - o
            if size == 3:
                a, b, c = dof_pos[o], dof_pos[o + 1], dof_pos[o + 2]
                qx = maths.quat_from_angle_axis(a, jnp.array([1.0, 0, 0]))
                qy = maths.quat_from_angle_axis(b, jnp.array([0.0, 1, 0]))
                qz = maths.quat_from_angle_axis(c, jnp.array([0.0, 0, 1]))
                quat = maths.quat_mul(qx, maths.quat_mul(qy, qz))
                outs.append(maths.quat_to_tan_norm(quat))
            else:
                outs.append(dof_pos[o : o + 1])
        return jnp.concatenate(outs)

    def _amp_frame_parts(self, root_pos, root_rot, root_vel, root_ang_vel,
                         dof_pos, dof_vel, key_pos):
        root_h = root_pos[2:3]
        heading_inv = maths.calc_heading_quat_inv(root_rot)
        rot_obs = (
            maths.quat_mul(heading_inv, root_rot)
            if self.local_root_obs
            else root_rot
        )
        rot_obs = maths.quat_to_tan_norm(rot_obs)
        lvel = maths.quat_rotate(heading_inv, root_vel)
        lavel = maths.quat_rotate(heading_inv, root_ang_vel)
        local_key = jax.vmap(
            lambda p: maths.quat_rotate(heading_inv, p - root_pos)
        )(key_pos).reshape(-1)
        return jnp.concatenate(
            [root_h, rot_obs, lvel, lavel, self._dof_to_obs(dof_pos), dof_vel, local_key]
        )

    def _amp_frame(self, q, qd, kin):
        from ..engine import dynamics as _dyn

        if kin is None:
            kin = _dyn.forward_kinematics(self.model, q, qd)
        key_pos = kin.x[self.key_bodies]
        return self._amp_frame_parts(
            q[0:3], q[3:7], qd[0:3], qd[3:6],
            q[self.dof_q_idx], qd[self.dof_idx], key_pos,
        )

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        return self._amp_frame_parts(
            q[0:3], q[3:7], qd[0:3], qd[3:6],
            q[self.dof_q_idx], qd[self.dof_idx], kin.x[self.key_bodies],
        )

    # ---- reward / termination -----------------------------------------
    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        reward = jnp.ones(())  # style-only (task reward == 1, :531-535)

        terminated = jnp.zeros((), bool)
        if self.enable_early_termination:
            contact_mag = jnp.linalg.norm(sensors.body_force, axis=-1)
            bad_contact = jnp.any(
                (contact_mag > 0.1) & (self.noncontact_mask > 0)
            )
            body_low = kin.x[:, 2] < self.termination_height
            bad_low = jnp.any(body_low & (self.noncontact_mask > 0))
            terminated = bad_contact & bad_low & (progress > 1)
        done = terminated | (progress >= self.max_episode_length - 1)

        cur = self._amp_frame(q, qd, kin)
        prev = jnp.roll(task["prev_amp"], 1, axis=0).at[0].set(cur)
        return reward, done, {"prev_amp": prev}

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress) -> Dict:
        """amp_obs = [current frame, previous frames] (210 for 2 steps).
        extra_outputs runs on the POST-reward task, whose prev_amp window
        already starts with the current frame (reward_done :236-238)."""
        return {"amp_obs": task["prev_amp"].reshape(-1)}

    # ---- demo sampling for the AMP agent ------------------------------
    def fetch_amp_obs_demo(self, key, num_samples: int):
        """(num_samples, num_amp_obs_steps*105) demo windows
        (reference humanoid_amp.py:105-133)."""
        k1, k2 = jax.random.split(key)
        mids = self.motion_lib.sample_motions(k1, (num_samples,))
        t0 = self.motion_lib.sample_time(k2, mids)
        # ensure the history window stays in range
        t0 = jnp.maximum(t0, self.dt * (self.num_amp_obs_steps - 1))
        frames = []
        for s in range(self.num_amp_obs_steps):
            t = t0 - self.dt * s
            (rp, rr, dp, dv, rv, rav, kp) = self.motion_lib.get_motion_state(
                mids, t
            )
            frames.append(
                jax.vmap(self._amp_frame_parts)(rp, rr, rv, rav, dp, dv, kp)
            )
        return jnp.concatenate(frames, axis=-1)

    @property
    def num_amp_obs(self) -> int:
        return self.num_amp_obs_steps * NUM_AMP_OBS_PER_STEP
