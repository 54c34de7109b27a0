"""Vectorized task runtime: the TPU-native equivalent of the reference's
`VecTask` (reference isaacgymenvs/tasks/base/vec_task.py:207-562).

Design: an environment is a pair of PURE functions over a batched pytree
`EnvState` -- `reset(rng) -> (EnvState, obs)` and
`step(EnvState, actions) -> (EnvState, obs, reward, reset, extras)` -- built
once from a `VecTask` subclass that supplies per-single-env hooks. The env
batch is a leading axis produced with `vmap`; under `jit` the whole step is
one compiled program, and under `shard_map`/NamedSharding the env axis
shards across TPU chips (SURVEY.md section 2.5).

Step semantics mirror the reference exactly (vec_task.py:360-408 and e.g.
tasks/cartpole.py post_physics_step):
  1. clip actions, apply them, advance physics `control_freq_inv` times;
  2. progress += 1;
  3. envs flagged done on the PREVIOUS step are reset (partial reset as a
     branch-free where-select over freshly sampled init states);
  4. observations computed on the post-reset state;
  5. reward + new done flags computed (so reward for a just-reset env is
     evaluated on its fresh state -- same quirk as the reference);
  6. `timeout` = progress >= max_episode_length - 1 AND done
     (vec_task.py:393-394), exposed via extras["time_outs"].
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..engine import SimParams, SimState, physics_step
from ..engine import dynamics as _dyn
from ..engine import fused as _fused
from ..model.spec import Model


class Sensors(NamedTuple):
    """Per-env sensor readings produced by the physics step: the TPU
    equivalents of net_contact_force / force_sensor / dof_force tensors
    (SURVEY.md section 2.1 state-tensor API)."""

    body_force: jax.Array  # (nbody, 3) contact force per body (world)
    body_torque: jax.Array  # (nbody, 3) contact torque about body origin
    dof_force: jax.Array  # (nv,) generalized contact force


@struct.dataclass
class EnvState:
    """Batched environment state: everything that evolves across steps.

    The TPU analogue of the reference's global sim buffers + per-env
    bookkeeping buffers (vec_task.py:301-324 allocate_buffers)."""

    sim: SimState  # leaves shaped (num_envs, ...)
    progress: jax.Array  # (num_envs,) int32, steps since reset
    reset_buf: jax.Array  # (num_envs,) bool, done flags from last step
    rng: jax.Array  # (2,) single fold-in key for the whole batch
    actions: jax.Array  # (num_envs, num_acts) last applied actions
    task: Any = None  # task-specific pytree (targets, potentials, ...)
    # domain randomization (None when task.randomize is off):
    dr: Any = None  # dict name -> (num_envs, ...) sampled factors/offsets
    randomize_buf: jax.Array = None  # (num_envs,) steps since last re-rand
    frames: jax.Array = None  # () int32 total env steps (DR schedules)
    # automatic domain randomization (None unless the task enables ADR):
    adr: Any = None  # dr.adr.AdrState -- population-level range state


class VecTask:
    """Base class: subclasses define the model and the 4 pure hooks.

    Hooks operate on a SINGLE env (no batch axis); this class vmaps them.

    Required hooks:
      build_model() -> (Model, SimParams)                 [host, once]
      initial_task_state(rng) -> task pytree              [per env]
      sample_init(rng) -> (q, qd, task)                   [per env]
      compute_force(action, q, qd, task) -> (qfrc, xfrc)  [pre-physics]
      observe(q, qd, kin, sensors, task, actions, progress) -> obs
      reward_done(obs, q, qd, kin, sensors, task, actions, progress)
          -> (reward, done, new_task)
    """

    # subclasses set these in __init__
    num_obs: int = 0
    num_acts: int = 0
    num_states: int = 0  # asymmetric-critic privileged state (0 = none)
    # if True, compute_force returns (qfrc, xfrc, q_target) where q_target
    # is an (nq,) PD-drive setpoint vector re-evaluated every substep
    # (DOF_MODE_POS / set_dof_position_target_tensor semantics)
    use_pd_targets: bool = False

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        env_cfg = cfg.get("env", {})
        self.num_envs = int(env_cfg.get("numEnvs", 64))
        self.max_episode_length = int(env_cfg.get("episodeLength", 500))
        self.clip_obs = float(env_cfg.get("clipObservations", np.inf))
        self.clip_actions = float(env_cfg.get("clipActions", np.inf))
        self.control_freq_inv = int(env_cfg.get("controlFrequencyInv", 1))
        self.terrain = None  # optional engine Terrain (set by build_model)
        self.model, self.sim_params = self.build_model()
        # domain randomization (reference vec_task.py:568-840 DR engine)
        task_cfg = cfg.get("task", {}) or {}
        self.randomizer = None
        if task_cfg.get("randomize"):
            from ..dr.randomize import DomainRandomizer

            self.randomizer = DomainRandomizer(
                self.model,
                task_cfg.get("randomization_params", {}),
                actor_ranges=self.dr_actor_ranges(),
                obs_dim=lambda: self.num_obs,
                act_dim=lambda: self.num_acts,
                obs_slices=lambda: (
                    self.obs_spec() if hasattr(self, "obs_spec") else None
                ),
            )
        # ADR (reference adr_vec_task.py:489-1250): tasks that want it set
        # an `adr:` block in the task cfg AND keep an "adr" (P,)-leaf in
        # their task dict; the runtime resamples it from the evolving
        # ranges at every partial reset and pushes boundary-worker episode
        # objectives back into the range-update queues.
        self.adr = None
        self.adr_load_from_checkpoint = False
        adr_cfg = env_cfg.get("adr") or cfg.get("adr")
        if adr_cfg and adr_cfg.get("use_adr"):
            from ..dr.adr import ADR

            self.adr = ADR(adr_cfg, self.num_envs)
            # gate for restoring evolved ADR ranges from a checkpoint
            # (reference adr_vec_task.py:516 adr_load_from_checkpoint)
            self.adr_load_from_checkpoint = bool(
                adr_cfg.get("adr_load_from_checkpoint", False)
            )
        # env-step dt as seen by the task (vec_task control_freq_inv semantics)
        self.dt = self.sim_params.dt * self.control_freq_inv
        # fused whole-step Pallas kernel (engine/fused.py): "auto" uses it
        # on TPU when the model's feature set is covered; True forces the
        # fused math path on any backend; False always vmaps the engine
        sim_cfg = cfg.get("sim", {}) or {}
        self.use_fused = sim_cfg.get("use_fused", "auto")
        # merge the control_freq_inv decimation slices into ONE fused
        # kernel invocation (substeps x control_freq_inv internal
        # slices): amortizes kernel launches + the terrain/SDF entry
        # sampling across the whole env step. The entry-sampled contact
        # planes then freeze for control_freq_inv slices instead of one
        # — a wider first-order window (opt-in per task cfg; AnymalTerrain
        # uses it: feet move <~2 cm per env step vs 10 cm terrain cells).
        self.fused_merge_slices = bool(
            sim_cfg.get("fused_merge_control_slices", False)
        )
        self._fused_cap_cache = None

    @property
    def _fused_capable(self) -> bool:
        """Fused-kernel eligibility, evaluated lazily: subclasses may
        assign self.terrain AFTER super().__init__ (AnymalTerrain), and
        an eager check would wrongly approve the terrain-blind kernel."""
        if self._fused_cap_cache is None:
            self._fused_cap_cache = _fused.fused_supported(
                self.model, self.sim_params, self.terrain
            )
        return self._fused_cap_cache

    # ---- hooks ---------------------------------------------------------
    def build_model(self) -> Tuple[Model, SimParams]:
        raise NotImplementedError

    def sample_init(self, rng: jax.Array):
        raise NotImplementedError

    def compute_force(self, action, q, qd, task):
        raise NotImplementedError

    def observe(self, q, qd, kin, sensors, task, actions, progress):
        raise NotImplementedError

    def reward_done(self, obs, q, qd, kin, sensors, task, actions, progress):
        raise NotImplementedError

    def observe_state(self, q, qd, kin, sensors, task, actions, progress):
        """Privileged state for asymmetric actor-critic (num_states > 0)."""
        raise NotImplementedError

    def extra_outputs(self, q, qd, kin, sensors, task, actions, progress):
        """Optional per-env extras (e.g. AMP observations, success
        counters). Receives the task state AFTER reward_done updates it
        (reference ordering: extras are filled inside compute_reward after
        the buffer updates). Return a dict of arrays."""
        return None

    def adr_objective(self, task):
        """Per-env episode objective fed to the ADR range updater when an
        env finishes (reference uses consecutive successes). Override in
        ADR-enabled tasks; receives a SINGLE env's task pytree."""
        return jnp.zeros(())

    def set_train_info(self, env_frames, *args, **kwargs):
        """Algo -> env training-progress report (reference
        vec_task.py:187-194 / rlgames_utils.py:274-281): the trainer
        calls this every epoch with its global env-frame counter so
        env-side curricula can key off optimization progress. The jitted
        step threads the equivalent counter through EnvState.frames (DR
        schedules consume that); this hook records the trainer's value
        for host-side consumers and keeps the reference API."""
        self.total_train_env_frames = int(env_frames)

    # ---- dict observations (EnvDextreme / ComplexObsRLGPUEnv parity) ---
    # The reference's DeXtreme/AllegroKuka runtime exposes observations
    # as a dict of named tensors (adr_vec_task.py:173-220 per-key
    # buffers; rlgames_utils.py:298 ComplexObsRLGPUEnv). This framework
    # keeps the POLICY input flat (one fixed-order concatenation -- the
    # same information, friendlier to jit), and offers the dict view at
    # the API boundary: tasks declare `obs_spec()` ({key: (offset,
    # size)}) and consumers re-dict any flat obs batch with obs_dict().

    @property
    def observation_dict_space(self):
        """{key: size} of the named observation slices, or None when the
        task has no dict-obs structure (single-key tasks)."""
        spec = self.obs_spec() if hasattr(self, "obs_spec") else None
        if not spec:
            return None
        return {k: n for k, (_, n) in spec.items()}

    def obs_dict(self, obs):
        """Split a flat obs batch (..., num_obs) into the task's named
        observation dict. Falls back to {"obs": obs} for tasks without
        an obs_spec (mirroring the reference's plain-obs envs)."""
        spec = self.obs_spec() if hasattr(self, "obs_spec") else None
        if not spec:
            return {"obs": obs}
        return {k: obs[..., off:off + n] for k, (off, n) in spec.items()}

    def step_dict(self, state, actions):
        """step() with dict observations (ComplexObsRLGPUEnv.step
        semantics: same rewards/dones/extras, obs as a named dict)."""
        state, obs, rew, done, extras = self.step(state, actions)
        return state, self.obs_dict(obs), rew, done, extras

    def reset_dict(self, rng):
        """reset() with dict observations."""
        state, obs = self.reset(rng)
        return state, self.obs_dict(obs)

    def render(self, state, env_idx: int = 0):
        """Headless render stub (reference vec_task.py:457-512 drives a
        viewer + frame capture; a TPU pod has none): returns one env's
        body poses {"x": (nbody, 3), "quat": (nbody, 4)}. For image
        output, record frames with utils.replay.FrameRecorder and render
        offline with utils.replay.render_replay."""
        import numpy as _np

        q = state.sim.q[env_idx]
        qd = state.sim.qd[env_idx]
        kin = _dyn.forward_kinematics(self.model, q, qd)
        return {"x": _np.asarray(kin.x), "quat": _np.asarray(kin.quat)}

    def dr_actor_ranges(self):
        """Optional {actor_name: (body_lo, body_hi)} scoping DR
        actor_params specs to each actor's bodies/dofs/contact points
        (the reference randomizes per actor handle, vec_task.py:619-680).
        None = every spec touches the whole model leaf."""
        return None

    def set_param_generator(self, generator):
        """Install an external physics-parameter generator (the reference's
        `actor_params_generator` hook, vec_task.py:734-744 -- NPDR/BayesSim
        joint posteriors over simulation params). `generator` is a pure
        callable (key, n) -> (n, P) traced into the jitted reset; P and the
        slice layout come from get_actor_params_info(). Requires
        task.randomize=True (there must be actor_params specs to override)."""
        if self.randomizer is None:
            raise ValueError(
                "set_param_generator needs task.randomize=True with "
                "actor_params randomization specs"
            )
        if generator is not None and not callable(generator):
            raise TypeError("generator must be callable (key, n) -> (n, P)")
        self.randomizer.param_generator = generator

    def get_actor_params_info(self):
        """Flat layout the external generator must produce (reference
        vec_task.py:568-608): list of {name, leaf, size, lo, hi, operation}
        in sample order, or None when DR is off."""
        if self.randomizer is None:
            return None
        return self.randomizer.param_info()

    def population_update(self, task, done, progress):
        """Full-batch (NOT vmapped) task update after reward_done: for
        population-level curricula that need cross-env statistics, e.g.
        IndustReal's Sampling-Based Curriculum stepping a shared
        max-displacement from the mean success rate
        (industreal_task_pegs_insert.py:454-459). Receives the batched
        task pytree; must return it with the same structure/shapes."""
        return task

    # tasks that need the global frame counter inside per-env hooks set
    # this True: the step injects task["_frames"] (a per-env broadcast of
    # EnvState.frames) into the task dict passed to compute_force /
    # observe / reward_done (it is NOT stored back into EnvState.task)
    frames_in_task = False

    def perturb_state(self, key, q, qd, frames, task):
        """Optional per-env post-physics state perturbation (vmapped;
        `frames` is the global step counter, broadcast). Used for the
        reference's periodic robot pushes (anymal_terrain.py:437-439
        push_robots: root xy velocity overwritten every pushInterval)."""
        return q, qd

    def resample_init(self, rng, old_task):
        """Partial-reset sampler that can read the env's pre-reset task
        state -- override to persist curriculum across resets (terrain
        levels, success tolerances; the reference keeps these in
        buffers that reset_idx simply does not clear)."""
        return self.sample_init(rng)

    # ---- helpers shared by tasks --------------------------------------
    def sim_params_from_cfg(self) -> SimParams:
        """SimParams from the reference-schema `sim:` cfg block
        (cfg/task/*.yaml keys dt/substeps/gravity, physx solver knobs)."""
        sim = self.cfg.get("sim", {})
        physx = sim.get("physx", {})
        return SimParams(
            dt=float(sim.get("dt", 1.0 / 60.0)),
            substeps=int(sim.get("substeps", 2)),
            solver_pgs_iterations=int(physx.get("num_position_iterations", 4)) * 2,
            solver_apgd_iterations=int(physx.get("num_position_iterations", 4)) * 4,
            gravity=jnp.asarray(sim.get("gravity", [0.0, 0.0, -9.81]), jnp.float32),
            max_depenetration_velocity=float(
                physx.get("max_depenetration_velocity", 10.0)
            ),
            bounce_threshold_velocity=float(
                physx.get("bounce_threshold_velocity", 0.2)
            ),
            contact_margin=float(physx.get("contact_offset", 0.02)),
            max_active_contacts=int(physx.get("max_active_contacts", 0)),
        )

    def qfrc_from_actuators(self, action: jax.Array) -> jax.Array:
        """Scatter per-actuator efforts into the dof vector:
        qfrc[dof(a)] += gear[a] * action[a] (the DOF_MODE_EFFORT path,
        reference cartpole.py pre_physics_step / ant.py:281-285)."""
        m = self.model
        qfrc = jnp.zeros(m.nv)
        return qfrc.at[jnp.asarray(np.asarray(m.actuator_dof))].add(m.gear * action)

    def pd_torque(self, targets, q, qd, kp, kd):
        """PD position-drive torque on the actuated scalar dofs
        (DOF_MODE_POS semantics: stiffness*(target-q) - damping*qd)."""
        m = self.model
        sq = np.asarray(_dyn.scalar_dof_q_adr(m))
        dof_q = q[jnp.asarray(np.maximum(sq, 0))]
        act_dof = jnp.asarray(np.asarray(m.actuator_dof))
        err = targets - dof_q[act_dof]
        tau = kp * err - kd * qd[act_dof]
        return jnp.zeros(m.nv).at[act_dof].add(tau)

    def root_state(self, q, qd, kin) -> jax.Array:
        """(13,) root actor state: pos, quat(xyzw), linvel, angvel -- the
        actor_root_state_tensor layout (reference ant.py:382-385)."""
        qa = self.model.q_adr[0]
        va = self.model.v_adr[0]
        return jnp.concatenate(
            [q[qa : qa + 3], q[qa + 3 : qa + 7], qd[va : va + 3], qd[va + 3 : va + 6]]
        )

    def dof_slices(self, q, qd):
        """(ndof,) scalar dof positions / velocities (skips free-joint dofs),
        i.e. the dof_state_tensor view (reference cartpole.py:52-55)."""
        m = self.model
        sq = np.asarray(_dyn.scalar_dof_q_adr(m))
        keep = np.where(sq >= 0)[0]
        return q[jnp.asarray(sq[keep])], qd[jnp.asarray(keep)]

    @property
    def scalar_dof_indices(self) -> np.ndarray:
        """Indices into qd of the scalar (hinge/slide) dofs."""
        sq = np.asarray(_dyn.scalar_dof_q_adr(self.model))
        return np.where(sq >= 0)[0]

    # ---- the vectorized pure functions --------------------------------
    def _one_env_physics(self, model, params, q, qd, qfrc, xfrc, q_target=None):
        out = physics_step(
            model,
            SimState(q=q, qd=qd),
            qfrc,
            params,
            xfrc=xfrc,
            q_target=q_target,
            terrain=self.terrain,
        )
        return (
            out.state.q,
            out.state.qd,
            Sensors(out.body_force, out.body_torque, out.dof_force),
        )

    def _physics_vmap_spec(self, dr_sample):
        """(model, params, their vmap axes) honoring per-env DR leaves."""
        model, params = self.model, self.sim_params
        model_axes = jax.tree.map(lambda _: None, model)
        params_axes = jax.tree.map(lambda _: None, params)
        if self.randomizer is not None and dr_sample is not None:
            model = self.randomizer.batched_model(model, dr_sample)
            model_axes = self.randomizer.model_axes(self.model)
            grav = self.randomizer.gravity(params.gravity, dr_sample)
            if grav is not None:
                params = params.replace(gravity=grav)
                params_axes = params_axes.replace(gravity=0)
        return model, params, model_axes, params_axes

    def reset(self, rng: jax.Array) -> Tuple[EnvState, jax.Array]:
        """Full reset of all envs (reference vec_task.py:426 reset())."""
        key, sub = jax.random.split(rng)
        keys = jax.random.split(sub, self.num_envs)
        q, qd, task = jax.vmap(self.sample_init)(keys)
        n = self.num_envs
        sensors = Sensors(
            body_force=jnp.zeros((n, self.model.nbody, 3)),
            body_torque=jnp.zeros((n, self.model.nbody, 3)),
            dof_force=jnp.zeros((n, self.model.nv)),
        )
        kin = jax.vmap(lambda qq, qv: _dyn.forward_kinematics(self.model, qq, qv))(q, qd)
        actions = jnp.zeros((n, self.num_acts))
        progress = jnp.zeros(n, jnp.int32)
        obs = jax.vmap(self.observe)(
            q, qd, kin, sensors, task, actions, progress
        )
        adr_state = None
        if self.adr is not None:
            key, ka, kp = jax.random.split(key, 3)
            adr_state = self.adr.init_state(ka)
            task = dict(task)
            task["adr"] = self.adr.sample(adr_state, kp, n)
            obs = jax.vmap(self.observe)(
                q, qd, kin, sensors, task, actions, progress
            )
        dr = None
        if self.randomizer is not None:
            key, kdr = jax.random.split(key)
            dr = self.randomizer.sample(
                kdr, n, jnp.zeros((), jnp.int32),
                adr=(
                    self.adr.dr_overrides(adr_state)
                    if self.adr is not None else None
                ),
            )
        state = EnvState(
            sim=SimState(q=q, qd=qd),
            progress=progress,
            reset_buf=jnp.zeros(n, bool),
            rng=key,
            actions=actions,
            task=task,
            dr=dr,
            randomize_buf=jnp.zeros(n, jnp.int32),
            frames=jnp.zeros((), jnp.int32),
            adr=adr_state,
        )
        return state, jnp.clip(obs, -self.clip_obs, self.clip_obs)

    def states_of(self, state: EnvState) -> jax.Array:
        """Privileged states for the CURRENT env state (asymmetric critic
        bootstrap; sensors unavailable outside the step, passed as zeros)."""
        n = self.num_envs
        q, qd = state.sim.q, state.sim.qd
        sensors = Sensors(
            body_force=jnp.zeros((n, self.model.nbody, 3)),
            body_torque=jnp.zeros((n, self.model.nbody, 3)),
            dof_force=jnp.zeros((n, self.model.nv)),
        )
        kin = jax.vmap(lambda qq, qv: _dyn.forward_kinematics(self.model, qq, qv))(q, qd)
        states = jax.vmap(self.observe_state)(
            q, qd, kin, sensors, state.task, state.actions, state.progress
        )
        return jnp.clip(states, -self.clip_obs, self.clip_obs)

    def step(
        self, state: EnvState, actions: jax.Array
    ) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array, Dict[str, jax.Array]]:
        """One vectorized env step; see module docstring for the exact
        ordering contract vs the reference."""
        n = self.num_envs
        key = state.rng
        frames = state.frames if state.frames is not None else jnp.zeros((), jnp.int32)
        if self.randomizer is not None:
            key, kan = jax.random.split(key)
            actions = self.randomizer.action_noise(
                kan, actions, frames, dr_sample=state.dr
            )
        actions = jnp.clip(actions, -self.clip_actions, self.clip_actions)

        task_in = state.task
        if self.frames_in_task:
            task_in = {
                **state.task,
                "_frames": jnp.full((n,), frames, jnp.int32),
            }

        # 1. apply actions + physics
        q0, qd0 = state.sim.q, state.sim.qd
        if self.use_pd_targets:
            qfrc, xfrc, q_target = jax.vmap(self.compute_force)(
                actions, q0, qd0, task_in
            )
        else:
            qfrc, xfrc = jax.vmap(self.compute_force)(actions, q0, qd0, task_in)
            q_target = None

        model_b, params_b, model_axes, params_axes = self._physics_vmap_spec(
            state.dr
        )
        # fused whole-step kernel path: the kernel specializes on the
        # static Model, but accepts the DR surface (fused.DYN_LEAVES +
        # gravity, incl. the actor-scale geometry leaves) as per-env
        # kernel inputs; any other batched leaf falls back to the vmap
        # engine
        batched_names = set()
        if self.randomizer is not None and state.dr is not None:
            batched_names = self.randomizer.batched_leaf_names()
        grav_batched = params_axes.gravity is not None
        fused_dr_ok = batched_names <= (
            set(_fused.DYN_LEAVES) | set(_fused.DYN_INERT)
        )
        if "cpoint_pos" in batched_names and (
            self.terrain is not None or len(self.model.spair_point)
        ):
            # the terrain/SDF entry samplers (terrain_dyn / sdf_dyn)
            # place candidate points from the STATIC model; per-env
            # cpoint_pos DR would diverge there -- take the vmap engine
            fused_dr_ok = False
        fused_on = self._fused_capable and fused_dr_ok and (
            self.use_fused is True
            or (self.use_fused == "auto" and jax.default_backend() == "tpu")
        )
        if fused_on:
            fused_dyn = {
                n: getattr(model_b, n)
                for n in batched_names
                if n in _fused.DYN_LEAVES
            }
            if grav_batched:
                fused_dyn["gravity"] = params_b.gravity

        merge_slices = (
            fused_on and self.fused_merge_slices and self.control_freq_inv > 1
        )

        def control_loop(carry, _):
            q, qd = carry
            if fused_on:
                dyn_step = fused_dyn
                if self.terrain is not None:
                    # heightfield lookups gather (Mosaic can't): sample
                    # each candidate point's ground plane at the control
                    # step's entry pose and ship it in as dyn rows
                    dyn_step = {
                        **dyn_step,
                        **_fused.terrain_dyn(
                            self.model, self.terrain, q, qd
                        ),
                    }
                if len(self.model.spair_point):
                    # SDF grid lookups likewise: entry-sampled contact
                    # planes per spair row (Factory/IndustReal)
                    dyn_step = {
                        **dyn_step,
                        **_fused.sdf_dyn(self.model, q, qd),
                    }
                out = _fused.physics_step_fused(
                    self.model, self.sim_params, q, qd, qfrc,
                    xfrc=xfrc, q_target=q_target, dyn=dyn_step,
                )
                sensors = Sensors(out.body_force, out.body_torque, out.dof_force)
                return (out.q, out.qd), sensors
            q, qd, sensors = jax.vmap(
                self._one_env_physics,
                in_axes=(model_axes, params_axes, 0, 0, 0, 0, 0 if q_target is not None else None),
            )(model_b, params_b, q, qd, qfrc, xfrc, q_target)
            return (q, qd), sensors

        if merge_slices:
            # ONE fused kernel invocation covers the whole decimation
            # window (substeps x control_freq_inv internal slices):
            # amortizes kernel launches and the terrain/SDF entry
            # sampling; entry planes freeze across the env step
            dyn_step = dict(fused_dyn)
            if self.terrain is not None:
                dyn_step.update(
                    _fused.terrain_dyn(self.model, self.terrain, q0, qd0)
                )
            if len(self.model.spair_point):
                dyn_step.update(_fused.sdf_dyn(self.model, q0, qd0))
            # total integrated time = control_freq_inv * dt; the kernel
            # slices h = dt / (substeps * solver_iterations), so scale
            # BOTH dt and substeps to keep h identical to the per-slice
            # path while covering the whole decimation window
            merged = self.sim_params.replace(
                dt=self.sim_params.dt * self.control_freq_inv,
                substeps=self.sim_params.substeps * self.control_freq_inv,
            )
            out = _fused.physics_step_fused(
                self.model, merged, q0, qd0, qfrc,
                xfrc=xfrc, q_target=q_target, dyn=dyn_step,
                # solve exactly like control_freq_inv separate calls:
                # warm-start resets at the original call boundaries
                warm_reset_every=(
                    self.sim_params.substeps
                    * self.sim_params.solver_iterations
                ),
            )
            q, qd = out.q, out.qd
            sensors = Sensors(out.body_force, out.body_torque, out.dof_force)
        else:
            (q, qd), sensor_hist = jax.lax.scan(
                control_loop, (q0, qd0), None, length=self.control_freq_inv
            )
            sensors = jax.tree.map(lambda x: x[-1], sensor_hist)

        if type(self).perturb_state is not VecTask.perturb_state:
            key, kps = jax.random.split(key)
            q, qd = jax.vmap(
                self.perturb_state, in_axes=(0, 0, 0, None, 0)
            )(jax.random.split(kps, n), q, qd, frames, task_in)

        # 2. bookkeeping
        progress = state.progress + 1

        # 3. partial resets of envs flagged done last step (branch-free)
        key, sub = jax.random.split(key)
        if type(self).resample_init is not VecTask.resample_init:
            init_q, init_qd, init_task = jax.vmap(self.resample_init)(
                jax.random.split(sub, n), state.task
            )
        else:
            init_q, init_qd, init_task = jax.vmap(self.sample_init)(
                jax.random.split(sub, n)
            )
        if self.adr is not None:
            # fresh per-env ADR parameter draws from the CURRENT ranges
            # replace sample_init's placeholder (sample_adr_tensor :666-730)
            key, kp = jax.random.split(key)
            init_task = dict(init_task)
            init_task["adr"] = self.adr.sample(state.adr, kp, n)
        done_prev = state.reset_buf

        def sel(a, b):  # where over an arbitrary-rank batched leaf
            mask = done_prev.reshape((n,) + (1,) * (a.ndim - 1))
            return jnp.where(mask, a, b)

        q = sel(init_q, q)
        qd = sel(init_qd, qd)
        task = jax.tree.map(sel, init_task, state.task)
        sensors = jax.tree.map(lambda x: sel(jnp.zeros_like(x), x), sensors)
        progress = jnp.where(done_prev, 0, progress)

        # 3b. DR bookkeeping: re-randomize due envs at their reset
        # (frequency gating via randomize_buf, vec_task.py:619-635)
        dr = state.dr
        rbuf = state.randomize_buf
        if self.randomizer is not None:
            rbuf = rbuf + 1
            due = done_prev & (rbuf >= self.randomizer.frequency)
            key, kdr = jax.random.split(key)
            fresh = self.randomizer.sample(
                kdr, n, frames,
                adr=(
                    self.adr.dr_overrides(state.adr)
                    if self.adr is not None else None
                ),
            )
            setup_names = {
                s.name for s in self.randomizer.model_specs if s.setup_only
            }
            dr = {
                k: (
                    dr[k]
                    if k in setup_names
                    else jnp.where(
                        due.reshape((n,) + (1,) * (fresh[k].ndim - 1)),
                        fresh[k],
                        dr[k],
                    )
                )
                for k in dr
            }
            rbuf = jnp.where(due, 0, rbuf)
        frames = frames + 1

        # 4. observe on the post-reset state
        if self.frames_in_task:
            task = {**task, "_frames": jnp.full((n,), frames, jnp.int32)}
        kin = jax.vmap(lambda qq, qv: _dyn.forward_kinematics(self.model, qq, qv))(q, qd)
        obs = jax.vmap(self.observe)(q, qd, kin, sensors, task, actions, progress)
        if self.randomizer is not None:
            key, kon = jax.random.split(key)
            obs = self.randomizer.observation_noise(
                kon, obs, frames, dr_sample=dr
            )
        obs = jnp.clip(obs, -self.clip_obs, self.clip_obs)

        # 5. reward + new done flags
        reward, done, task = jax.vmap(self.reward_done)(
            obs, q, qd, kin, sensors, task, actions, progress
        )
        if self.frames_in_task and isinstance(task, dict):
            task.pop("_frames", None)  # hook-only view, not env state

        # 5a. optional task extras on the POST-reward task state (the
        # reference fills extras inside compute_reward AFTER updating the
        # success/episode-sum buffers, e.g. shadow_hand.py:426-435,
        # anymal_terrain.py:421-425), so success counters and per-term
        # episode sums include the current step
        task_extras = None
        if type(self).extra_outputs is not VecTask.extra_outputs:
            task_extras = jax.vmap(self.extra_outputs)(
                q, qd, kin, sensors, task, actions, progress
            )

        # 5b. population-level curricula on the full batch (SBC etc.)
        if type(self).population_update is not VecTask.population_update:
            task = self.population_update(task, done, progress)

        # 6. timeout flag (vec_task.py:393-394)
        timeout = (progress >= self.max_episode_length - 1) & done

        # 6b. ADR range evolution on finished boundary-worker episodes
        adr_state = state.adr
        if self.adr is not None:
            key, ku = jax.random.split(key)
            objective = jax.vmap(self.adr_objective)(task)
            adr_state = self.adr.update(state.adr, ku, done, objective)

        extras = {"time_outs": timeout}
        if self.adr is not None:
            extras["adr_nats"] = jnp.broadcast_to(adr_state.nats, (n,))
        if task_extras is not None:
            extras.update(task_extras)
        if self.num_states:
            states = jax.vmap(self.observe_state)(
                q, qd, kin, sensors, task, actions, progress
            )
            extras["states"] = jnp.clip(states, -self.clip_obs, self.clip_obs)

        new_state = EnvState(
            sim=SimState(q=q, qd=qd),
            progress=progress,
            reset_buf=done,
            rng=key,
            actions=actions,
            task=task,
            dr=dr,
            randomize_buf=rbuf,
            frames=frames,
            adr=adr_state,
        )
        return new_state, obs, reward, done, extras
