"""Domain randomization engine.

TPU-native re-design of the reference's DR stack (reference
isaacgymenvs/utils/dr_utils.py:35-238 + tasks/base/vec_task.py:568-840,
YAML schema docs/domain_randomization.md:34-237). Same YAML schema --
groups `observations` / `actions` / `sim_params` / `actor_params` with
`range`, `operation` (additive|scaling), `distribution`
(uniform|loguniform|gaussian), `schedule` (constant|linear) +
`schedule_steps`, per-reset `frequency` gating, and `setup_only`.

Instead of mutating engine property objects through setters, DR here is a
pure data transform: randomized physical parameters are a per-env BATCH of
Model leaves sampled at reset (a `DRSample` dict of (num_envs, ...)
arrays); the physics step is vmapped with those leaves on the env axis, so
every env integrates its own masses/damping/limits/friction/gravity with
zero special-casing in the engine. Obs/action white noise folds into the
jitted env step (vec_task.py:371,397 equivalents). No value bucketing is
needed (dr_utils.py:135 exists only to bound PhysX GPU parameter sets).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..model.spec import Model

# YAML property path -> Model leaf name (+ how ranges broadcast)
_ACTOR_PARAM_MAP = {
    ("rigid_body_properties", "mass"): "body_mass",
    ("rigid_body_properties", "inertia"): "body_inertia",
    ("dof_properties", "damping"): "dof_damping",
    ("dof_properties", "stiffness"): "dof_stiffness",
    ("dof_properties", "lower"): "dof_limit_lower",
    ("dof_properties", "upper"): "dof_limit_upper",
    ("dof_properties", "armature"): "armature",
    ("dof_properties", "effort"): "dof_max_effort",
    ("dof_properties", "friction"): "dof_friction",  # Coulomb joint friction
    ("rigid_shape_properties", "friction"): "cpoint_friction",
    ("rigid_shape_properties", "restitution"): "cpoint_restitution",
    ("tendon_properties", "stiffness"): "tendon_stiffness",
    ("tendon_properties", "damping"): "tendon_damping",
}


class DRSpec(NamedTuple):
    name: str  # unique key in the sample dict
    leaf: Optional[str]  # Model leaf name; None for obs/action/gravity specs
    lo: float
    hi: float
    operation: str  # 'additive' | 'scaling'
    distribution: str  # 'uniform' | 'loguniform' | 'gaussian'
    schedule: str  # 'constant' | 'linear'
    schedule_steps: float
    setup_only: bool
    actor: Optional[str] = None  # actor name the spec is scoped to
    # correlated-noise component for obs/action specs: a per-env draw
    # held fixed between re-randomizations (reference range_correlated,
    # docs/domain_randomization.md)
    corr_lo: float = 0.0
    corr_hi: float = 0.0


def _spec_from_dict(
    name: str, leaf: Optional[str], d: Dict[str, Any], actor: Optional[str] = None
) -> DRSpec:
    rng = d.get("range", [0.0, 1.0])
    corr = d.get("range_correlated", [0.0, 0.0])
    return DRSpec(
        name=name,
        leaf=leaf,
        lo=float(rng[0]),
        hi=float(rng[1]),
        corr_lo=float(corr[0]),
        corr_hi=float(corr[1]),
        operation=str(d.get("operation", "additive")),
        distribution=str(d.get("distribution", "uniform")),
        schedule=str(d.get("schedule", "constant")),
        schedule_steps=float(d.get("schedule_steps", 1.0)),
        setup_only=bool(d.get("setup_only", False)),
        actor=actor,
    )


def _identity_value(spec: DRSpec):
    return 1.0 if spec.operation == "scaling" else 0.0


def _sample_spec(spec: DRSpec, key, shape, sched_scale, lo=None, hi=None):
    """Draw the randomization factor/offset for one spec.

    Schedule semantics mirror dr_utils.generate_random_samples:71: the
    sampled perturbation interpolates from identity toward full strength
    as training progresses (linear) or switches on (constant). `lo`/`hi`
    override the static spec range with traced values (evolving ADR
    ranges, reference adr_vec_task.py:543-544 range_path rewrite)."""
    lo = spec.lo if lo is None else lo
    hi = spec.hi if hi is None else hi
    if spec.distribution == "gaussian":
        mu, var = lo, hi
        if spec.operation == "scaling":
            mu = mu + (1.0 - mu) * (1.0 - sched_scale)
        else:
            mu = mu * sched_scale
        var = var * sched_scale
        return mu + var * jax.random.normal(key, shape)
    if spec.distribution == "loguniform":
        llo = jnp.log(jnp.maximum(lo, 1e-12))
        lhi = jnp.log(jnp.maximum(hi, 1e-12))
        u = jax.random.uniform(key, shape)
        v = jnp.exp(llo + u * (lhi - llo))
    else:  # uniform
        u = jax.random.uniform(key, shape)
        v = lo + u * (hi - lo)
    ident = _identity_value(spec)
    return ident + (v - ident) * sched_scale


def _apply_op(base, factor, operation: str):
    return base * factor if operation == "scaling" else base + factor


class DomainRandomizer:
    """Parses a reference-schema randomization_params dict and produces
    per-env randomization samples + their application functions."""

    def __init__(
        self,
        model: Model,
        params: Dict[str, Any],
        actor_ranges: Optional[Dict[str, Tuple[int, int]]] = None,
        obs_dim: Optional[int] = None,
        act_dim: Optional[int] = None,
        obs_slices=None,
    ):
        """actor_ranges: optional {actor_name: (body_lo, body_hi)} scoping
        each actor's specs to its own bodies/dofs/points (the reference
        randomizes per actor handle); absent actors fall back to the
        whole-model leaf (legacy behavior, correct for single-actor
        models)."""
        self.model = model
        self.actor_ranges = actor_ranges or {}
        self.frequency = int(params.get("frequency", 1))
        # obs/act dims may be callables: subclasses can finalize their
        # num_obs/num_acts AFTER the base VecTask __init__ builds the
        # randomizer, so resolve at sample time
        self._obs_dim = obs_dim
        self._act_dim = act_dim
        self._obs_slices = obs_slices
        self.obs_spec = None
        self.obs_key_specs = {}
        obs_params = params.get("observations")
        if isinstance(obs_params, dict) and obs_params:
            if "range" in obs_params or "operation" in obs_params:
                self.obs_spec = _spec_from_dict(
                    "observations", None, obs_params
                )
            else:
                # per-obs-key noise dicts (reference dict-DR, e.g.
                # AllegroHandLSTM.yaml observations.dof_pos/...): each key
                # noises its slice of the flat obs vector, located via the
                # task's obs_spec() {key: (offset, size)} view
                self.obs_key_specs = {
                    k: _spec_from_dict(f"observations.{k}", None, v)
                    for k, v in obs_params.items()
                    if isinstance(v, dict)
                }
        self.act_spec = (
            _spec_from_dict("actions", None, params["actions"])
            if "actions" in params
            else None
        )
        self.gravity_spec = None
        sim = params.get("sim_params", {})
        if "gravity" in sim:
            self.gravity_spec = _spec_from_dict("gravity", None, sim["gravity"])

        self.model_specs: List[DRSpec] = []
        self.scale_specs: List[DRSpec] = []
        for actor, groups in params.get("actor_params", {}).items():
            for group, props in groups.items():
                if not isinstance(props, dict):
                    continue  # e.g. color: True
                if group == "scale" and "range" in props:
                    # uniform geometric actor scaling (reference
                    # set_actor_scale; docs/domain_randomization.md):
                    # one factor s per env scales the actor's contact
                    # points and geom sizes by s, mass by s^3, inertia
                    # by s^5, com offset by s. Requires actor_ranges.
                    if actor not in self.actor_ranges:
                        raise ValueError(
                            f"actor_params.{actor}.scale needs "
                            "dr_actor_ranges() to scope the actor"
                        )
                    self.scale_specs.append(
                        _spec_from_dict(f"{actor}.scale", None, props,
                                        actor=actor)
                    )
                    continue
                for prop, cfg in props.items():
                    leaf = _ACTOR_PARAM_MAP.get((group, prop))
                    if leaf is None:
                        continue
                    if not isinstance(cfg, dict):
                        continue
                    self.model_specs.append(
                        _spec_from_dict(
                            f"{actor}.{group}.{prop}", leaf, cfg, actor=actor
                        )
                    )
        # per-spec boolean mask over its leaf (None = whole leaf)
        self.masks: Dict[str, Optional[jax.Array]] = {
            spec.name: self._leaf_mask(spec) for spec in self.model_specs
        }
        # external parameter generator (reference actor_params_generator,
        # vec_task.py:734-744: NPDR/BayesSim-style joint distributions over
        # all physics params instead of independent per-param draws).
        # TPU-native contract: a PURE function (key, n) -> (n, P) jnp array
        # of perturbation factors/offsets laid out per param_info(); it is
        # traced into the jitted reset, so full-covariance posteriors are
        # expressed as arrays (see dr.param_generator.FullCovarianceParamGenerator).
        self.param_generator = None
        self._flat_layout = self._build_flat_layout()

    def _build_flat_layout(self):
        """Per-spec (flat-index array, size) into the flattened leaf,
        restricted to the spec's actor mask -- the flat vector an external
        generator must produce, in model_specs order."""
        layout = []
        for spec in self.model_specs:
            base = np.asarray(self._leaf_base(spec.leaf))
            mask = self.masks[spec.name]
            if mask is None:
                idx = np.arange(base.size)
            else:
                sel = np.broadcast_to(np.asarray(mask), base.shape)
                idx = np.flatnonzero(sel)
            layout.append((jnp.asarray(idx), int(idx.size)))
        return layout

    def param_info(self):
        """Flat layout of externally-generatable physics params (reference
        get_actor_params_info, vec_task.py:568-608): ordered
        {name, leaf, size, lo, hi, operation} dicts, one per actor_params
        spec; an external generator returns (n, sum(size)) with slices in
        this order. lo/hi are the YAML ranges (advisory bounds for the
        generator's support, exactly like the reference reports them)."""
        return [
            {
                "name": spec.name,
                "leaf": spec.leaf,
                "size": size,
                "lo": spec.lo,
                "hi": spec.hi,
                "operation": spec.operation,
            }
            for spec, (_, size) in zip(self.model_specs, self._flat_layout)
        ]

    def num_extern_params(self) -> int:
        return sum(size for _, size in self._flat_layout)

    def _leaf_base(self, leaf: str):
        v = getattr(self.model, leaf)
        if v is not None:
            return v
        if leaf == "cpoint_restitution":
            return jnp.zeros(self.model.ncp)
        if leaf == "dof_friction":
            return jnp.zeros(self.model.nv)
        raise ValueError(f"Model leaf {leaf} is None and has no default")

    def _leaf_mask(self, spec: DRSpec):
        """Boolean mask of spec.leaf selecting the spec's actor."""
        rng = self.actor_ranges.get(spec.actor)
        if rng is None:
            return None
        b0, b1 = rng
        m = self.model
        if spec.leaf.startswith("body_"):
            sel = (np.arange(m.nbody) >= b0) & (np.arange(m.nbody) < b1)
        elif spec.leaf.startswith("dof_") or spec.leaf == "armature":
            db = np.asarray(m.dof_body)
            sel = (db >= b0) & (db < b1)
        elif spec.leaf.startswith("cpoint_"):
            cb = np.asarray(m.cpoint_body)
            sel = (cb >= b0) & (cb < b1)
        else:
            return None
        base = self._leaf_base(spec.leaf)
        sel = jnp.asarray(sel)
        return sel.reshape(sel.shape + (1,) * (base.ndim - 1))

    # ---- sampling ------------------------------------------------------
    def _sched_scale(self, spec: DRSpec, frames):
        if spec.schedule == "linear":
            return jnp.minimum(frames / spec.schedule_steps, 1.0)
        return 1.0  # 'constant' schedule gates on frames>=steps in the
        # reference; at the engine level we apply full strength (the gate
        # is covered by the linear option in practice)

    def sample(self, key, n: int, frames, adr=None) -> Dict[str, jax.Array]:
        """Per-env randomization sample for all model leaves + gravity.
        Returns dict name -> (n, *leaf.shape) factors/offsets.

        `adr`: optional {spec_name: {"lo", "hi", "pin_mask", "pin_val"}}
        from the ADR engine -- evolving range overrides plus per-env
        boundary-worker pins (reference adr_vec_task.py:543-610: range_path
        params flow through the dict-DR path with boundary envs pinned at
        a range edge)."""
        adr = adr or {}
        out = {}
        gen_vals = None
        gen_off = 0
        if self.param_generator is not None:
            key, kg = jax.random.split(key)
            gen_vals = jnp.asarray(self.param_generator(kg, n))
            want = (n, self.num_extern_params())
            if gen_vals.shape != want:
                raise ValueError(
                    f"external param generator returned {gen_vals.shape}, "
                    f"expected {want}; columns must follow param_info(): "
                    f"{[p['name'] for p in self.param_info()]}"
                )
        for spec, (flat_idx, size) in zip(self.model_specs, self._flat_layout):
            key, k = jax.random.split(key)
            base = self._leaf_base(spec.leaf)
            ov = adr.get(spec.name)
            v = _sample_spec(
                spec, k, (n,) + base.shape, self._sched_scale(spec, frames),
                lo=None if ov is None else ov["lo"],
                hi=None if ov is None else ov["hi"],
            )
            if gen_vals is not None:
                # external joint sample replaces the independent draw on the
                # spec's actor-masked entries (identity elsewhere, exactly
                # like the masked independent path)
                piece = gen_vals[:, gen_off : gen_off + size]
                gen_off += size
                flat = jnp.full((n, base.size), _identity_value(spec),
                                piece.dtype)
                flat = flat.at[:, flat_idx].set(piece)
                v = flat.reshape((n,) + base.shape)
            if ov is not None and ov.get("pin_mask") is not None:
                pin_mask = ov["pin_mask"].reshape((n,) + (1,) * base.ndim)
                pin_val = ov["pin_val"].reshape((n,) + (1,) * base.ndim)
                v = jnp.where(pin_mask, pin_val, v)
            out[spec.name] = v
        if self.gravity_spec is not None:
            key, k = jax.random.split(key)
            out["gravity"] = _sample_spec(
                self.gravity_spec, k, (n, 3),
                self._sched_scale(self.gravity_spec, frames),
            )
        for spec in self.scale_specs:
            key, k = jax.random.split(key)
            out[spec.name] = _sample_spec(
                spec, k, (n,), self._sched_scale(spec, frames)
            )
        # correlated obs/action noise: one per-env draw held fixed until
        # the next re-randomization (reference range_correlated)
        pairs = [
            (self.obs_spec, self.obs_dim(), "observations_corr"),
            (self.act_spec, self.act_dim(), "actions_corr"),
        ]
        if self.obs_key_specs:
            slices = self._resolved_obs_slices()
            pairs += [
                (spec, slices[kname][1], f"observations_corr.{kname}")
                for kname, spec in self.obs_key_specs.items()
                if kname in slices
            ]
        for spec, dim, name in pairs:
            if spec is None or dim is None:
                continue
            if spec.corr_lo == 0.0 and spec.corr_hi == 0.0:
                continue
            key, k = jax.random.split(key)
            corr = spec._replace(lo=spec.corr_lo, hi=spec.corr_hi)
            out[name] = _sample_spec(
                corr, k, (n, dim), self._sched_scale(spec, frames)
            )
        return out


    def _resolved_obs_slices(self):
        """{key: (offset, size)} from the task (may be a callable); keys
        in obs_key_specs with no slice are silently inert (the task does
        not expose that observation)."""
        sl = self._obs_slices
        sl = sl() if callable(sl) else sl
        return sl or {}

    def obs_dim(self):
        d = self._obs_dim
        return d() if callable(d) else d

    def act_dim(self):
        d = self._act_dim
        return d() if callable(d) else d

    def identity_sample(self, n: int) -> Dict[str, jax.Array]:
        """Sample equal to 'no randomization' (used pre-first-reset)."""
        out = {}
        for spec in self.model_specs:
            base = self._leaf_base(spec.leaf)
            out[spec.name] = jnp.full((n,) + base.shape, _identity_value(spec))
        for spec in self.scale_specs:
            out[spec.name] = jnp.ones(n)
        pairs = [
            (self.obs_spec, self.obs_dim(), "observations_corr"),
            (self.act_spec, self.act_dim(), "actions_corr"),
        ]
        if self.obs_key_specs:
            slices = self._resolved_obs_slices()
            pairs += [
                (spec, slices[kname][1], f"observations_corr.{kname}")
                for kname, spec in self.obs_key_specs.items()
                if kname in slices
            ]
        for spec, dim, name in pairs:
            if spec is None or dim is None:
                continue
            if spec.corr_lo == 0.0 and spec.corr_hi == 0.0:
                continue
            out[name] = jnp.full((n, dim), _identity_value(spec))
        if self.gravity_spec is not None:
            out["gravity"] = jnp.full(
                (n, 3), _identity_value(self.gravity_spec)
            )
        return out

    # ---- application ---------------------------------------------------
    def batched_leaf_names(self) -> set:
        """Model leaf names that batched_model() gives a leading env axis."""
        leaves = {spec.leaf for spec in self.model_specs}
        if self.scale_specs:
            leaves |= {
                "cpoint_pos", "geom_size", "body_ipos",
                "body_mass", "body_inertia",
            }
        return leaves

    def model_axes(self, model: Model) -> Model:
        """vmap in_axes pytree: 0 on randomized leaves, None elsewhere."""
        axes = jax.tree.map(lambda _: None, model)
        return axes.replace(
            **{leaf: 0 for leaf in self.batched_leaf_names()}
        )

    def batched_model(self, model: Model, sample: Dict[str, jax.Array]) -> Model:
        """Model with randomized leaves batched (num_envs, ...); each spec
        only perturbs its actor's slice of the leaf (self.masks)."""
        updates = {}
        for spec in self.model_specs:
            base = updates.get(spec.leaf)
            if base is None:
                base = jnp.broadcast_to(
                    self._leaf_base(spec.leaf), sample[spec.name].shape
                )
            applied = _apply_op(base, sample[spec.name], spec.operation)
            mask = self.masks[spec.name]
            updates[spec.leaf] = (
                applied if mask is None else jnp.where(mask[None], applied, base)
            )
        for spec in self.scale_specs:
            b0, b1 = self.actor_ranges[spec.actor]
            m = self.model
            body_sel = (np.arange(m.nbody) >= b0) & (np.arange(m.nbody) < b1)
            geom_sel = (np.asarray(m.geom_body) >= b0) & (
                np.asarray(m.geom_body) < b1
            )
            cp_sel = (np.asarray(m.cpoint_body) >= b0) & (
                np.asarray(m.cpoint_body) < b1
            )
            n = sample[spec.name].shape[0]
            s_ = sample[spec.name].reshape(n, 1)

            def scaled(leaf, sel, power, extra_dims):
                base = updates.get(leaf)
                if base is None:
                    base = jnp.broadcast_to(
                        self._leaf_base(leaf),
                        (n,) + self._leaf_base(leaf).shape,
                    )
                fac = s_.reshape((n, 1) + (1,) * extra_dims) ** power
                mask = jnp.asarray(sel).reshape(
                    (1, -1) + (1,) * extra_dims
                )
                return jnp.where(mask, base * fac, base)

            updates["cpoint_pos"] = scaled("cpoint_pos", cp_sel, 1.0, 1)
            updates["geom_size"] = scaled("geom_size", geom_sel, 1.0, 1)
            updates["body_ipos"] = scaled("body_ipos", body_sel, 1.0, 1)
            updates["body_mass"] = scaled("body_mass", body_sel, 3.0, 0)
            updates["body_inertia"] = scaled("body_inertia", body_sel, 5.0, 2)
        return model.replace(**updates)

    def gravity(self, base_gravity, sample: Dict[str, jax.Array]):
        """(num_envs, 3) per-env gravity, or None if not randomized."""
        if self.gravity_spec is None:
            return None
        return _apply_op(
            base_gravity[None, :], sample["gravity"], self.gravity_spec.operation
        )

    def noise(self, spec: Optional[DRSpec], key, x, frames):
        if spec is None:
            return x
        s = self._sched_scale(spec, frames)
        return _apply_op(
            x, _sample_spec(spec, key, x.shape, s), spec.operation
        )

    def observation_noise(self, key, obs, frames, dr_sample=None):
        """White + correlated obs noise (vec_task.py:397-400; correlated
        part re-drawn at DR frequency, reference range_correlated). With
        per-key specs (reference dict-DR) each key noises only its slice
        of the flat obs vector."""
        if self.obs_key_specs:
            out = obs
            for i, (kname, spec) in enumerate(
                sorted(self.obs_key_specs.items())
            ):
                sl = self._resolved_obs_slices().get(kname)
                if sl is None:
                    continue
                off, size = sl
                k = jax.random.fold_in(key, i)
                piece = self.noise(
                    spec, k, out[..., off : off + size], frames
                )
                cname = f"observations_corr.{kname}"
                if dr_sample is not None and cname in dr_sample:
                    piece = _apply_op(
                        piece, dr_sample[cname], spec.operation
                    )
                out = out.at[..., off : off + size].set(piece)
            return out
        out = self.noise(self.obs_spec, key, obs, frames)
        if dr_sample is not None and "observations_corr" in dr_sample:
            out = _apply_op(
                out, dr_sample["observations_corr"], self.obs_spec.operation
            )
        return out

    def action_noise(self, key, actions, frames, dr_sample=None):
        """White + correlated action noise (vec_task.py:370-373)."""
        out = self.noise(self.act_spec, key, actions, frames)
        if dr_sample is not None and "actions_corr" in dr_sample:
            out = _apply_op(
                out, dr_sample["actions_corr"], self.act_spec.operation
            )
        return out
