"""Automatic Domain Randomization (ADR), OpenAI Algorithm 1.

TPU-native re-design of the reference's ADR engine (reference
isaacgymenvs/tasks/dextreme/adr_vec_task.py:489-1250; config schema
cfg/task/AllegroHandDextremeADR.yaml `adr:` block): per-parameter
randomization ranges [lo, hi] evolve based on the measured performance of
BOUNDARY worker envs that pin one parameter at a range edge:

  * a fraction of envs are boundary workers, the rest rollout workers
    (worker_adr_boundary_fraction, :524,740-758);
  * each boundary (param, lo|hi) accumulates episode objectives in a
    fixed-length queue (:556); when full, the mean is compared against
    adr_objective_threshold_low/high: good performance at a boundary
    widens that edge by `delta`, poor performance narrows it (:760+),
    clamped to `limits`;
  * range entropy (mean log width, 'nats') tracks progress (:767).

Everything is a fixed-shape array program living inside the jitted env
step: queues are (2P, Q) rings with PER-ENV pushes (reference
adr_vec_task.py:556 semantics) -- finished boundary envs are grouped by
boundary id, ranked within their group, and scattered into consecutive
ring slots with a static-shape scatter (see update()).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class AdrParamSpec(NamedTuple):
    name: str
    init_lo: float
    init_hi: float
    limit_lo: float
    limit_hi: float
    delta: float
    delta_style: str  # 'additive' | 'multiplicative'
    # dotted DR path for physics ("builtin") params that flow through the
    # dict-DR engine instead of the task's tensor stack (reference
    # adr_vec_task.py:543-544): "actor_params.hand.dof_properties.
    # damping.range" -> DR spec "hand.dof_properties.damping"
    range_path: str = ""


@struct.dataclass
class AdrState:
    lo: jax.Array  # (P,)
    hi: jax.Array  # (P,)
    queues: jax.Array  # (2P, Q) objective samples
    counts: jax.Array  # (2P,)
    worker_boundary: jax.Array  # (N,) -1 rollout, else boundary id in [0, 2P)
    nats: jax.Array  # () range entropy


class ADR:
    def __init__(self, cfg: Dict[str, Any], num_envs: int):
        self.enabled = bool(cfg.get("use_adr", False))
        self.update_ranges = bool(cfg.get("update_adr_ranges", True))
        self.boundary_fraction = float(cfg.get("worker_adr_boundary_fraction", 0.4))
        self.queue_len = int(cfg.get("adr_queue_threshold_length", 256))
        self.t_low = float(cfg.get("adr_objective_threshold_low", 5))
        self.t_high = float(cfg.get("adr_objective_threshold_high", 20))
        self.num_envs = num_envs
        self.specs: List[AdrParamSpec] = []
        for name, p in (cfg.get("params") or {}).items():
            init = p.get("init_range", [0.0, 1.0])
            lim = p.get("limits", [0.0, 1.0])
            self.specs.append(
                AdrParamSpec(
                    name=name,
                    init_lo=float(init[0]),
                    init_hi=float(init[1]),
                    limit_lo=float(lim[0]),
                    limit_hi=float(lim[1]),
                    delta=float(p.get("delta", 0.01)),
                    delta_style=str(p.get("delta_style", "additive")),
                    range_path=str(p.get("range_path", "") or ""),
                )
            )
        self.P = len(self.specs)
        # range_path params: param index -> DR spec name
        self.dr_params = {}
        for i, spec in enumerate(self.specs):
            if spec.range_path:
                name = spec.range_path
                if name.startswith("actor_params."):
                    name = name[len("actor_params."):]
                if name.endswith(".range"):
                    name = name[: -len(".range")]
                self.dr_params[name] = i

    # ------------------------------------------------------------------
    def init_state(self, key) -> AdrState:
        P, N, Q = self.P, self.num_envs, self.queue_len
        lo = jnp.asarray([s.init_lo for s in self.specs])
        hi = jnp.asarray([s.init_hi for s in self.specs])
        worker = self._assign_workers(key)
        width = jnp.maximum(hi - lo, 1e-9)
        return AdrState(
            lo=lo,
            hi=hi,
            queues=jnp.zeros((2 * P, Q)),
            counts=jnp.zeros(2 * P, jnp.int32),
            worker_boundary=worker,
            nats=jnp.mean(jnp.log(width)),
        )

    def _assign_workers(self, key):
        """(N,) boundary id or -1 (recycle_envs :740-758)."""
        N, P = self.num_envs, self.P
        kb, kw = jax.random.split(key)
        is_boundary = (
            jax.random.uniform(kb, (N,)) < self.boundary_fraction
        )
        b = jax.random.randint(kw, (N,), 0, 2 * P)
        return jnp.where(is_boundary, b, -1)

    # ------------------------------------------------------------------
    def sample(self, state: AdrState, key, n: int) -> jax.Array:
        """(n, P) parameter values: rollout workers ~ U[lo, hi]; boundary
        workers pin their boundary's param at its edge
        (sample_adr_tensor :666-730)."""
        u = jax.random.uniform(key, (n, self.P))
        vals = state.lo + u * (state.hi - state.lo)
        wb = state.worker_boundary[:, None]  # (n, 1)
        pidx = jnp.arange(self.P)[None, :]
        is_mine = (wb >= 0) & (wb // 2 == pidx)
        edge_hi = (wb % 2) == 1
        pinned = jnp.where(edge_hi, state.hi[None, :], state.lo[None, :])
        return jnp.where(is_mine, pinned, vals)

    # ------------------------------------------------------------------
    def update(self, state: AdrState, key, done, objective) -> AdrState:
        """Per-step: push finished boundary episodes' objectives, evolve
        ranges for any full queue (adr_update :760+). Fixed shapes."""
        if not self.update_ranges:
            return state
        P, Q = self.P, self.queue_len
        N = self.num_envs
        wb = state.worker_boundary
        is_b = (wb >= 0) & done
        # PER-ENV pushes (reference adr_vec_task.py:556 extends the
        # boundary's queue with every finishing env's objective): sort
        # envs by boundary id, rank within each group, and scatter each
        # entry into the boundary's ring at (count + rank) mod Q. Fixed
        # shapes; non-boundary/unfinished envs go to row 2P which the
        # scatter drops as out-of-bounds.
        seg = jnp.where(is_b, wb, 2 * P)  # (N,)
        order = jnp.argsort(seg)
        sseg = seg[order]
        first = jnp.searchsorted(sseg, sseg, side="left")
        rank = jnp.arange(N) - first
        base_cnt = state.counts[jnp.clip(sseg, 0, 2 * P - 1)]
        slot = (base_cnt + rank) % Q
        row = jnp.where(sseg < 2 * P, sseg, 2 * P)  # OOB row -> dropped
        queues = state.queues.at[row, slot].set(
            objective[order], mode="drop"
        )
        cnts = jax.ops.segment_sum(
            is_b.astype(jnp.int32), seg, num_segments=2 * P + 1
        )[: 2 * P]
        counts = state.counts + cnts

        full = counts >= Q
        mean_perf = jnp.sum(queues, axis=1) / Q

        lo, hi = state.lo, state.hi
        deltas = jnp.asarray([s.delta for s in self.specs])
        lim_lo = jnp.asarray([s.limit_lo for s in self.specs])
        lim_hi = jnp.asarray([s.limit_hi for s in self.specs])
        mult = jnp.asarray(
            [s.delta_style == "multiplicative" for s in self.specs]
        )

        def evolve(bound_vals, is_upper):
            b_idx = jnp.arange(P) * 2 + (1 if is_upper else 0)
            f = full[b_idx]
            perf = mean_perf[b_idx]
            widen = f & (perf >= self.t_high)
            narrow = f & (perf < self.t_low)
            sign = 1.0 if is_upper else -1.0
            step_add = deltas * sign
            widened = jnp.where(
                mult, bound_vals * jnp.where(is_upper, 1 + deltas, 1 / (1 + deltas)),
                bound_vals + step_add,
            )
            narrowed = jnp.where(
                mult, bound_vals * jnp.where(is_upper, 1 / (1 + deltas), 1 + deltas),
                bound_vals - step_add,
            )
            out = jnp.where(widen, widened, jnp.where(narrow, narrowed, bound_vals))
            return jnp.clip(out, lim_lo, lim_hi), f

        new_lo, full_lo = evolve(lo, is_upper=False)
        new_hi, full_hi = evolve(hi, is_upper=True)
        new_lo = jnp.minimum(new_lo, new_hi - 1e-9)

        # clear the queues that just evaluated
        cleared = jnp.repeat(full_lo | full_hi, 2) & full
        counts = jnp.where(cleared, 0, counts)
        queues = jnp.where(cleared[:, None], 0.0, queues)

        # reassign worker modes for evaluated boundaries' envs
        key, kw = jax.random.split(key)
        fresh = self._assign_workers(kw)
        needs_recycle = is_b & cleared[jnp.clip(wb, 0, 2 * P - 1)]
        worker = jnp.where(needs_recycle, fresh, wb)

        width = jnp.maximum(new_hi - new_lo, 1e-9)
        return AdrState(
            lo=new_lo,
            hi=new_hi,
            queues=queues,
            counts=counts,
            worker_boundary=worker,
            nats=jnp.mean(jnp.log(width)),
        )

    def param_names(self):
        return [s.name for s in self.specs]

    # ------------------------------------------------------------------
    def dr_overrides(self, state: AdrState):
        """{dr_spec_name: {"lo","hi","pin_mask","pin_val"}} feeding the
        dict-DR engine: evolving ranges for range_path params plus per-env
        boundary pins (reference get_dr_params_by_env_id
        adr_vec_task.py:570-610)."""
        out = {}
        wb = state.worker_boundary
        for name, i in self.dr_params.items():
            mask = (wb >= 0) & (wb // 2 == i)
            val = jnp.where((wb % 2) == 1, state.hi[i], state.lo[i])
            out[name] = {
                "lo": state.lo[i],
                "hi": state.hi[i],
                "pin_mask": mask,
                "pin_val": val,
            }
        return out
