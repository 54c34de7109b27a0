"""Population-Based Training: decentralized, filesystem-coordinated.

Mirrors the reference's design (reference isaacgymenvs/pbt/pbt.py:200-692,
docs/pbt.md:28-47): each policy process periodically dumps
<workspace>/<policy_idx>/{iteration:06d}.yaml (+ a weights file), reads the
whole population's latest checkpoints, ranks by true_objective (fallback:
mean episode return), and -- when it sits in the bottom
replace_fraction_worst and trails the best by more than
max(frac_std * sigma, frac_abs * |best|) -- adopts a random top policy's
weights and mutates its own hyperparameters. Every filesystem operation is
fault-tolerant: any failure aborts the PBT step and training continues
(pbt.py:311-326,448-481). The sigma used in the threshold is
outlier-trimmed so crashed policies don't freeze evolution (:400-410).

One deliberate divergence (SURVEY.md 2.7 TPU plan): instead of restarting
the process via os.execv, the caller reloads weights and rebuilds the
trainer in-process -- JAX has no CUDA-context poisoning that forces a
process restart. The filesystem protocol itself is unchanged, so
populations can span hosts on shared storage.
"""
from __future__ import annotations

import os
import random
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import yaml

from .mutation import mutate


def _safe(fn, default=None):
    try:
        return fn()
    except Exception:
        return default


class PbtManager:
    def __init__(
        self,
        workspace: str,
        policy_idx: int,
        num_policies: int,
        params_to_mutate: Dict[str, str],
        mutation_rate: float = 0.15,
        change_min: float = 1.1,
        change_max: float = 1.5,
        interval_steps: int = 10_000_000,
        start_after: int = 10_000_000,
        initial_delay: int = 20_000_000,
        replace_fraction_worst: float = 0.125,
        replace_fraction_best: float = 0.3,
        threshold_frac_std: float = 0.5,
        threshold_frac_abs: float = 0.05,
        dbg_mode: bool = False,
    ):
        self.workspace = workspace
        self.policy_idx = int(policy_idx)
        self.num_policies = int(num_policies)
        self.params_to_mutate = dict(params_to_mutate)
        self.mutation_rate = mutation_rate
        self.change_min = change_min
        self.change_max = change_max
        self.interval_steps = int(interval_steps)
        self.start_after = int(start_after)
        self.initial_delay = int(initial_delay)
        self.replace_fraction_worst = replace_fraction_worst
        self.replace_fraction_best = replace_fraction_best
        self.threshold_frac_std = threshold_frac_std
        self.threshold_frac_abs = threshold_frac_abs
        self.dbg_mode = dbg_mode
        self.session_start_frames: Optional[int] = None
        self.last_iteration = -1
        os.makedirs(self._dir(self.policy_idx), exist_ok=True)

    # ---- filesystem protocol ------------------------------------------
    def _dir(self, idx: int) -> str:
        return os.path.join(self.workspace, f"policy_{idx:02d}")

    def save_checkpoint(
        self,
        frames: int,
        objective: float,
        params: Dict[str, Any],
        weights_path: str,
    ) -> None:
        """Write {iteration:06d}.yaml describing this policy's state
        (reference _save_pbt_checkpoint :269-300)."""
        iteration = frames // self.interval_steps
        meta = {
            "iteration": int(iteration),
            "frames": int(frames),
            "true_objective": float(objective),
            "params": params,
            "checkpoint": os.path.abspath(weights_path),
            "timestamp": time.time(),
        }
        path = os.path.join(self._dir(self.policy_idx), f"{iteration:06d}.yaml")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            yaml.safe_dump(meta, f)
        os.replace(tmp, path)

    def _load_population(self, iteration: int) -> List[Optional[Dict]]:
        """Latest checkpoint <= iteration per policy
        (reference _load_population_checkpoints :328-362)."""
        out: List[Optional[Dict]] = []
        for idx in range(self.num_policies):
            d = self._dir(idx)
            best = None
            files = _safe(lambda: sorted(os.listdir(d)), []) or []
            for fn in reversed(files):
                if not fn.endswith(".yaml"):
                    continue
                it = _safe(lambda: int(fn.split(".")[0]), None)
                if it is None or it > iteration:
                    continue
                best = _safe(
                    lambda: yaml.safe_load(open(os.path.join(d, fn)))
                )
                break
            out.append(best)
        return out

    # ---- the PBT decision ---------------------------------------------
    def maybe_evolve(
        self, frames: int, objective: float, params: Dict[str, Any],
        weights_path: str,
    ) -> Optional[Tuple[Dict[str, Any], Optional[str]]]:
        """Call after each epoch. Returns None (keep training) or
        (mutated_params, weights_to_load_or_None) when this policy should
        restart with new hyperparameters (reference after_steps :269-489).
        """
        if self.session_start_frames is None:
            self.session_start_frames = frames
        iteration = frames // self.interval_steps
        if iteration <= self.last_iteration:
            return None
        self.last_iteration = iteration

        _safe(
            lambda: self.save_checkpoint(frames, objective, params, weights_path)
        )

        # warmup gates (start_after after restarts, initial_delay at start)
        if frames - self.session_start_frames < self.start_after and not self.dbg_mode:
            return None
        if frames < self.initial_delay and not self.dbg_mode:
            return None

        pop = self._load_population(iteration)
        objectives = [
            (i, p["true_objective"]) for i, p in enumerate(pop) if p is not None
        ]
        if len(objectives) < max(2, self.num_policies // 2) and not self.dbg_mode:
            return None
        objectives.sort(key=lambda t: t[1])
        ranked = [i for i, _ in objectives]
        values = np.asarray([v for _, v in objectives])

        n_worst = max(1, round(self.replace_fraction_worst * self.num_policies))
        n_best = max(1, round(self.replace_fraction_best * self.num_policies))
        worst = ranked[:n_worst]
        best = ranked[-n_best:]

        if self.policy_idx not in worst and not self.dbg_mode:
            # healthy policy: untouched (reference pbt.py:373-376
            # "don't touch the policies that are doing okay")
            return None

        # outlier-trimmed sigma (pbt.py:400-410)
        trimmed = values[max(0, len(values) // 8):]
        sigma = float(np.std(trimmed)) if len(trimmed) > 1 else 0.0
        best_obj = float(values[-1])
        threshold = max(
            self.threshold_frac_std * sigma,
            self.threshold_frac_abs * abs(best_obj),
        )
        donor = random.choice(best)
        if best_obj - objective <= threshold and not self.dbg_mode:
            # gap too small to justify adopting the donor's weights, but a
            # worst policy ALWAYS mutates: "replace with self" -- keep own
            # weights, restart with mutated hyperparameters (reference
            # pbt.py:419-432)
            donor = self.policy_idx
        donor_meta = pop[donor]
        if donor_meta is None:
            return None
        # 50/50: adopt the donor's params or keep mutating our own
        # (reference pbt.py:437-441)
        src_params = (
            donor_meta.get("params", params) if random.random() < 0.5 else params
        )
        new_params = mutate(
            src_params,
            self.params_to_mutate,
            self.mutation_rate,
            self.change_min,
            self.change_max,
        )
        weights = (
            donor_meta.get("checkpoint") if donor != self.policy_idx else None
        )
        if weights is not None and not os.path.exists(weights):
            weights = None
        print(
            f"[pbt] policy {self.policy_idx}: objective {objective:.2f} "
            f"trails best {best_obj:.2f} (thr {threshold:.2f}); adopting "
            f"policy {donor} weights + mutated params"
        )
        # restarting resets the start_after warmup
        self.session_start_frames = frames
        return new_params, weights
