#!/usr/bin/env python
"""Harvest an in-flight/interrupted `parity.py` run's log into PARITY.json.

parity.py only writes results when a task's run_task() returns; a run cut
by a session/timeout boundary would lose its curve. This tool parses the
training log (epoch lines + deterministic-eval / success-eval lines) and
records a partial entry so the evidence survives. It never overwrites a
completed (non-partial) entry.

Usage: python parity_harvest.py <Task> <logfile>
"""
from __future__ import annotations

import json
import re
import sys

from parity import MILESTONES, SUCCESS_SPECS


def harvest(task: str, log_path: str, out="PARITY.json"):
    spec = SUCCESS_SPECS.get(task)
    if spec is not None:
        milestone, budget = spec["milestone"], spec["budget"]
        overrides = list(spec["overrides"])
        metric = spec["eval_mode"]
    else:
        milestone, budget, _cap = MILESTONES[task]
        overrides = [f"task={task}"]
        metric = "return"
    curve, evals, fps = [], [], 0.0
    # "epoch   123 | return   45.6 | fps  789 | ..." plus
    # "eval @ epoch 62: 300.1" / "  success-eval @ epoch 62: 0.31"
    ep_re = re.compile(
        r"epoch\s+(\d+)\s*\|\s*return\s+(-?[\d.]+)\s*\|\s*fps\s+(\d+)"
    )
    ev_re = re.compile(r"(?:success-)?eval @ epoch (\d+): (-?[\d.]+)")
    for line in open(log_path, errors="replace"):
        m = ep_re.search(line)
        if m:
            ep, ret, f = int(m.group(1)), float(m.group(2)), float(m.group(3))
            fps = f
            curve.append([ep, ret])
        m = ev_re.search(line)
        if m:
            evals.append([int(m.group(1)), float(m.group(2))])
    if not curve and not evals:
        print(f"nothing parsed from {log_path}")
        return 1
    # frames = epoch * horizon * num_envs; infer from the run's cfg
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(overrides)
    tp = cfg["train"]["params"]["config"]
    horizon = int(tp.get("horizon_length", tp.get("num_steps_per_episode", 1)))
    num_envs = int(cfg["task"]["env"]["numEnvs"])
    fpe = horizon * num_envs
    curve_frames = [[ep * fpe, r] for ep, r in curve]
    evals_frames = [[ep * fpe, r] for ep, r in evals]
    hit = next((f for f, r in evals_frames if r >= milestone), None)
    try:
        results = json.load(open(out))
    except FileNotFoundError:
        results = {}
    prev = results.get(task, {})
    if prev and "partial" not in prev and "error" not in prev:
        print(f"{task}: completed entry present; not overwriting")
        return 0
    last_ep = curve[-1][0] if curve else evals[-1][0]
    results[task] = {
        "metric": metric,
        "milestone": milestone,
        "reference_budget_env_steps": budget,
        "frames_to_milestone": hit,
        "epochs_to_milestone": (hit // fpe) if hit else None,
        "within_reference_budget": hit is not None and hit <= budget,
        ("success_evals" if metric != "return" else "deterministic_evals"):
            evals_frames,
        "final_mean_return": curve[-1][1] if curve else float("nan"),
        "final_success_eval": evals[-1][1] if evals else None,
        "final_frames": last_ep * fpe,
        "wall_clock_s": None,
        "fps": fps,
        "curve": curve_frames,
        "partial": (
            "harvested from an in-flight run's log; the run had not "
            "finished when this snapshot was taken"
        ),
    }
    json.dump(results, open(out, "w"), indent=1)
    print(f"{task}: harvested {len(curve)} epochs, {len(evals)} evals, "
          f"last frames={last_ep * fpe}")
    return 0


if __name__ == "__main__":
    sys.exit(harvest(sys.argv[1], sys.argv[2]))
