"""PBT training driver: in-process restart loop around the PPO trainer.

The reference restarts the whole process via os.execv with mutated CLI
args (reference pbt/pbt.py:123-177). Here a PBT 'restart' rebuilds the
trainer with the mutated config and reloads adopted weights in-process --
the filesystem population protocol is identical (see pbt/pbt.py).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import yaml


def _get_path(cfg: Dict[str, Any], dotted: str):
    node = cfg
    for k in dotted.split("."):
        node = node[k]
    return node


def _set_path(cfg: Dict[str, Any], dotted: str, value):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def run_pbt_training(cfg, env, train_params, seed, run_name, logger, pbt_cfg):
    from ..learn import PPO
    from ..pbt import PbtManager
    from .config import cfg_dir

    mutation_name = str(pbt_cfg.get("mutation_file", "default_mutation"))
    mpath = os.path.join(cfg_dir(), "pbt", "mutation", f"{mutation_name}.yaml")
    mutations = yaml.safe_load(open(mpath)) if os.path.exists(mpath) else {}

    policy_idx = int(pbt_cfg.get("policy_idx", 0))
    workspace = os.path.join(
        "runs", f"{run_name}_{pbt_cfg.get('workspace', 'pbt_workspace')}"
    )
    change = pbt_cfg.get("change_range", [1.1, 1.5])
    manager = PbtManager(
        workspace=workspace,
        policy_idx=policy_idx,
        num_policies=int(pbt_cfg.get("num_policies", 8)),
        params_to_mutate=mutations,
        mutation_rate=float(pbt_cfg.get("mutation_rate", 0.15)),
        change_min=float(change[0]),
        change_max=float(change[1]),
        interval_steps=int(pbt_cfg.get("interval_steps", 10_000_000)),
        start_after=int(pbt_cfg.get("start_after", 10_000_000)),
        initial_delay=int(pbt_cfg.get("initial_delay", 20_000_000)),
        replace_fraction_worst=float(pbt_cfg.get("replace_fraction_worst", 0.125)),
        replace_fraction_best=float(pbt_cfg.get("replace_fraction_best", 0.3)),
        threshold_frac_std=float(pbt_cfg.get("replace_threshold_frac_std", 0.5)),
        threshold_frac_abs=float(
            pbt_cfg.get("replace_threshold_frac_absolute", 0.05)
        ),
        dbg_mode=bool(pbt_cfg.get("dbg_mode", False)),
    )

    # the mutable view of cfg paths used in the mutation scheme
    full_cfg = {"train": {"params": train_params}, "task": env.cfg}

    name = f"{run_name}_p{policy_idx:02d}"
    ckpt_path = os.path.join(workspace, f"policy_{policy_idx:02d}", "weights.ckpt")
    frames_offset = 0
    epochs_done = 0
    pending = {"restart": None}
    max_iters = cfg.get("max_iterations")

    while True:
        agent = PPO(env, train_params, seed=seed)
        steps_per_epoch = agent.cfg.horizon_length * env.num_envs

        restored = pending["restart"]
        start_ts = agent.init()
        if restored is not None and restored[1]:
            start_ts, _ = agent.restore(restored[1], start_ts)
        pending["restart"] = None

        def on_epoch(ts, metrics, _agent=agent, _spe=steps_per_epoch):
            frames = frames_offset + int(metrics["epoch"]) * _spe
            obj = metrics.get("mean_episode_return", float("nan"))
            if obj != obj:
                return False
            mutable = {
                k: _get_path(full_cfg, k) for k in mutations if _has(full_cfg, k)
            }
            _agent.save(ckpt_path, ts, int(metrics["epoch"]), frames)
            if logger is not None:
                logger.log({"pbt/00_best_objective": obj}, frames)
            result = manager.maybe_evolve(frames, obj, mutable, ckpt_path)
            if result is None:
                return False
            new_params, weights = result
            for k, v in new_params.items():
                if _has(full_cfg, k):
                    _set_path(full_cfg, k, v)
            pending["restart"] = (new_params, weights)
            return True  # stop -> outer loop rebuilds the trainer

        def _has(c, dotted):
            node = c
            for k in dotted.split("."):
                if not isinstance(node, dict) or k not in node:
                    return False
                node = node[k]
            return True

        remaining = int(max_iters) - epochs_done if max_iters else None
        if remaining is not None and remaining <= 0:
            break
        ts, metrics = agent.train(
            max_epochs=remaining,
            train_dir="runs",
            name=name,
            on_epoch=on_epoch,
        )
        done_now = int(metrics.get("epoch", 0))
        epochs_done += done_now
        frames_offset += done_now * steps_per_epoch
        if pending["restart"] is None:
            break  # finished normally
