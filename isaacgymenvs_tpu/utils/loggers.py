"""Metric logging: console + TensorBoard + optional W&B.

Mirrors the reference's three observability surfaces (SURVEY.md 5.5):
console fps lines, TensorBoard scalars under runs/<exp>/summaries
(rl_games writer + RLGPUAlgoObserver, reference utils/rlgames_utils.py:
130-209), and Weights & Biases when wandb_activate is set (reference
utils/wandb_utils.py:7-60). Metrics arrive already reduced on-device.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional


class TensorBoardLogger:
    """Writes scalars via torch.utils.tensorboard (torch is CPU-only in
    this stack and used solely for the event-file writer)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(logdir)
        except Exception:
            self._w = None

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if self._w is None:
            return
        for k, v in metrics.items():
            try:
                self._w.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self) -> None:
        if self._w is not None:
            self._w.close()


class WandbLogger:
    """Best-effort W&B logging (rank-0 only in multi-host runs)."""

    def __init__(self, project: str, name: str, group: str = "", entity: str = "", cfg=None):
        self._run = None
        try:
            import wandb

            self._run = wandb.init(
                project=project, name=name,
                group=group or None, entity=entity or None,
                config=cfg, resume="allow",
            )
        except Exception:
            pass

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if self._run is None:
            return
        try:
            self._run.log(dict(metrics), step=step)
        except Exception:
            pass

    def close(self) -> None:
        if self._run is not None:
            self._run.finish()


class MultiLogger:
    """Fan-out (the reference's MultiObserver, rlgames_utils.py:212-240)."""

    def __init__(self, *loggers):
        self.loggers = [l for l in loggers if l is not None]

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        for l in self.loggers:
            l.log(metrics, step)

    def close(self) -> None:
        for l in self.loggers:
            l.close()


def build_logger(cfg: Dict[str, Any], run_name: str) -> Optional[MultiLogger]:
    loggers = []
    run_dir = os.path.join("runs", run_name)
    loggers.append(TensorBoardLogger(os.path.join(run_dir, "summaries")))
    if cfg.get("wandb_activate"):
        loggers.append(
            WandbLogger(
                project=str(cfg.get("wandb_project", "isaacgymenvs_tpu")),
                name=str(cfg.get("wandb_name", run_name)),
                group=str(cfg.get("wandb_group", "")),
                entity=str(cfg.get("wandb_entity", "")),
                cfg=cfg,
            )
        )
    return MultiLogger(*loggers)
