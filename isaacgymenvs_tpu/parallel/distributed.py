"""Multi-host bootstrap: one JAX process per host, single jitted SPMD
program over the global device mesh.

TPU-native replacement for the reference's torchrun/NCCL multi-node path
(reference README.md:165-172 `torchrun --nnodes=... train.py multi_gpu=True`,
rank plumbing utils/rlgames_utils.py:89-107). Differences by design
(SURVEY.md section 5.8):

  - no per-rank training loops: every process runs the SAME program; JAX
    shards the env axis over all global devices and compiles gradient
    psums over ICI/DCN into the train step;
  - the seed is NOT rank-offset (reference train.py:117-120 offsets it
    because each rank simulates its own envs; here the single global
    program derives per-env randomness from the env axis split, and all
    processes must trace identically);
  - host-side effects (logging, checkpoint writes, stdout) happen on
    process 0 only -- same contract as the reference's rank-0 wandb
    gating (reference train.py:178-183).

Activation: `python train.py multi_gpu=True ...` with torchrun-style env
vars (MASTER_ADDR/MASTER_PORT, RANK, WORLD_SIZE), or JAX-style
(JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID). Env vars
alone (no flag) also work, mirroring torchrun auto-detection.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def _env(*names: str) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v not in (None, ""):
            return v
    return None


def distributed_spec() -> Optional[dict]:
    """Read the process-group spec from the environment; None if absent."""
    addr = _env("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    if addr is None:
        host = _env("MASTER_ADDR")
        port = _env("MASTER_PORT")
        if host is not None:
            addr = f"{host}:{port or 12355}"
    nproc = _env("JAX_NUM_PROCESSES", "WORLD_SIZE")
    pid = _env("JAX_PROCESS_ID", "RANK")
    if addr is None or nproc is None or pid is None:
        return None
    return {
        "coordinator_address": addr,
        "num_processes": int(nproc),
        "process_id": int(pid),
    }


_initialized = False


def maybe_initialize(require: bool = False) -> bool:
    """Initialize the JAX process group from env vars if configured.

    Must run before the first device query. Returns True when running
    multi-process. `require=True` raises if the env vars are missing
    (the multi_gpu=True flag was given but no launcher set them up).
    """
    global _initialized
    if _initialized:
        return True
    spec = distributed_spec()
    if spec is None:
        if require:
            raise RuntimeError(
                "multi_gpu=True but no process-group env vars found: set "
                "MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE (torchrun style) "
                "or JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID"
            )
        return False
    if spec["num_processes"] <= 1:
        return False
    jax.distributed.initialize(**spec)
    _initialized = True
    return True


def is_main_process() -> bool:
    """True on the process that owns host-side effects (logs/checkpoints)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()
