"""Multi-experiment launcher (local + Slurm backends).

Mirrors the reference's pbt/launcher (reference pbt/launcher/run.py:50,
run_description.py ParamGrid:35 / Experiment:87 / RunDescription:141,
run_processes.py:34 local backend, run_slurm.py:65 Slurm backend): a
parameter grid expands into per-policy command lines which run as
parallel local processes with a concurrency cap, or as one sbatch job
per policy on a Slurm cluster (each job = one TPU host; the decentralized
PBT filesystem protocol needs only a shared train_dir). The NGC backend
is out of scope (NVIDIA-cloud specific).
"""
from __future__ import annotations

import itertools
import os
import shlex
import subprocess
import sys
import time
from typing import Dict, Iterable, List, Sequence, Tuple


class ParamGrid:
    """(reference run_description.py:35-70)"""

    def __init__(self, grid_tuples: Sequence[Tuple[str, Iterable]]):
        self.grid = list(grid_tuples)

    def generate_params(self, randomize: bool = False) -> List[Dict]:
        names = [n for n, _ in self.grid]
        combos = list(itertools.product(*[list(v) for _, v in self.grid]))
        if randomize:
            import random

            random.shuffle(combos)
        return [dict(zip(names, c)) for c in combos]


class Experiment:
    def __init__(self, name: str, cmd: str, param_generator: Iterable[Dict]):
        self.name = name
        self.cmd = cmd
        self.params = list(param_generator)

    def generate_experiments(self):
        for i, p in enumerate(self.params):
            args = " ".join(f"{k}={v}" for k, v in p.items())
            yield f"{self.name}_{i:02d}", f"{self.cmd} {args}"


class RunDescription:
    def __init__(self, run_name: str, experiments: Sequence[Experiment]):
        self.run_name = run_name
        self.experiments = list(experiments)


def run_local(
    run: RunDescription,
    max_parallel: int = 4,
    train_dir: str = "runs",
    python: str = sys.executable,
) -> int:
    """Run all experiment commands as local processes with a concurrency
    cap (reference run_processes.py:34-60; GPU-packing is irrelevant with
    a single shared TPU -- processes queue instead)."""
    queue: List[Tuple[str, str]] = []
    for exp in run.experiments:
        queue.extend(exp.generate_experiments())
    running: List[Tuple[str, subprocess.Popen]] = []
    failures = 0
    logdir = os.path.join(train_dir, run.run_name)
    os.makedirs(logdir, exist_ok=True)
    while queue or running:
        while queue and len(running) < max_parallel:
            name, cmd = queue.pop(0)
            log = open(os.path.join(logdir, f"{name}.log"), "w")
            proc = subprocess.Popen(
                [python] + shlex.split(cmd), stdout=log, stderr=subprocess.STDOUT
            )
            running.append((name, proc))
            print(f"[launcher] started {name}: {cmd}")
        still = []
        for name, proc in running:
            rc = proc.poll()
            if rc is None:
                still.append((name, proc))
            else:
                print(f"[launcher] {name} finished rc={rc}")
                failures += rc != 0
        running = still
        time.sleep(2.0)
    return failures


SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={name}
#SBATCH --output={logdir}/{name}.log
#SBATCH --nodes=1
#SBATCH --ntasks=1
#SBATCH --cpus-per-task={cpus}
{extra_directives}
{setup}
srun {python} {cmd}
"""


def run_slurm(
    run: RunDescription,
    train_dir: str = "runs",
    python: str = sys.executable,
    cpus_per_task: int = 16,
    partition: str = "",
    time_limit: str = "",
    setup: str = "",
    sbatch: str = "sbatch",
    submit: bool = True,
) -> List[str]:
    """Slurm backend (reference pbt/launcher/run_slurm.py:65): one sbatch
    job per experiment command. Returns the generated script paths;
    `submit=False` only writes them (useful where sbatch is unavailable --
    this repo's CI has no Slurm, so submission is exercised in production
    only). PBT policies coordinate through the shared `train_dir`
    filesystem exactly as with the local backend."""
    logdir = os.path.join(train_dir, run.run_name)
    os.makedirs(logdir, exist_ok=True)
    extra = []
    if partition:
        extra.append(f"#SBATCH --partition={partition}")
    if time_limit:
        extra.append(f"#SBATCH --time={time_limit}")
    scripts = []
    for exp in run.experiments:
        for name, cmd in exp.generate_experiments():
            script = SBATCH_TEMPLATE.format(
                name=name,
                logdir=logdir,
                cpus=cpus_per_task,
                extra_directives="\n".join(extra),
                setup=setup,
                python=python,
                cmd=cmd,
            )
            path = os.path.join(logdir, f"{name}.sbatch")
            with open(path, "w") as f:
                f.write(script)
            scripts.append(path)
            if submit:
                subprocess.check_call([sbatch, path])
                print(f"[launcher] submitted {name} via {sbatch}")
    return scripts
