"""PBT subsystem tests: mutation semantics + the filesystem protocol."""
import os
import random

import numpy as np
import yaml

from isaacgymenvs_tpu.pbt import PbtManager, mutate
from isaacgymenvs_tpu.pbt.launcher import Experiment, ParamGrid, RunDescription
from isaacgymenvs_tpu.pbt.mutation import (
    mutate_discount,
    mutate_eps_clip,
    mutate_mini_epochs,
)


def test_mutation_functions_stay_in_bounds():
    random.seed(0)
    for _ in range(100):
        assert 0.01 <= mutate_eps_clip(0.2) <= 0.3
        assert 1 <= mutate_mini_epochs(4) <= 8
        g = mutate_discount(0.99)
        assert 0.9 < g < 1.0
    out = mutate(
        {"a": 1.0, "b": "3e-4"}, {"a": "mutate_float", "b": "mutate_float"},
        mutation_rate=1.0, change_min=1.1, change_max=1.5,
    )
    assert out["a"] != 1.0
    assert isinstance(out["b"], float)


def test_fs_protocol_adopts_best(tmp_path):
    ws = str(tmp_path / "pop")
    mutations = {"lr": "mutate_float"}
    managers = [
        PbtManager(
            ws, i, 4, mutations, interval_steps=1000, start_after=0,
            initial_delay=0, mutation_rate=1.0,
        )
        for i in range(4)
    ]
    # everyone checkpoints at iteration 1 with different objectives
    weights = {}
    for i, m in enumerate(managers):
        wp = str(tmp_path / f"w{i}.ckpt")
        open(wp, "w").write("weights")
        weights[i] = wp
        m.session_start_frames = 0
        m.save_checkpoint(1000, float(i * 100), {"lr": 3e-4 * (i + 1)}, wp)
    # the worst policy (objective 0) should evolve toward a top performer
    worst = managers[0]
    worst.session_start_frames = 0
    result = worst.maybe_evolve(1000, 0.0, {"lr": 3e-4}, weights[0])
    assert result is not None
    new_params, adopted = result
    assert adopted in (weights[2], weights[3])  # top replace_fraction_best
    assert "lr" in new_params
    # best policy keeps training
    best = managers[3]
    best.session_start_frames = 0
    best.last_iteration = -1
    assert best.maybe_evolve(1000, 300.0, {"lr": 3e-4}, weights[3]) is None


def test_param_grid():
    grid = ParamGrid([("seed", [1, 2]), ("pbt.policy_idx", [0, 1, 2])])
    params = grid.generate_params()
    assert len(params) == 6
    exp = Experiment("ant_pbt", "train.py task=Ant", params)
    cmds = list(exp.generate_experiments())
    assert len(cmds) == 6
    assert "seed=1" in cmds[0][1] and "pbt.policy_idx=0" in cmds[0][1]


def test_worst_policy_always_mutates_even_below_threshold(tmp_path):
    """A worst policy whose gap to the best is below the replacement
    threshold still restarts with mutated hyperparameters and its OWN
    weights ("replace with self", reference pbt.py:419-441)."""
    ws = str(tmp_path / "pop")
    mutations = {"lr": "mutate_float"}
    managers = [
        PbtManager(
            ws, i, 4, mutations, interval_steps=1000, start_after=0,
            initial_delay=0, mutation_rate=1.0,
        )
        for i in range(4)
    ]
    weights = {}
    # nearly identical objectives: gap below any threshold
    for i, m in enumerate(managers):
        wp = str(tmp_path / f"w{i}.ckpt")
        open(wp, "w").write("weights")
        weights[i] = wp
        m.session_start_frames = 0
        m.save_checkpoint(1000, 100.0 + 1e-6 * i, {"lr": 3e-4}, wp)
    random.seed(1)
    worst = managers[0]
    worst.session_start_frames = 0
    result = worst.maybe_evolve(1000, 100.0, {"lr": 3e-4}, weights[0])
    assert result is not None, "worst policy must still mutate"
    new_params, adopted = result
    assert adopted is None  # keeps its own weights
    assert new_params["lr"] != 3e-4


def test_slurm_backend_generates_scripts(tmp_path):
    """Slurm backend (reference run_slurm.py:65): one sbatch script per
    experiment command with the right directives; submit=False only
    writes them (no Slurm in CI)."""
    from isaacgymenvs_tpu.pbt.launcher import run_slurm

    grid = ParamGrid([("seed", [1, 2])])
    run = RunDescription(
        "slurm_test",
        [Experiment("ant", "train.py task=Ant", grid.generate_params())],
    )
    scripts = run_slurm(
        run, train_dir=str(tmp_path), partition="tpu", time_limit="4:00:00",
        submit=False,
    )
    assert len(scripts) == 2
    body = open(scripts[0]).read()
    assert "#SBATCH --partition=tpu" in body
    assert "train.py task=Ant seed=1" in body
    assert "#SBATCH --job-name=ant_00" in body
