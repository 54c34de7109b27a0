"""Multi-host distributed training: 2 real processes, one global mesh.

The TPU-native counterpart of the reference's torchrun multi-node path
(reference README.md:165-172): each process owns 4 virtual CPU devices,
`jax.distributed.initialize` forms the process group, and one jitted PPO
epoch runs SPMD over the global 8-device mesh with env-axis sharding
(parallel/distributed.py + parallel/sharding.py).

Asserts: both ranks complete, their metrics agree exactly (same global
program), and match a single-process 8-device run of the same config.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize("localhost:" + port, num_processes=2, process_id=pid)
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

sys.path.insert(0, {root!r})
from isaacgymenvs_tpu.tasks import task_map
from isaacgymenvs_tpu.learn import PPO
from isaacgymenvs_tpu.parallel import make_mesh, distributed as dist

env = task_map["Cartpole"]({{"env": {{"numEnvs": 32, "clipActions": 1.0}}}})
params = {{
    "config": {{
        "horizon_length": 8, "minibatch_size": 64, "mini_epochs": 1,
        "max_epochs": 3, "learning_rate": 3e-4, "lr_schedule": "fixed",
    }},
    "network": {{"mlp": {{"units": [32, 32]}}}},
}}
agent = PPO(env, params, seed=7)
mesh = make_mesh()
assert mesh.devices.size == 8
ts, metrics = agent.train(max_epochs=3, mesh=mesh, log_every=100)
out = {{
    "rank": pid,
    "main": dist.is_main_process(),
    "kl": float(metrics["kl"]),
    "a_loss": float(metrics["a_loss"]),
    "c_loss": float(metrics["c_loss"]),
}}
with open(out_path, "w") as f:
    json.dump(out, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(root=ROOT))
    port = _free_port()
    outs = [tmp_path / f"out_{i}.json" for i in range(2)]
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    results = [json.loads(o.read_text()) for o in outs]
    r0, r1 = sorted(results, key=lambda r: r["rank"])
    assert r0["main"] and not r1["main"]
    # both ranks run the same global program -> identical metrics
    for k in ("kl", "a_loss", "c_loss"):
        assert np.isfinite(r0[k])
        assert r0[k] == pytest.approx(r1[k], rel=1e-5), k

    # single-process 8-device run of the identical config
    from isaacgymenvs_tpu.learn import PPO
    from isaacgymenvs_tpu.parallel import make_mesh
    from isaacgymenvs_tpu.tasks import task_map

    env1 = task_map["Cartpole"]({"env": {"numEnvs": 32, "clipActions": 1.0}})
    agent = PPO(
        env1,
        {
            "config": {
                "horizon_length": 8, "minibatch_size": 64, "mini_epochs": 1,
                "max_epochs": 3, "learning_rate": 3e-4, "lr_schedule": "fixed",
            },
            "network": {"mlp": {"units": [32, 32]}},
        },
        seed=7,
    )
    ts, m1 = agent.train(max_epochs=3, mesh=make_mesh(8), log_every=100)
    for k in ("kl", "a_loss", "c_loss"):
        assert r0[k] == pytest.approx(float(m1[k]), rel=1e-3, abs=1e-5), k
