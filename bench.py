#!/usr/bin/env python
"""Headline benchmark: Ant env-steps/s on the available device(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the Isaac Gym technical paper (arXiv:2108.10470, linked from the
reference README) reports ~3e5 env-steps/s for Ant-class tasks on one A100
(the reference repo itself publishes no throughput tables — BASELINE.md).
vs_baseline = our env-steps/s per chip / 3e5.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEPS_PER_SEC = 3.0e5  # A100 Ant-class, Isaac Gym paper


def main():
    import jax
    import jax.numpy as jnp

    from isaacgymenvs_tpu.tasks import task_map

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    horizon = int(os.environ.get("BENCH_HORIZON", 16))
    cfg = {
        "env": {"numEnvs": num_envs, "clipActions": 1.0},
        "sim": {"dt": 1 / 60, "substeps": 2},
    }
    env = task_map["Ant"](cfg)
    state, obs = env.reset(jax.random.PRNGKey(0))

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.uniform(
                k, (env.num_envs, env.num_acts), minval=-1.0, maxval=1.0
            )
            state, obs, rew, done, extras = env.step(state, actions)
            return (state, key), rew

        (state, key), rews = jax.lax.scan(body, (state, key), None, length=horizon)
        return state, rews

    run = jax.jit(rollout)
    key = jax.random.PRNGKey(1)
    state, rews = run(state, key)  # compile + warmup
    jax.block_until_ready(rews)

    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        state, rews = run(state, key)
    jax.block_until_ready(rews)
    dt = time.perf_counter() - t0

    steps = reps * horizon * num_envs
    sps = steps / dt
    print(
        json.dumps(
            {
                "metric": f"Ant env-steps/s ({num_envs} envs, 1 chip)",
                "value": round(sps),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
