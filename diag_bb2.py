#!/usr/bin/env python
"""BallBalance experiment harness: train N epochs under a cfg variant,
report rolling + deterministic returns. Variants via env vars:
  BB_SUBSTEPS, BB_ITERS, BB_EPOCHS, BB_FUSED (auto|0), BB_SEED
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from isaacgymenvs_tpu.learn import PPO
    from isaacgymenvs_tpu.tasks import task_map
    from isaacgymenvs_tpu.utils.config import load_config

    epochs = int(os.environ.get("BB_EPOCHS", "400"))
    cfg = load_config(["task=BallBalance", "headless=True"])
    sim = cfg["task"]["sim"]
    if os.environ.get("BB_SUBSTEPS"):
        sim["substeps"] = int(os.environ["BB_SUBSTEPS"])
    if os.environ.get("BB_ITERS"):
        sim["physx"]["num_position_iterations"] = int(os.environ["BB_ITERS"])
    if os.environ.get("BB_FUSED") == "0":
        sim["use_fused"] = False
    env = task_map["BallBalance"](cfg["task"])
    agent = PPO(env, cfg["train"]["params"],
                seed=int(os.environ.get("BB_SEED", "42")))
    t0 = time.time()
    best = {"ret": -1e9, "epoch": 0}

    def on_epoch(ts, metrics):
        r = metrics["mean_episode_return"]
        if r == r and r > best["ret"]:
            best["ret"] = r
            best["epoch"] = int(metrics["epoch"])
        return False

    ts, last = agent.train(max_epochs=epochs, on_epoch=on_epoch, log_every=100)
    print(f"[{time.time()-t0:.0f}s] rolling final "
          f"{last.get('mean_episode_return'):.1f} best {best['ret']:.1f} "
          f"@ep{best['epoch']}")

    state, obs = env.reset(jax.random.PRNGKey(7))
    step = jax.jit(env.step)
    act = jax.jit(agent.act)
    ret = np.zeros(env.num_envs)
    done_rets = []
    for _ in range(env.max_episode_length + 1):
        state, obs, rew, done, ex = step(state, act(ts, obs))
        ret += np.asarray(rew)
        d = np.asarray(done)
        if d.any():
            done_rets += ret[d].tolist()
            ret[d] = 0.0
    print(f"deterministic eval: {np.mean(done_rets):.1f} "
          f"(n={len(done_rets)})")


if __name__ == "__main__":
    main()
