#!/usr/bin/env python
"""Convert an rl_games .pth checkpoint (reference-trained) into this
framework's .ckpt format so it can be evaluated or fine-tuned here:

    python tools/convert_rlgames_checkpoint.py \
        --pth runs/Ant/nn/Ant.pth --task Ant --out Ant_converted.ckpt
    python train.py task=Ant test=True checkpoint=Ant_converted.ckpt

Builds the agent from the same task/train configs the reference uses
(pass --train if the policy was trained with a non-default variant), maps
the a2c network weights + normalizer stats (utils/rlgames_compat.py), and
saves through the normal checkpoint path. The optimizer state starts
fresh (Adam moments don't transfer across frameworks).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True, help="rl_games .pth checkpoint")
    p.add_argument("--task", required=True, help="task name (e.g. Ant)")
    p.add_argument("--train", default=None, help="train config override")
    p.add_argument("--out", required=True, help="output .ckpt path")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from isaacgymenvs_tpu.learn import PPO
    from isaacgymenvs_tpu.tasks import task_map
    from isaacgymenvs_tpu.utils.config import load_config
    from isaacgymenvs_tpu.utils.rlgames_compat import (
        convert_into_train_state,
        load_rlgames_state_dict,
    )

    overrides = [f"task={args.task}", "num_envs=2", "headless=True"]
    if args.train:
        overrides.append(f"train={args.train}")
    cfg = load_config(overrides)
    env = task_map[args.task](cfg["task"])
    agent = PPO(env, cfg["train"]["params"], seed=0)
    ts = agent.init()

    loaded = load_rlgames_state_dict(args.pth)
    ts, epoch = convert_into_train_state(agent, ts, loaded)
    frames = int(loaded.get("frame", 0) or 0)
    agent.save(args.out, ts, epoch=epoch, frames=frames)
    print(
        f"converted {args.pth} -> {args.out} "
        f"(epoch {epoch}, frames {frames})"
    )


if __name__ == "__main__":
    main()
