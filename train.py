#!/usr/bin/env python
"""Train / play entry point.

CLI parity with the reference's Hydra launcher (reference train.py:71-219;
flag set documented in reference README.md:116-132):

    python train.py task=Ant num_envs=4096 seed=7
    python train.py task=Cartpole test=True checkpoint=runs/Cartpole/nn/Cartpole.ckpt
    python train.py task=Ant max_iterations=500 experiment=MyAnt pipeline=cpu

Any config leaf can be overridden with dotted paths, e.g.
`train.params.config.minibatch_size=16384` or `task.env.episodeLength=600`.
"""
from __future__ import annotations

import os
import random
import sys

# make the package importable when run from a checkout
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config(argv)

    import jax

    if str(cfg.get("pipeline", "gpu")) == "cpu" or str(cfg.get("sim_device", "")).startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    # multi-host bootstrap (reference: torchrun + multi_gpu=True,
    # README.md:165-172) -- must run before the first device query
    from isaacgymenvs_tpu.parallel import distributed as dist

    multi_proc = dist.maybe_initialize(require=bool(cfg.get("multi_gpu")))

    # NaN-guard mode (SURVEY 5.2 plan; the reference's closest analogue
    # is torch_deterministic): every jitted call re-checks for NaNs and
    # raises at the producing primitive. Debug-only -- disables some
    # fusion, so keep it off for benchmarking.
    if cfg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)

    seed = int(cfg.get("seed", 42) or 42)
    if seed == -1:  # seed=-1 -> random seed (reference utils/utils.py:87-95)
        seed = random.randint(0, 2**31 - 1)
        print(f"seed=-1 -> sampled seed {seed}")

    from isaacgymenvs_tpu.tasks import task_map
    from isaacgymenvs_tpu.learn import PPO

    task_name = cfg["task_name"]
    if task_name not in task_map:
        # variant configs alias an implemented class via their name: field
        # (e.g. task=AllegroHandFF -> name: AllegroHand)
        yaml_name = (cfg.get("task") or {}).get("name")
        if yaml_name in task_map:
            task_name = yaml_name
    if task_name not in task_map:
        raise SystemExit(
            f"unknown task {task_name!r}; available: {sorted(task_map)}"
        )
    env = task_map[task_name](cfg["task"])
    if dist.is_main_process():
        print(
            f"task={task_name} num_envs={env.num_envs} num_obs={env.num_obs} "
            f"num_acts={env.num_acts} backend={jax.default_backend()} "
            f"devices={len(jax.devices())} processes={jax.process_count()}"
        )

    # env-axis sharding over every global device (multi-chip and/or
    # multi-host); a 1-device mesh adds nothing, skip it
    mesh = None
    if (multi_proc or cfg.get("multi_gpu") or len(jax.devices()) > 1) and len(
        jax.devices()
    ) > 1:
        from isaacgymenvs_tpu.parallel import make_mesh

        if env.num_envs % len(jax.devices()) == 0:
            mesh = make_mesh()
        elif dist.is_main_process():
            print(
                f"num_envs={env.num_envs} not divisible by "
                f"{len(jax.devices())} devices; running unsharded"
            )

    train_params = cfg.get("train", {}).get("params", {})
    algo = str(train_params.get("algo", {}).get("name", "a2c_continuous"))
    if algo == "sac":
        from isaacgymenvs_tpu.learn import SAC

        agent = SAC(env, train_params, seed=seed)
    elif algo == "amp_continuous":
        from isaacgymenvs_tpu.learn import AMPAgent

        agent = AMPAgent(env, train_params, seed=seed)
    elif algo == "hrl_continuous":
        from isaacgymenvs_tpu.learn import HRL

        agent = HRL(env, train_params, seed=seed)
    elif train_params.get("network", {}).get("rnn"):
        from isaacgymenvs_tpu.learn import PPORecurrent

        agent = PPORecurrent(env, train_params, seed=seed)
    else:
        agent = PPO(env, train_params, seed=seed)

    run_name = train_params.get("config", {}).get("name") or task_name
    checkpoint = str(cfg.get("checkpoint") or "") or None

    sigma = cfg.get("sigma")
    if sigma not in (None, "",) and hasattr(agent, "override_sigma"):
        # reference train.py:214: fixed exploration-sigma override,
        # applied both to fresh inits and AFTER checkpoint restore
        _orig_init = agent.init
        _orig_restore = agent.restore

        def _init_with_sigma():
            return agent.override_sigma(_orig_init(), float(sigma))

        def _restore_with_sigma(path, ts):
            ts2, epoch = _orig_restore(path, ts)
            return agent.override_sigma(ts2, float(sigma)), epoch

        agent.init = _init_with_sigma
        agent.restore = _restore_with_sigma

    if cfg.get("test"):
        if not hasattr(agent, "play"):
            raise SystemExit(f"test mode not supported for algo {algo!r}")
        agent.play(checkpoint=checkpoint)
        return

    # config snapshot (reference train.py:202-208); rank-0 only
    if dist.is_main_process():
        import yaml

        run_dir = os.path.join("runs", run_name)
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg, f, default_flow_style=False, sort_keys=False)

    max_iters = cfg.get("max_iterations")
    save_best_after = int(
        train_params.get("config", {}).get("save_best_after", 100)
    )
    from isaacgymenvs_tpu.utils.loggers import build_logger

    # rank-0-only logging (reference train.py:178-183 wandb gating)
    logger = build_logger(cfg, run_name) if dist.is_main_process() else None

    pbt_cfg = cfg.get("pbt") or {}
    if pbt_cfg.get("enabled") and algo not in ("sac",):
        from isaacgymenvs_tpu.utils.pbt_loop import run_pbt_training

        run_pbt_training(
            cfg, env, train_params, seed, run_name, logger, pbt_cfg
        )
        if logger is not None:
            logger.close()
        return
    # device-level tracing (SURVEY 5.1 plan: jax.profiler traces; the
    # reference only has fps counters). profile=<dir> captures the first
    # profile_epochs training epochs into a TensorBoard-viewable trace.
    profile_dir = str(cfg.get("profile") or "") or None
    prof_state = {"on": False, "left": int(cfg.get("profile_epochs", 3))}
    if profile_dir and dist.is_main_process():
        jax.profiler.start_trace(profile_dir)
        prof_state["on"] = True
        print(f"[profile] tracing first {prof_state['left']} epochs "
              f"-> {profile_dir}")

    def _wrap_profile(inner):
        def hook(ts, metrics):
            if prof_state["on"]:
                prof_state["left"] -= 1
                if prof_state["left"] <= 0:
                    jax.profiler.stop_trace()
                    prof_state["on"] = False
                    print(f"[profile] trace written to {profile_dir}")
            return inner(ts, metrics) if inner else False

        return hook

    try:
        if algo == "sac":
            agent.train(
                max_epochs=int(max_iters) if max_iters else None,
                checkpoint=checkpoint,
                train_dir="runs",
                name=run_name,
                logger=logger,
                on_epoch=_wrap_profile(None) if prof_state["on"] else None,
            )
        else:
            on_epoch = None
            if cfg.get("capture_video") and dist.is_main_process():
                # headless video capture (reference train.py:132-144
                # RecordVideo): every capture_video_freq epochs record
                # capture_video_len frames of env 0 with the deterministic
                # policy and render them to PNGs via utils.replay
                freq = int(cfg.get("capture_video_freq", 1464))
                length = int(cfg.get("capture_video_len", 100))

                def on_epoch(ts, metrics, _env=env, _agent=agent):
                    import jax as _jax
                    import jax.numpy as _jnp

                    epoch = int(metrics["epoch"])
                    if epoch % freq:
                        return False
                    from isaacgymenvs_tpu.utils.replay import (
                        FrameRecorder,
                        render_replay,
                    )

                    rec = FrameRecorder(_env, env_idx=0)
                    st, ob = _env.reset(_jax.random.PRNGKey(epoch))
                    for _ in range(length):
                        st, ob, *_rest = _env.step(st, _agent.act(ts, ob))
                        rec.add(st)
                    vdir = os.path.join(
                        "runs", run_name, "videos", f"epoch_{epoch}"
                    )
                    render_replay(rec.save(vdir + ".npz"), vdir, stride=2)
                    print(f"[video] wrote {vdir}")
                    return False

            if prof_state["on"]:
                on_epoch = _wrap_profile(on_epoch)
            agent.train(
                max_epochs=int(max_iters) if max_iters else None,
                checkpoint=checkpoint,
                train_dir="runs",
                name=run_name,
                save_best_after=save_best_after,
                logger=logger,
                mesh=mesh,
                on_epoch=on_epoch,
            )
    finally:
        if prof_state["on"]:
            jax.profiler.stop_trace()
            prof_state["on"] = False
        if logger is not None:
            logger.close()


if __name__ == "__main__":
    main()
