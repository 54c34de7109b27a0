#!/usr/bin/env python
"""Learning-curve parity harness (BASELINE.md reward milestones).

Trains the BASELINE.md tasks under the reference's budgets (max_epochs x
horizon x numEnvs from cfg/train/*PPO.yaml) and records, per task:

  * the learning curve (frames, mean finished-episode return) per epoch;
  * frames-to-milestone (first epoch whose rolling mean return crosses
    the milestone below);
  * final mean return + wall-clock + fps.

Milestones are practical trained-policy returns for the reference's
budgets (the cfg `score_to_win: 20000` is a nominal never-hit early-stop;
rl_games curves for these tasks plateau around the values below):
Cartpole ~490 (episode cap 500), BallBalance ~350, Ant ~5000 (33M steps),
Humanoid ~5000 (131M steps).

Writes PARITY.json + regenerates PARITY.md. Select tasks with
PARITY_TASKS=Cartpole,Ant (default: all four); cap epochs with
PARITY_MAX_EPOCHS for smoke runs.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# task -> (reward milestone, env-step budget from the reference cfgs,
#          epoch cap = 3x the reference max_epochs: the rolling
#          last-100-finished-episodes metric lags the policy by up to an
#          episode length, so the run gets headroom while the
#          within-budget check still uses the reference frame budget)
MILESTONES = {
    "Cartpole": (490.0, 100 * 16 * 512, 300),
    "BallBalance": (350.0, 250 * 16 * 4096, 750),
    "Ant": (5000.0, 500 * 16 * 4096, 1500),
    "Humanoid": (5000.0, 1000 * 32 * 4096, 3000),
    # manipulation clearly works: several consecutive in-hand cube
    # reorientation successes (return ~3000 ~= consecutive_successes ~5;
    # the reference's score_to_win 100000 is aspirational and unreached
    # by either implementation). Budget = ShadowHandPPO.yaml max_epochs
    # 5000 x horizon 8 x 16384 envs.
    "ShadowHand": (3000.0, 5000 * 8 * 16384, 5000),
    # velocity-command tracking clearly works (converged ~1555 on this
    # reward scale at the full budget; docs/curves.md)
    "Anymal": (1400.0, 1000 * 24 * 4096, 3000),
    # drawer-opening reward consistently above the grasp-and-pull
    # plateau (converged ~1286 at the full budget)
    "FrankaCabinet": (1000.0, 1500 * 16 * 4096, 4500),
    # sustained flight to the moving target (per-step max 7 at a perfect
    # on-target upright hover, 2000-step episodes; see docs/curves.md)
    "Ingenuity": (3000.0, 500 * 16 * 4096, 1500),
    # stable hover at the z=1 target (per-step max 3, 500-step episodes)
    "Quadcopter": (800.0, 500 * 8 * 8192, 1500),
    # AnymalTerrain: 13-term velocity-tracking reward on procedural
    # terrain with a level curriculum; milestone = the linear+angular
    # tracking terms dominating (docs/curves.md discusses the scale)
    "AnymalTerrain": (18.0, 1500 * 24 * 4096, 4500),
    # HumanoidAMP: the env reward is a constant 1/step (the style
    # reward is substituted by the agent), so the scalar milestone is
    # mean episode LENGTH >= 250 of 300 (balance without early
    # termination), gated ADDITIONALLY on discriminator style reward
    # >= 0.6/step (see _amp_hit). Reference wall-clock anchor: "6
    # minutes on GA100" (docs/rl_examples.md:352); budget =
    # HumanoidAMPPPO.yaml max_epochs.
    "HumanoidAMP": (250.0, 5000 * 16 * 4096, 5000),
}


def _deterministic_eval(agent, env, ts, max_steps):
    """Mean finished-episode return of the deterministic policy over one
    episode-length rollout of all envs (the reference's test=True
    evaluation protocol) -- immune to the rolling-metric lag.

    Uses the agent's _play_step so stateful policies (LSTM) thread
    their carry exactly as in test=True play."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    state, obs = env.reset(jax.random.PRNGKey(12345))
    step = jax.jit(env.step)
    policy = jax.jit(agent._play_step)
    ret = np.zeros(env.num_envs)
    done = jnp.zeros(env.num_envs, bool)
    done_rets = []
    for _ in range(max_steps):
        a, ts = policy(ts, obs, done)
        state, obs, rew, done, ex = step(state, a)
        ret += np.asarray(rew)
        d = np.asarray(done)
        if d.any():
            done_rets += ret[d].tolist()
            ret[d] = 0.0
    import numpy as _np

    return float(_np.mean(done_rets)) if done_rets else float("nan")


def run_task(name: str, max_epochs_cap=None):
    import jax

    from isaacgymenvs_tpu.learn import PPO
    from isaacgymenvs_tpu.tasks import task_map
    from isaacgymenvs_tpu.utils.config import load_config

    cfg = load_config([f"task={name}", "headless=True"])
    env = task_map[name](cfg["task"])
    train_params = cfg["train"]["params"]
    seed = int(os.environ.get("PARITY_SEED", cfg.get("seed", 42)))
    algo = str(train_params.get("algo", {}).get("name", "a2c_continuous"))
    if algo == "amp_continuous":
        # AMP's reward IS the discriminator score -- plain PPO on the
        # env would train on the constant task reward instead
        from isaacgymenvs_tpu.learn import AMPAgent

        agent = AMPAgent(env, train_params, seed=seed)
    elif train_params.get("network", {}).get("rnn"):
        from isaacgymenvs_tpu.learn import PPORecurrent

        agent = PPORecurrent(env, train_params, seed=seed)
    else:
        agent = PPO(env, train_params, seed=seed)
    milestone, budget, epoch_cap = MILESTONES[name]
    if max_epochs_cap is None:
        max_epochs_cap = epoch_cap
    time_budget = float(os.environ.get("PARITY_TIME_BUDGET", "0") or 0)
    curve = []
    evals = []
    hit = {"frames": None, "epoch": None}
    # deterministic eval cadence: 8 checks across the epoch cap, but not
    # before the rolling metric shows life (evals cost one episode)
    eval_every = max(1, max_epochs_cap // 12)
    # a full episode + 1 so every env finishes at least once: capping
    # below the episode length silently halves returns on long-episode
    # tasks (Ingenuity's 2000-step flights scored ~2171 at a 1001-step
    # cap while actually above the milestone)
    eval_steps = env.max_episode_length + 1

    is_amp = algo == "amp_continuous"

    def _amp_hit(metrics):
        # AMP's ENV reward is a constant 1/step (the style reward is
        # substituted inside the agent), so mean_episode_return is the
        # mean episode LENGTH. The honest gate is therefore twofold:
        # near-full episodes (balance without early termination) AND a
        # discriminator style reward >= 0.6/step on policy samples
        # (the character moves like the mocap, not just stands).
        return (
            metrics["mean_episode_return"] >= milestone
            and float(metrics.get("disc_reward_mean", 0.0)) >= 0.6
        )

    def on_epoch(ts, metrics):
        curve.append(
            [int(metrics["frames"]), float(metrics["mean_episode_return"])]
            + ([float(metrics.get("disc_reward_mean", 0.0))] if is_amp
               else [])
        )
        ret = metrics["mean_episode_return"]
        epoch = int(metrics["epoch"])
        if is_amp:
            # raw-reward deterministic eval is meaningless for AMP
            # (constant task reward); gate on the training metrics
            if hit["frames"] is None and _amp_hit(metrics):
                hit["frames"] = int(metrics["frames"])
                hit["epoch"] = epoch
                return True
            return False
        near = ret == ret and ret >= 0.5 * milestone
        if hit["frames"] is None and near and epoch % eval_every == 0:
            ev = _deterministic_eval(agent, env, ts, eval_steps)
            evals.append([int(metrics["frames"]), ev])
            print(f"  eval @ epoch {epoch}: {ev:.1f}", flush=True)
            if ev == ev and ev >= milestone:
                hit["frames"] = int(metrics["frames"])
                hit["epoch"] = epoch
                return True  # milestone reached: stop early
        if _tb0.setdefault("t", time.time()) + time_budget < time.time() \
                and time_budget:
            print("  wall-clock budget exhausted — stopping", flush=True)
            return True
        return False

    _tb0 = {}  # budget clock starts at the first completed epoch
    t0 = time.time()
    ts, last = agent.train(
        max_epochs=max_epochs_cap, on_epoch=on_epoch, log_every=25
    )
    wall = time.time() - t0
    if hit["frames"] is None and not is_amp:  # final deterministic check
        ev = _deterministic_eval(agent, env, ts, eval_steps)
        evals.append([int(last.get("frames", 0)), ev])
        if ev == ev and ev >= milestone:
            hit["frames"] = int(last.get("frames", 0))
            hit["epoch"] = int(last.get("epoch", 0))
    elif hit["frames"] is None and is_amp and _amp_hit(last):
        hit["frames"] = int(last.get("frames", 0))
        hit["epoch"] = int(last.get("epoch", 0))
    return {
        "milestone": milestone,
        "reference_budget_env_steps": budget,
        "frames_to_milestone": hit["frames"],
        "epochs_to_milestone": hit["epoch"],
        "within_reference_budget": (
            hit["frames"] is not None and hit["frames"] <= budget
        ),
        "deterministic_evals": evals,
        "final_mean_return": float(last.get("mean_episode_return", 0.0)),
        "final_frames": int(last.get("frames", 0)),
        "wall_clock_s": round(wall, 1),
        "fps": round(float(last.get("fps", 0.0))),
        "curve": curve[:: max(1, len(curve) // 200)],
    }


# ---------------------------------------------------------------------------
# Round-5 success-keyed parity specs (VERDICT r4 items 1, 4, 7): the
# reference's own acceptance criterion for the contact-rich / dexterous
# tasks is a SUCCESS RATE (docs/rl_examples.md:403 "high success rate",
# :164-175 consecutive successes; docs/factory.md), not a return
# milestone, so these rows key on a deterministic-policy success eval.
#
# eval_mode:
#   end_rate -- fraction of episodes whose `successes` extra is >0.5 at
#               the episode's final step (Factory pick/place/screw,
#               Trifinger pose-goal hold; matches the reference's
#               end-of-episode success checks, e.g.
#               factory_task_nut_bolt_pick.py _check_lift_success /
#               trifinger.py _check_termination).
#   end_mean -- mean of the `successes` extra at episode end = mean
#               consecutive successes per episode (ShadowHand-family
#               printer, shadow_hand.py:426-435).
#   return   -- deterministic-eval mean episode return (SAC recipe rows).
#
# budget = the reference cfg's max_epochs x horizon_length x numEnvs.
SUCCESS_SPECS = {
    "FactoryTaskNutBoltPick": dict(
        overrides=["task=FactoryTaskNutBoltPick"],
        eval_mode="end_rate",
        milestone=0.80,  # "high success rate" docs/rl_examples.md:403
        budget=1024 * 120 * 128,
        epoch_cap=3072,
    ),
    "FactoryTaskNutBoltPlace": dict(
        overrides=["task=FactoryTaskNutBoltPlace"],
        eval_mode="end_rate",
        milestone=0.80,
        budget=1024 * 120 * 128,
        epoch_cap=3072,
    ),
    # Screw trains "almost immediately" (docs/rl_examples.md:403) but a
    # FULL screw within one episode is mechanically unreachable with the
    # task's fixed-closed gripper: total nut rotation is capped by the
    # wrist joint's travel (an IDEAL scripted press-and-rotate manages
    # ~2 rad ≈ 2.1 mm of helix descent; the reference's own 8192-step
    # budget faces the same limit and it publishes no success rate).
    # Parity therefore keys on per-episode helix DESCENT at eval: the
    # policy threads the nut down >= 1.5 mm (0.75 turns, 75% of the
    # scripted-ideal stroke) on average.
    "FactoryTaskNutBoltScrew": dict(
        overrides=["task=FactoryTaskNutBoltScrew"],
        eval_mode="end_mean",
        metric_key="descent",
        milestone=0.0015,
        budget=1024 * 128 * 128,
        epoch_cap=2048,
    ),
    # AllegroHandPPO.yaml: 5000 epochs x 8 x 16384 = 655M. Milestone =
    # mean consecutive in-hand reorientation successes per episode >= 5
    # (the same "manipulation clearly works" bar the ShadowHand row uses,
    # now keyed in the reference's own success units).
    "AllegroHand": dict(
        overrides=["task=AllegroHand"],
        eval_mode="end_mean",
        metric_key="consecutive_successes",
        milestone=5.0,
        budget=5000 * 8 * 16384,
        epoch_cap=15000,
    ),
    # DeXtreme ADR at training scale (VERDICT r4 item 2): the artifact
    # is the env_metrics_curve -- env/adr_nats (range entropy,
    # adr_vec_task.py:767) growing as consecutive successes rise, the
    # reference algorithm's observable signature (docs/rl_examples.md:
    # 466-472). Budget = AllegroHandDextremeADRPPO.yaml max_epochs
    # 5000 x horizon 16 x 8192; milestone matches the AllegroHand bar.
    "AllegroHandADR": dict(
        overrides=["task=AllegroHandDextremeADR"],
        eval_mode="end_mean",
        metric_key="consecutive_successes",
        milestone=5.0,
        budget=5000 * 16 * 8192,
        epoch_cap=15000,
    ),
    # TrifingerPPO.yaml: 20000 epochs x 8 x 16384 = 2.62B frames at
    # difficulty 4 (full-pose goal). Milestone = >=50% of episodes end
    # inside the position+orientation tolerance.
    "Trifinger": dict(
        overrides=["task=Trifinger"],
        eval_mode="end_rate",
        milestone=0.50,
        budget=20000 * 8 * 16384,
        epoch_cap=60000,
    ),
    # SAC recipe evidence (AntSAC.yaml: 20000 epochs x 8 x 4096).
    # Milestone: deterministic-eval return >= 3000 (the policy clearly
    # runs; PPO reaches ~5000, SAC is slower per the rl_games curves).
    "AntSAC": dict(
        overrides=["task=Ant", "train=AntSAC"],
        eval_mode="return",
        milestone=3000.0,
        budget=20000 * 8 * 4096,
        epoch_cap=20000,
    ),
    # FrankaCubeStack: success = the episode-ending stack condition
    # (aligned + on-top + gripper away, franka_cube_stack.py); budget =
    # FrankaCubeStackPPO.yaml 10000 epochs x 32 x 8192.
    "FrankaCubeStack": dict(
        overrides=["task=FrankaCubeStack"],
        eval_mode="end_rate",
        milestone=0.80,
        budget=10000 * 32 * 8192,
        epoch_cap=10000,
    ),
    # IndustReal pegs at a TPU-native env count (VERDICT r4 item 6; the
    # reference's 128 envs is a PhysX constraint, docs/factory.md).
    # Budget = the reference's FRAME budget (8192 epochs x 128 steps x
    # 128 envs = 134M) spent at 1024 envs. The run doubles as the SBC
    # artifact: env_metrics_curve records curr_max_disp descending and
    # engagement/success rising (industreal_algo_utils.py:284-344).
    "IndustRealTaskPegsInsert": dict(
        overrides=["task=IndustRealTaskPegsInsert", "num_envs=1024"],
        eval_mode="end_rate",
        milestone=0.50,
        budget=8192 * 128 * 128,
        epoch_cap=2048,
    ),
    # AllegroKukaTwoArms: the last task family with zero learning
    # evidence (VERDICT r4). Keyed on consecutive successes (staged
    # keypoint task, allegro_kuka_two_arms.py); milestone = the first
    # reliable successes appearing at deterministic eval (>= 0.5 mean)
    # -- evidence of the staged reward working end-to-end, not full
    # convergence (the reference trains this for ~1.3B frames).
    "AllegroKukaTwoArmsReorientation": dict(
        overrides=["task=AllegroKukaTwoArmsReorientation"],
        eval_mode="end_mean",
        milestone=0.5,
        budget=5000 * 8 * 8192,
        epoch_cap=4000,
    ),
    # Recurrent + asymmetric-critic recipe evidence
    # (ShadowHandPPOAsymmLSTM.yaml: 10000 epochs x 16 x 16384 = 2.62B).
    # Milestone in consecutive successes, matching the AllegroHand row.
    "ShadowHandLSTM": dict(
        overrides=["task=ShadowHand", "train=ShadowHandPPOAsymmLSTM"],
        eval_mode="end_mean",
        metric_key="consecutive_successes",
        milestone=5.0,
        budget=10000 * 16 * 16384,
        epoch_cap=30000,
    ),
}


def _eval_success(agent, env, ts, mode: str, max_steps: int,
                  metric_key: str = "successes"):
    """Deterministic-policy success eval: one episode-length rollout of
    all envs; per-episode value read from extras[metric_key] at each
    env's done step (the reference's test=True success printers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    state, obs = env.reset(jax.random.PRNGKey(12345))
    step = jax.jit(env.step)
    if hasattr(agent, "_play_step"):
        policy = jax.jit(agent._play_step)
    else:  # SAC: stateless deterministic act()
        act = jax.jit(agent.act)
        policy = lambda ts, obs, done: (act(ts, obs), ts)
    n = env.num_envs
    done = jnp.zeros(n, bool)
    end_vals = []
    ret = np.zeros(n)
    done_rets = []
    for _ in range(max_steps):
        a, ts = policy(ts, obs, done)
        state, obs, rew, done, extras = step(state, a)
        ret += np.asarray(rew)
        d = np.asarray(done)
        if d.any():
            done_rets += ret[d].tolist()
            ret[d] = 0.0
            if metric_key in extras:
                sv = np.asarray(extras[metric_key])
                if sv.ndim == 1 and sv.shape[0] == n:
                    end_vals += sv[d].tolist()
    if mode == "return":
        return float(np.mean(done_rets)) if done_rets else float("nan")
    if not end_vals:
        return float("nan")
    if mode == "end_mean":
        return float(np.mean(end_vals))
    return float(np.mean([v > 0.5 for v in end_vals]))  # end_rate


def run_success_task(key: str, max_epochs_cap=None):
    import jax

    from isaacgymenvs_tpu.learn import PPO
    from isaacgymenvs_tpu.tasks import task_map
    from isaacgymenvs_tpu.utils.config import load_config

    spec = SUCCESS_SPECS[key]
    extra = [o for o in os.environ.get("PARITY_OVERRIDES", "").split() if o]
    cfg = load_config(list(spec["overrides"]) + extra + ["headless=True"])
    env = task_map[cfg["task_name"]](cfg["task"])
    train_params = cfg["train"]["params"]
    seed = int(os.environ.get("PARITY_SEED", cfg.get("seed", 42)))
    algo = str(train_params.get("algo", {}).get("name", "a2c_continuous"))
    if algo == "sac":
        from isaacgymenvs_tpu.learn import SAC

        agent = SAC(env, train_params, seed=seed)
    elif train_params.get("network", {}).get("rnn"):
        from isaacgymenvs_tpu.learn import PPORecurrent

        agent = PPORecurrent(env, train_params, seed=seed)
    else:
        agent = PPO(env, train_params, seed=seed)
    milestone = spec["milestone"]
    mode = spec["eval_mode"]
    metric_key = spec.get("metric_key", "successes")
    cap = max_epochs_cap or spec["epoch_cap"]
    # optional wall-clock cap (seconds): stop training when exceeded but
    # still run the final deterministic eval and write the row/curve —
    # lets a fixed-length session queue many runs without losing the
    # partial evidence of the ones that don't finish
    time_budget = float(os.environ.get("PARITY_TIME_BUDGET", "0") or 0)
    eval_every = max(1, cap // 16)
    eval_steps = env.max_episode_length + 1
    curve, evals = [], []
    env_curve = []  # per-epoch [frames, {env/<k>: v}] (SBC state, success
    # rates, ADR nats... whatever the task exposes as extras)
    hit = {"frames": None, "epoch": None}

    def on_epoch(ts, metrics):
        row = [int(metrics["frames"]), float(metrics["mean_episode_return"])]
        sk = next(
            (k for k in ("env/successes", "env/consecutive_successes")
             if k in metrics),
            None,
        )
        if sk is not None:
            row.append(float(metrics[sk]))
        curve.append(row)
        env_curve.append(
            [int(metrics["frames"])]
            + [
                {
                    k[4:]: float(v)
                    for k, v in metrics.items()
                    if k.startswith("env/")
                }
            ]
        )
        epoch = int(metrics["epoch"])
        if epoch % eval_every == 0:
            ev = _eval_success(agent, env, ts, mode, eval_steps,
                               metric_key)
            evals.append([int(metrics["frames"]), ev])
            print(f"  success-eval @ epoch {epoch}: {ev:.3f}", flush=True)
            try:  # stall-resilient: keep a checkpoint at every eval (a
                # wedged TPU tunnel + timeout otherwise loses the run's
                # policy along with the end-of-run save)
                if algo != "sac":
                    agent.save(
                        f"runs/r5/{key}.ckpt", ts, epoch=epoch,
                        frames=int(metrics["frames"]),
                    )
            except Exception:
                pass
            if ev == ev and ev >= milestone:
                hit["frames"] = int(metrics["frames"])
                hit["epoch"] = epoch
                return True
        if _tb0.setdefault("t", time.time()) + time_budget < time.time() \
                and time_budget:
            print("  wall-clock budget exhausted — stopping", flush=True)
            return True
        return False

    _tb0 = {}  # budget clock starts at the first completed epoch
    t0 = time.time()
    ts, last = agent.train(max_epochs=cap, on_epoch=on_epoch, log_every=25)
    wall = time.time() - t0
    try:  # keep the trained policy for post-hoc behavior analysis
        os.makedirs("runs/r5", exist_ok=True)
        if algo == "sac":
            agent.save(f"runs/r5/{key}.ckpt", ts)
        else:
            agent.save(
                f"runs/r5/{key}.ckpt",
                ts,
                epoch=int(last.get("epoch", 0)),
                frames=int(last.get("frames", 0)),
            )
    except Exception as e:
        print(f"  checkpoint save failed: {e}")
    if hit["frames"] is None:
        ev = _eval_success(agent, env, ts, mode, eval_steps, metric_key)
        evals.append([int(last.get("frames", 0)), ev])
        print(f"  success-eval final: {ev:.3f}", flush=True)
        if ev == ev and ev >= milestone:
            hit["frames"] = int(last.get("frames", 0))
            hit["epoch"] = int(last.get("epoch", 0))
    return {
        "metric": mode,
        "milestone": milestone,
        "reference_budget_env_steps": spec["budget"],
        "frames_to_milestone": hit["frames"],
        "epochs_to_milestone": hit["epoch"],
        "within_reference_budget": (
            hit["frames"] is not None and hit["frames"] <= spec["budget"]
        ),
        "success_evals": evals,
        "final_mean_return": float(last.get("mean_episode_return", 0.0)),
        "final_success_eval": evals[-1][1] if evals else None,
        "final_frames": int(last.get("frames", 0)),
        "wall_clock_s": round(wall, 1),
        "fps": round(float(last.get("fps", 0.0))),
        "curve": curve[:: max(1, len(curve) // 200)],
        "env_metrics_curve": env_curve[:: max(1, len(env_curve) // 200)],
    }


def main():
    if os.environ.get("PARITY_FORCE_CPU"):
        # the axon sitecustomize registers the TPU platform at interpreter
        # start and ignores JAX_PLATFORMS; this is the working override
        import jax

        jax.config.update("jax_platforms", "cpu")
    sel = os.environ.get("PARITY_TASKS", ",".join(MILESTONES))
    cap = os.environ.get("PARITY_MAX_EPOCHS")
    cap = int(cap) if cap else None
    results = {}
    path = "PARITY.json"
    if os.path.exists(path):
        results = json.load(open(path))
    seed_env = os.environ.get("PARITY_SEED")
    for name in sel.split(","):
        name = name.strip()
        if not name:
            continue
        key = f"{name}_s{seed_env}" if seed_env else name
        print(f"=== parity: {key} ===", flush=True)
        try:
            if name in SUCCESS_SPECS:
                results[key] = run_success_task(name, cap)
            else:
                results[key] = run_task(name, cap)
        except Exception as e:
            results[key] = {"error": f"{type(e).__name__}: {e}"}
        json.dump(results, open(path, "w"), indent=1)

    write_md(results)


def write_md(results):
    # regenerate the human-readable table
    lines = [
        "# PARITY — learning-curve milestones vs the reference budgets",
        "",
        "Produced by `python parity.py` (see its docstring for milestone",
        "rationale). `within_reference_budget` = reached the milestone in",
        "no more env steps than the reference's max_epochs x horizon x",
        "numEnvs budget for the same task.",
        "",
        "Success-keyed rows (`metric` end_rate / end_mean) follow the",
        "reference's own acceptance criterion — end-of-episode success",
        "rate / mean consecutive successes under a deterministic-policy",
        "eval — instead of a return milestone (see SUCCESS_SPECS).",
        "The legacy return-keyed ShadowHand row's milestone 3000",
        "corresponds to ~5 consecutive in-hand successes on this reward",
        "scale (docs/curves.md sh_long_curve); the AllegroHand and",
        "ShadowHandLSTM rows key on consecutive successes directly.",
        "Seed-suffixed rows (_sN) are independent seeds of the same",
        "task; FactoryTaskNutBoltScrew keys on per-episode helix",
        "descent (metres) — see SUCCESS_SPECS for why full-screw is",
        "out of reach for BOTH implementations.",
        "",
        "| task | metric | milestone | frames to milestone | reference budget | within budget | final return | best/final success | fps |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        if "error" in r:
            lines.append(f"| {name} | — | — | error: {r['error']} | | | | | |")
            continue
        fs = r.get("final_success_eval")
        evs = [v for _, v in r.get("success_evals", []) if v == v]
        best = max(evs) if evs else None
        if best is not None and fs is not None:
            succ = f"{best:.3f} / {fs:.3f}"
        elif fs is not None:
            succ = f"{fs:.3f}"
        else:
            succ = ""
        lines.append(
            f"| {name} | {r.get('metric', 'return')} | {r['milestone']} | "
            f"{r['frames_to_milestone']} | "
            f"{r['reference_budget_env_steps']} | {r['within_reference_budget']} | "
            f"{r['final_mean_return']:.1f} | "
            f"{succ} | {r['fps']} |"
        )
    open("PARITY.md", "w").write("\n".join(lines) + "\n")
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "curve"}
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
