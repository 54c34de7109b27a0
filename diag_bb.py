#!/usr/bin/env python
"""BallBalance plateau diagnostic: train at the reference budget scale,
then trace a deterministic rollout per-step to see where return is lost
(transient vs steady-state distance vs speed jitter vs drops)."""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from isaacgymenvs_tpu.learn import PPO
    from isaacgymenvs_tpu.tasks import task_map
    from isaacgymenvs_tpu.utils.config import load_config

    epochs = int(os.environ.get("BB_EPOCHS", "400"))
    cfg = load_config(["task=BallBalance", "headless=True"])
    env = task_map["BallBalance"](cfg["task"])
    agent = PPO(env, cfg["train"]["params"], seed=42)
    t0 = time.time()
    ts, last = agent.train(max_epochs=epochs, log_every=50)
    print(f"trained {epochs} epochs in {time.time()-t0:.0f}s "
          f"final rolling return {last.get('mean_episode_return'):.1f}")

    with open("/tmp/bb_ts.pkl", "wb") as f:
        pickle.dump(jax.device_get(ts.params), f)

    # deterministic rollout trace
    state, obs = env.reset(jax.random.PRNGKey(7))
    step = jax.jit(env.step)
    act = jax.jit(agent.act)
    T = env.max_episode_length + 1
    N = env.num_envs
    dists = np.zeros((T, N), np.float32)
    speeds = np.zeros((T, N), np.float32)
    rews = np.zeros((T, N), np.float32)
    dones = np.zeros((T, N), bool)
    m = env.model
    bq = env.ball_q
    bv = m.v_adr[env.ball_body]
    tq = m.q_adr[env.tray_body]
    radial = np.zeros((T, N), np.float32)
    zerr = np.zeros((T, N), np.float32)
    trayz = np.zeros((T, N), np.float32)
    wspin = np.zeros((T, N), np.float32)
    for t in range(T):
        state, obs, rew, done, ex = step(state, act(ts, obs))
        q = np.asarray(state.sim.q)   # (N, nq)
        qd = np.asarray(state.sim.qd)
        bp = q[:, bq:bq + 3]
        dists[t] = np.sqrt(bp[:, 0] ** 2 + bp[:, 1] ** 2 + (bp[:, 2] - 0.7) ** 2)
        radial[t] = np.hypot(bp[:, 0], bp[:, 1])
        zerr[t] = bp[:, 2] - 0.7
        trayz[t] = q[:, tq + 2]
        wspin[t] = np.linalg.norm(qd[:, bv + 3:bv + 6], axis=-1)
        speeds[t] = np.linalg.norm(qd[:, bv:bv + 3], axis=-1)
        rews[t] = np.asarray(rew)
        dones[t] = np.asarray(done)

    # first-episode stats (before any env resets)
    first_done = np.argmax(dones, axis=0)  # step at which each env first ends
    full = first_done == T - 2  # pylint: disable=unused-variable
    ep_len = np.where(dones.any(axis=0), first_done + 1, T)
    drop = ep_len < env.max_episode_length - 1
    print(f"drop rate (first episode): {drop.mean():.3f}  "
          f"mean ep len {ep_len.mean():.0f}")
    ret0 = np.array([rews[:ep_len[i], i].sum() for i in range(N)])
    print(f"first-episode deterministic return: mean {ret0.mean():.1f} "
          f"p10 {np.percentile(ret0,10):.1f} p90 {np.percentile(ret0,90):.1f}")
    ok = ~drop
    for t0_, t1 in [(0, 50), (50, 150), (150, 300), (300, 499)]:
        d = dists[t0_:t1, ok].mean()
        s = speeds[t0_:t1, ok].mean()
        r = rews[t0_:t1, ok].mean()
        print(f"steps {t0_:3d}-{t1:3d}: dist {d:.3f} "
              f"(radial {radial[t0_:t1, ok].mean():.3f} "
              f"zerr {zerr[t0_:t1, ok].mean():+.3f}) "
              f"speed {s:.3f} spin {wspin[t0_:t1, ok].mean():.2f} "
              f"trayz {trayz[t0_:t1, ok].mean():.3f} rew/step {r:.3f}")
    # a couple of per-env tails: is the ball circling or parked?
    for i in np.flatnonzero(ok)[:3]:
        print(f"env {i}: radial[-5:] {np.round(radial[-6:-1, i], 3)} "
              f"zerr[-5:] {np.round(zerr[-6:-1, i], 3)} "
              f"speed[-5:] {np.round(speeds[-6:-1, i], 3)}")
    # loss budget: what would return be with steady-state behavior from t=0
    ss_rew = rews[300:499, ok].mean()
    print(f"steady-state rew/step {ss_rew:.3f} -> perfect-transient return "
          f"{ss_rew*500:.0f}; transient loss "
          f"{ss_rew*500 - ret0[ok].mean():.1f}")


if __name__ == "__main__":
    main()
