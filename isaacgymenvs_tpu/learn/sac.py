"""Soft Actor-Critic, in-repo (replaces rl_games' sac agent).

Config schema mirrors the reference's SAC yaml (cfg/train/AntSAC.yaml:
twin Q critics with targets (critic_tau polyak), tanh-squashed Gaussian
actor with log_std_bounds, learnable temperature alpha (init_alpha /
alpha_lr / learnable_temperature), per-epoch `num_steps_per_episode` env
steps with one gradient update per step, replay ring buffer, obs
normalization). The entire epoch (env steps + updates) is one jitted
function like the PPO trainer.
"""
from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..envcore.vec_task import EnvState, VecTask
from .networks import MLP
from .replay_buffer import ReplayBuffer, buffer_add_batch, buffer_sample
from .running_stats import RunningMeanStd, rms_normalize, rms_update


class SACConfig(NamedTuple):
    gamma: float = 0.99
    init_alpha: float = 1.0
    alpha_lr: float = 0.005
    actor_lr: float = 5e-4
    critic_lr: float = 5e-4
    critic_tau: float = 0.005
    batch_size: int = 4096
    learnable_temperature: bool = True
    num_seed_steps: int = 5
    num_warmup_steps: int = 10
    num_steps_per_episode: int = 8
    replay_buffer_size: int = 1_000_000
    normalize_input: bool = True
    reward_scale: float = 1.0
    max_epochs: int = 20000
    save_frequency: int = 0
    score_to_win: float = 1e9

    @classmethod
    def from_train_cfg(cls, params: Dict[str, Any]) -> "SACConfig":
        c = params.get("config", params)
        shaper = c.get("reward_shaper", {})
        return cls(
            gamma=float(c.get("gamma", 0.99)),
            init_alpha=float(c.get("init_alpha", 1.0)),
            alpha_lr=float(c.get("alpha_lr", 0.005)),
            actor_lr=float(c.get("actor_lr", 5e-4)),
            critic_lr=float(c.get("critic_lr", 5e-4)),
            critic_tau=float(c.get("critic_tau", 0.005)),
            batch_size=int(c.get("batch_size", 4096)),
            learnable_temperature=bool(c.get("learnable_temperature", True)),
            num_seed_steps=int(c.get("num_seed_steps", 5)),
            num_warmup_steps=int(c.get("num_warmup_steps", 10)),
            num_steps_per_episode=int(c.get("num_steps_per_episode", 8)),
            replay_buffer_size=int(c.get("replay_buffer_size", 1_000_000)),
            normalize_input=bool(c.get("normalize_input", True)),
            reward_scale=float(shaper.get("scale_value", 1.0)),
            max_epochs=int(c.get("max_epochs", 20000)),
            save_frequency=int(c.get("save_frequency", 0)),
            score_to_win=float(c.get("score_to_win", 1e9)),
        )


class SquashedGaussianActor(nn.Module):
    num_actions: int
    units: Sequence[int] = (512, 256)
    act: str = "relu"
    log_std_bounds: Tuple[float, float] = (-5.0, 2.0)

    @nn.compact
    def __call__(self, obs):
        x = MLP(self.units, self.act, name="trunk")(obs)
        mu = nn.Dense(self.num_actions, name="mu")(x)
        log_std = nn.Dense(self.num_actions, name="log_std")(x)
        lo, hi = self.log_std_bounds
        # soft-clamped log-std (rl_games SquashedNormal parameterization)
        log_std = lo + 0.5 * (hi - lo) * (jnp.tanh(log_std) + 1.0)
        return mu, log_std


class TwinQ(nn.Module):
    units: Sequence[int] = (512, 256)
    act: str = "relu"

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        q1 = nn.Dense(1, name="q1_out")(MLP(self.units, self.act, name="q1")(x))
        q2 = nn.Dense(1, name="q2_out")(MLP(self.units, self.act, name="q2")(x))
        return q1[..., 0], q2[..., 0]


def _squashed_sample(key, mu, log_std):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    a = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * eps**2 - log_std - 0.5 * jnp.log(2.0 * jnp.pi)
        - jnp.log(jnp.maximum(1.0 - a**2, 1e-6)),
        axis=-1,
    )
    return a, logp


@struct.dataclass
class SACTrainState:
    actor_params: Any
    critic_params: Any
    target_params: Any
    log_alpha: jax.Array
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    obs_rms: RunningMeanStd
    buffer: ReplayBuffer
    env_state: EnvState
    obs: jax.Array
    key: jax.Array
    ep_return: jax.Array
    ep_len: jax.Array
    total_steps: jax.Array  # () env steps so far (seed/warmup gating)


class SAC:
    """SAC trainer bound to a VecTask env."""

    def __init__(self, env: VecTask, train_params: Dict[str, Any], seed: int = 0):
        self.env = env
        self.cfg = SACConfig.from_train_cfg(train_params)
        net = train_params.get("network", {})
        mlp = net.get("mlp", {})
        bounds = net.get("log_std_bounds", [-5, 2])
        units = tuple(mlp.get("units", (512, 256)))
        act = str(mlp.get("activation", "relu"))
        self.actor = SquashedGaussianActor(
            num_actions=env.num_acts, units=units, act=act,
            log_std_bounds=(float(bounds[0]), float(bounds[1])),
        )
        self.critic = TwinQ(units=units, act=act)
        self.seed = seed
        self.target_entropy = -float(env.num_acts)
        self.actor_tx = optax.adam(self.cfg.actor_lr)
        self.critic_tx = optax.adam(self.cfg.critic_lr)
        self.alpha_tx = optax.adam(self.cfg.alpha_lr)
        self._train_epoch = jax.jit(self.train_epoch)

    def init(self) -> SACTrainState:
        key = jax.random.PRNGKey(self.seed)
        key, ka, kc, kenv = jax.random.split(key, 4)
        env_state, obs = self.env.reset(kenv)
        dummy_obs = obs[:1]
        dummy_act = jnp.zeros((1, self.env.num_acts))
        actor_params = self.actor.init(ka, dummy_obs)
        critic_params = self.critic.init(kc, dummy_obs, dummy_act)
        n = self.env.num_envs
        no, na = self.env.num_obs, self.env.num_acts
        cap = min(self.cfg.replay_buffer_size, 4_000_000 // max(no, 1) * 256)
        cap = max(cap, n * 4)
        buf = ReplayBuffer.create(
            cap,
            {
                "obs": (no,), "action": (na,), "reward": (),
                "next_obs": (no,), "done": (),
            },
        )
        return SACTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_params=jax.tree.map(jnp.copy, critic_params),
            log_alpha=jnp.log(jnp.asarray(self.cfg.init_alpha)),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            alpha_opt=self.alpha_tx.init(jnp.zeros(())),
            obs_rms=RunningMeanStd.create((no,)),
            buffer=buf,
            env_state=env_state,
            obs=obs,
            key=key,
            ep_return=jnp.zeros(n),
            ep_len=jnp.zeros(n, jnp.int32),
            total_steps=jnp.zeros((), jnp.int32),
        )

    def _norm(self, rms, obs):
        return rms_normalize(rms, obs) if self.cfg.normalize_input else obs

    # ------------------------------------------------------------------
    def _update(self, ts: SACTrainState, key):
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        batch = buffer_sample(ts.buffer, k1, cfg.batch_size)
        nobs = self._norm(ts.obs_rms, batch["obs"])
        nnext = self._norm(ts.obs_rms, batch["next_obs"])
        alpha = jnp.exp(ts.log_alpha)

        # critic update
        mu_n, ls_n = self.actor.apply(ts.actor_params, nnext)
        a_next, logp_next = _squashed_sample(k2, mu_n, ls_n)
        q1_t, q2_t = self.critic.apply(ts.target_params, nnext, a_next)
        target_v = jnp.minimum(q1_t, q2_t) - alpha * logp_next
        target_q = batch["reward"] + cfg.gamma * (1.0 - batch["done"]) * target_v
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss(cp):
            q1, q2 = self.critic.apply(cp, nobs, batch["action"])
            return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2)

        closs, cgrad = jax.value_and_grad(critic_loss)(ts.critic_params)
        cup, copt = self.critic_tx.update(cgrad, ts.critic_opt)
        critic_params = optax.apply_updates(ts.critic_params, cup)

        # actor update
        def actor_loss(ap):
            mu, ls = self.actor.apply(ap, nobs)
            a, logp = _squashed_sample(k3, mu, ls)
            q1, q2 = self.critic.apply(critic_params, nobs, a)
            q = jnp.minimum(q1, q2)
            return jnp.mean(alpha * logp - q), logp

        (aloss, logp), agrad = jax.value_and_grad(actor_loss, has_aux=True)(
            ts.actor_params
        )
        aup, aopt = self.actor_tx.update(agrad, ts.actor_opt)
        actor_params = optax.apply_updates(ts.actor_params, aup)

        # temperature update
        log_alpha = ts.log_alpha
        alpha_opt = ts.alpha_opt
        if cfg.learnable_temperature:
            def alpha_loss(la):
                return jnp.mean(
                    jnp.exp(la) * jax.lax.stop_gradient(-logp - self.target_entropy)
                )

            _, lgrad = jax.value_and_grad(alpha_loss)(log_alpha)
            lup, alpha_opt = self.alpha_tx.update(lgrad, alpha_opt)
            log_alpha = optax.apply_updates(log_alpha, lup)

        target_params = jax.tree.map(
            lambda t, c: (1.0 - cfg.critic_tau) * t + cfg.critic_tau * c,
            ts.target_params,
            critic_params,
        )
        ts = ts.replace(
            actor_params=actor_params,
            critic_params=critic_params,
            target_params=target_params,
            log_alpha=log_alpha,
            actor_opt=aopt,
            critic_opt=copt,
            alpha_opt=alpha_opt,
        )
        return ts, {"c_loss": closs, "a_loss": aloss, "alpha": alpha}

    # ------------------------------------------------------------------
    def train_epoch(self, ts: SACTrainState):
        cfg = self.cfg
        n = self.env.num_envs

        def step_fn(ts: SACTrainState, _):
            key, kact, kupd = jax.random.split(ts.key, 3)
            obs_rms = ts.obs_rms
            if cfg.normalize_input:
                obs_rms = rms_update(obs_rms, ts.obs)
            nobs = self._norm(obs_rms, ts.obs)
            mu, ls = self.actor.apply(ts.actor_params, nobs)
            a_rand = jax.random.uniform(
                kact, (n, self.env.num_acts), minval=-1.0, maxval=1.0
            )
            a_pol, _ = _squashed_sample(kact, mu, ls)
            seeding = ts.total_steps < cfg.num_seed_steps
            action = jnp.where(seeding, a_rand, a_pol)
            env_state, next_obs, reward, done, extras = self.env.step(
                ts.env_state, action
            )
            shaped = reward * cfg.reward_scale
            # timeouts should not be treated as terminal for bootstrapping
            not_terminal_done = done & ~extras["time_outs"]
            buf = buffer_add_batch(
                ts.buffer,
                {
                    "obs": ts.obs,
                    "action": action,
                    "reward": shaped,
                    "next_obs": next_obs,
                    "done": not_terminal_done.astype(jnp.float32),
                },
            )
            ep_ret = ts.ep_return + reward
            ep_len = ts.ep_len + 1
            env_metrics = {
                k: jnp.mean(v.astype(jnp.float32))
                for k, v in extras.items()
                if k not in ("states", "time_outs")
                and hasattr(v, "ndim")
                and v.ndim == 1
            }
            out = (
                jnp.sum(jnp.where(done, ep_ret, 0.0)),
                jnp.sum(jnp.where(done, ep_len, 0)),
                jnp.sum(done),
                env_metrics,
            )
            ts = ts.replace(
                env_state=env_state,
                obs=next_obs,
                obs_rms=obs_rms,
                buffer=buf,
                key=key,
                ep_return=jnp.where(done, 0.0, ep_ret),
                ep_len=jnp.where(done, 0, ep_len),
                total_steps=ts.total_steps + 1,
            )
            # one gradient update per env step, after warmup
            def do_update(ts):
                return self._update(ts, kupd)

            def no_update(ts):
                return ts, {
                    "c_loss": jnp.zeros(()), "a_loss": jnp.zeros(()),
                    "alpha": jnp.exp(ts.log_alpha),
                }

            ts, losses = jax.lax.cond(
                ts.total_steps > cfg.num_warmup_steps, do_update, no_update, ts
            )
            return ts, (out, losses)

        ts, (outs, losses) = jax.lax.scan(
            step_fn, ts, None, length=cfg.num_steps_per_episode
        )
        ep_ret_sum, ep_len_sum, n_done, env_metrics = outs
        closs, aloss, alpha = losses["c_loss"], losses["a_loss"], losses["alpha"]
        metrics = {
            "ep_return_sum": jnp.sum(ep_ret_sum),
            "ep_len_sum": jnp.sum(ep_len_sum),
            "n_episodes": jnp.sum(n_done),
            "c_loss": jnp.mean(closs),
            "a_loss": jnp.mean(aloss),
            "alpha": alpha[-1],
            # rollout-mean scalar env extras (same series PPO logs)
            **{f"env/{k}": jnp.mean(v) for k, v in env_metrics.items()},
        }
        return ts, metrics

    # ------------------------------------------------------------------
    def train(
        self,
        max_epochs: int | None = None,
        log_every: int = 50,
        logger=None,
        train_dir: str | None = None,
        name: str = "run",
        checkpoint: str | None = None,
        on_epoch=None,
    ):
        cfg = self.cfg
        ts = self.init()
        if checkpoint:  # resume parity (reference supports checkpoint= for
            ts = self.restore(checkpoint, ts)  # every algo, train.py:106-108)
        max_epochs = max_epochs or cfg.max_epochs
        n = self.env.num_envs
        steps_per_epoch = cfg.num_steps_per_episode * n
        game_returns: list = []
        last = {}
        t0 = time.time()
        for epoch in range(1, max_epochs + 1):
            te = time.time()
            ts, metrics = self._train_epoch(ts)
            metrics = jax.device_get(metrics)
            n_eps = float(metrics["n_episodes"])
            if n_eps > 0:
                game_returns.append(float(metrics["ep_return_sum"]) / n_eps)
                game_returns = game_returns[-100:]
            mean_ret = float(np.mean(game_returns)) if game_returns else float("nan")
            last = {
                **{k: float(v) for k, v in metrics.items()},
                "mean_episode_return": mean_ret,
                "epoch": epoch,
                "frames": epoch * steps_per_epoch,
                "fps": steps_per_epoch / (time.time() - te),
            }
            if logger is not None:
                logger.log(
                    {
                        "rewards/frame": mean_ret,
                        "losses/c_loss": last["c_loss"],
                        "losses/a_loss": last["a_loss"],
                        "info/alpha": last["alpha"],
                        "performance/total_fps": last["fps"],
                    },
                    epoch * steps_per_epoch,
                )
            if epoch % log_every == 0 or epoch == 1:
                print(
                    f"epoch {epoch:6d} | return {mean_ret:10.2f} | "
                    f"fps {last['fps']:9.0f} | alpha {last['alpha']:.3f}"
                )
            # algo -> env frame report (reference set_train_info plumbing)
            self.env.set_train_info(last["frames"])
            if on_epoch is not None and on_epoch(ts, last):
                break  # PPO-train hook parity: True stops training
            if mean_ret == mean_ret and mean_ret >= cfg.score_to_win:
                break
        if train_dir is not None:
            import os

            path = os.path.join(train_dir, name, "nn", f"{name}.ckpt")
            self.save(path, ts)
        return ts, last

    # ------------------------------------------------------------------
    def save(self, path: str, ts: SACTrainState) -> None:
        from ..utils.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            jax.device_get(
                {
                    "actor_params": ts.actor_params,
                    "critic_params": ts.critic_params,
                    "target_params": ts.target_params,
                    "log_alpha": ts.log_alpha,
                    "obs_rms": ts.obs_rms,
                }
            ),
        )

    def restore(self, path: str, ts: SACTrainState) -> SACTrainState:
        from ..utils.checkpoint import load_checkpoint

        ck = load_checkpoint(path)
        return ts.replace(
            actor_params=jax.device_put(ck["actor_params"]),
            critic_params=jax.device_put(ck["critic_params"]),
            target_params=jax.device_put(ck["target_params"]),
            log_alpha=jax.device_put(ck["log_alpha"]),
            obs_rms=jax.device_put(ck["obs_rms"]),
        )

    def act(self, ts: SACTrainState, obs):
        """Deterministic eval action: tanh(mu) (SACPlayer semantics)."""
        nobs = self._norm(ts.obs_rms, obs)
        mu, _ = self.actor.apply(ts.actor_params, nobs)
        return jnp.tanh(mu)

    def play(
        self, checkpoint: str | None = None, num_episodes: int = 32
    ) -> float:
        """Inference loop (rl_games SACPlayer run() semantics):
        deterministic squashed policy, mean finished-episode return."""
        ts = self.init()
        if checkpoint:
            ts = self.restore(checkpoint, ts)
        act = jax.jit(lambda ts, obs: self.act(ts, obs))
        step = jax.jit(self.env.step)
        env_state, obs = self.env.reset(jax.random.PRNGKey(self.seed + 1))
        n = self.env.num_envs
        ep_ret = jnp.zeros(n)
        finished, total = 0, 0.0
        while finished < num_episodes:
            a = act(ts, obs)
            env_state, obs, rew, done, _ = step(env_state, a)
            ep_ret = ep_ret + rew
            d = np.asarray(done)
            if d.any():
                r = np.asarray(ep_ret)
                total += float(r[d].sum())
                finished += int(d.sum())
                ep_ret = jnp.where(done, 0.0, ep_ret)
        mean_ret = total / max(finished, 1)
        print(f"played {finished} episodes | mean return {mean_ret:.2f}")
        return mean_ret
