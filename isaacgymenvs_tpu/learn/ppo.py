"""PPO, in-repo (replaces rl_games' a2c_continuous for the TPU stack).

Semantics mirror the rl_games agent the reference trains with
(cfg/train/*PPO.yaml `params.config`; SURVEY.md section 2.4):
  * rollout of `horizon_length` steps over all envs, then `mini_epochs` x
    minibatched clipped-surrogate updates;
  * running-mean-std obs and value normalization (normalize_input /
    normalize_value);
  * GAE(gamma, tau) with timeout value-bootstrap: shaped reward +=
    gamma * V(s_t) * time_out (rl_games value_bootstrap);
  * adaptive-KL learning-rate schedule, 'legacy' type: lr adjusted after
    every minibatch from the analytic Gaussian KL vs the rollout policy
    (reference learning/common_agent.py:216-236 mirrors the same);
  * clipped value loss, bounds loss on mu (soft bound 1.1), entropy bonus;
  * reward shaping by scale_value (reward_shaper).

TPU design: the entire epoch -- rollout scan + all minibatch updates -- is
ONE jitted function. The host loop only logs and checkpoints. Under a
`Mesh`, env-batch leaves are sharded on the env axis and params are
replicated; XLA inserts the gradient all-reduce (SURVEY.md section 2.5).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..envcore.vec_task import EnvState, VecTask
from .networks import ActorCritic, CriticNet
from .running_stats import (
    RunningMeanStd,
    rms_denormalize,
    rms_normalize,
    rms_update,
)

_LOG_2PI_E = float(np.log(2.0 * np.pi * np.e))


class PPOConfig(NamedTuple):
    """Static hyperparameters; names follow the reference train-yaml keys."""

    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 3e-4
    lr_schedule: str = "adaptive"
    kl_threshold: float = 0.008
    e_clip: float = 0.2
    horizon_length: int = 16
    minibatch_size: int = 32768
    mini_epochs: int = 4
    critic_coef: float = 2.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 0.0001
    grad_norm: float = 1.0
    truncate_grads: bool = True
    clip_value: bool = True
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    value_bootstrap: bool = False
    reward_scale: float = 1.0  # reward_shaper.scale_value
    max_epochs: int = 500
    score_to_win: float = 1e9
    save_frequency: int = 0
    min_lr: float = 1e-6
    max_lr: float = 1e-2
    # shard-local minibatch shuffle: permute rollout rows only within each
    # mesh env-shard (the same index permutation on every shard), so the
    # global shuffle's rollout all-gather disappears from the sharded
    # epoch. Matches the reference semantics more closely than a global
    # shuffle (rl_games shuffles per-process, SCALING.md). Off by default:
    # it changes same-seed trajectories vs the global shuffle.
    local_shuffle: bool = False

    @classmethod
    def from_train_cfg(cls, params: Dict[str, Any]) -> "PPOConfig":
        """Build from the reference-schema train dict (params.config)."""
        c = params.get("config", params)
        shaper = c.get("reward_shaper", {})
        return cls(
            gamma=float(c.get("gamma", 0.99)),
            tau=float(c.get("tau", 0.95)),
            learning_rate=float(c.get("learning_rate", 3e-4)),
            lr_schedule=str(c.get("lr_schedule", "adaptive")),
            kl_threshold=float(c.get("kl_threshold", 0.008)),
            e_clip=float(c.get("e_clip", 0.2)),
            horizon_length=int(c.get("horizon_length", 16)),
            minibatch_size=int(c.get("minibatch_size", 32768)),
            mini_epochs=int(c.get("mini_epochs", 4)),
            critic_coef=float(c.get("critic_coef", 2.0)),
            entropy_coef=float(c.get("entropy_coef", 0.0)),
            bounds_loss_coef=float(c.get("bounds_loss_coef", 0.0) or 0.0),
            grad_norm=float(c.get("grad_norm", 1.0)),
            truncate_grads=bool(c.get("truncate_grads", True)),
            clip_value=bool(c.get("clip_value", True)),
            normalize_input=bool(c.get("normalize_input", True)),
            normalize_value=bool(c.get("normalize_value", True)),
            normalize_advantage=bool(c.get("normalize_advantage", True)),
            value_bootstrap=bool(c.get("value_bootstrap", False)),
            reward_scale=float(shaper.get("scale_value", 1.0)),
            max_epochs=int(c.get("max_epochs", 500)),
            score_to_win=float(c.get("score_to_win", 1e9)),
            save_frequency=int(c.get("save_frequency", 0)),
            local_shuffle=bool(c.get("local_shuffle", False)),
        )


@struct.dataclass
class PPOTrainState:
    params: Any
    opt_state: Any
    lr: jax.Array  # dynamic (adaptive KL schedule)
    obs_rms: RunningMeanStd
    value_rms: RunningMeanStd
    env_state: EnvState
    obs: jax.Array  # (N, num_obs) last observation
    key: jax.Array
    ep_return: jax.Array  # (N,) running episode return (raw rewards)
    ep_len: jax.Array  # (N,)
    states: Any = None  # (N, num_states) privileged state (asym critic)
    state_rms: Any = None
    # per-env running sums of extras['episode_cumulative'] terms (the
    # reference observer's per-episode deque stats, rlgames_utils.py
    # :157-172) -- None when the env emits no such extras
    ep_cum: Any = None


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    states: Any
    extras: Any
    mu: jax.Array
    sigma: jax.Array
    logp: jax.Array
    value: jax.Array  # raw (denormalized)
    reward: jax.Array  # shaped + bootstrapped
    done: jax.Array
    ep_ret_done: jax.Array  # sum of returns of episodes finished this step
    ep_len_done: jax.Array
    n_done: jax.Array


def _gaussian_logp(x, mu, log_sigma):
    return jnp.sum(
        -0.5 * ((x - mu) / jnp.exp(log_sigma)) ** 2
        - log_sigma
        - 0.5 * jnp.log(2.0 * jnp.pi),
        axis=-1,
    )


def _policy_kl(mu0, log_s0, mu1, log_s1):
    """Analytic KL(N0 || N1), reduced over action dims then batch
    (rl_games policy_kl with fixed sigma)."""
    s0sq = jnp.exp(2.0 * log_s0)
    s1sq = jnp.exp(2.0 * log_s1)
    kl = log_s1 - log_s0 + (s0sq + (mu1 - mu0) ** 2) / (2.0 * s1sq) - 0.5
    return jnp.mean(jnp.sum(kl, axis=-1))


class PPO:
    """PPO trainer bound to a VecTask env."""

    # env-extras keys captured into the rollout (e.g. AMP observations)
    capture_extras: tuple = ()

    def __init__(self, env: VecTask, train_params: Dict[str, Any], seed: int = 0):
        self.env = env
        self.cfg = PPOConfig.from_train_cfg(train_params)
        net_cfg = train_params.get("network", {})
        mlp = net_cfg.get("mlp", {})
        space = net_cfg.get("space", {}).get("continuous", {})
        self.network = ActorCritic(
            num_actions=env.num_acts,
            units=tuple(mlp.get("units", (256, 128, 64))),
            act=str(mlp.get("activation", "elu")),
            d2rl=bool(mlp.get("d2rl", False)),
            sigma_init=float(space.get("sigma_init", {}).get("val", 0.0)),
            separate=bool(net_cfg.get("separate", False)),
            learn_sigma=bool(space.get("learn_sigma", True)),
        )
        self.seed = seed
        # asymmetric actor-critic: central value net on privileged states
        # (rl_games central_value_config; reference common_agent.py:80-95)
        self.use_central_value = bool(getattr(env, "num_states", 0))
        if self.use_central_value:
            cv_cfg = train_params.get("config", {}).get(
                "central_value_config", {}
            )
            cv_mlp = cv_cfg.get("network", {}).get("mlp", {})
            self.central_net = CriticNet(
                units=tuple(cv_mlp.get("units", mlp.get("units", (256, 128, 64)))),
                act=str(cv_mlp.get("activation", "elu")),
            )
        self.batch_size = self.cfg.horizon_length * env.num_envs
        self.minibatch_size = min(self.cfg.minibatch_size, self.batch_size)
        assert self.batch_size % self.minibatch_size == 0, (
            f"batch {self.batch_size} not divisible by minibatch "
            f"{self.minibatch_size}"
        )
        self.num_minibatches = self.batch_size // self.minibatch_size
        if self.cfg.truncate_grads:
            self.tx = optax.chain(
                optax.clip_by_global_norm(self.cfg.grad_norm),
                optax.scale_by_adam(eps=1e-8),
            )
        else:
            self.tx = optax.scale_by_adam(eps=1e-8)
        # local_shuffle shard count; train() sets it from the mesh before
        # the first (lazy) trace of _train_epoch
        self._shuffle_shards = 1
        # NOTE: no donate_argnums -- buffer donation triggers InvalidArgument
        # on the axon-tunnel TPU backend (works on real local chips; revisit)
        self._train_epoch = jax.jit(self.train_epoch)

    # ------------------------------------------------------------------
    def init(self, key=None) -> PPOTrainState:
        key = jax.random.PRNGKey(self.seed) if key is None else key
        key, knet, kcv, kenv = jax.random.split(key, 4)
        env_state, obs = self.env.reset(kenv)
        params = {"policy": self.network.init(knet, obs[:1])}
        n = self.env.num_envs
        states = None
        state_rms = None
        if self.use_central_value:
            states = self.env.states_of(env_state)
            params["central"] = self.central_net.init(kcv, states[:1])
            state_rms = RunningMeanStd.create((self.env.num_states,))
        # probe the env's extras structure (trace only) for per-step
        # episode_cumulative terms (reference producer contract:
        # allegro_kuka_base.py:923-928 / allegro_hand_dextreme.py:456+)
        try:
            _, _, _, _, ex_shapes = jax.eval_shape(
                self.env.step,
                env_state,
                jnp.zeros((n, self.env.num_acts)),
            )
            self._ep_cum_keys = tuple(
                sorted(ex_shapes.get("episode_cumulative", {}))
            )
        except Exception:
            self._ep_cum_keys = ()
        ep_cum = (
            {k: jnp.zeros(n) for k in self._ep_cum_keys}
            if self._ep_cum_keys
            else None
        )
        return PPOTrainState(
            params=params,
            opt_state=self.tx.init(params),
            lr=jnp.asarray(self.cfg.learning_rate),
            obs_rms=RunningMeanStd.create((self.env.num_obs,)),
            value_rms=RunningMeanStd.create(()),
            env_state=env_state,
            obs=obs,
            key=key,
            ep_return=jnp.zeros(n),
            ep_len=jnp.zeros(n, jnp.int32),
            states=states,
            state_rms=state_rms,
            ep_cum=ep_cum,
        )

    # ------------------------------------------------------------------
    def _norm_obs(self, rms, obs):
        return rms_normalize(rms, obs) if self.cfg.normalize_input else obs

    def _value_of(self, ts, params, nobs, nstates):
        """Critic value (normalized space): central net on privileged
        states when asymmetric, otherwise the policy's value head."""
        if self.use_central_value:
            return self.central_net.apply(params["central"], nstates)
        _, _, v = self.network.apply(params["policy"], nobs)
        return v

    def _norm_states(self, rms, states):
        if states is None:
            return None
        return rms_normalize(rms, states) if self.cfg.normalize_input else states

    def env_step(self, env_state, obs, action):
        """One (macro-)transition of the env as seen by the learner. The
        HRL agent overrides this to expand a latent action into llc_steps
        low-level steps (reference hrl_continuous.py:74-99)."""
        return self.env.step(env_state, action)

    def rollout(self, ts: PPOTrainState):
        cfg = self.cfg

        def step_fn(carry, _):
            (env_state, obs, states, obs_rms, state_rms, ep_ret, ep_len,
             ep_cum, key) = carry
            if cfg.normalize_input:
                obs_rms = rms_update(obs_rms, obs)
                if self.use_central_value:
                    state_rms = rms_update(state_rms, states)
            nobs = self._norm_obs(obs_rms, obs)
            nstates = self._norm_states(state_rms, states)
            mu, log_sigma, _ = self.network.apply(ts.params["policy"], nobs)
            v_norm = self._value_of(ts, ts.params, nobs, nstates)
            value = (
                rms_denormalize(ts.value_rms, v_norm)
                if cfg.normalize_value
                else v_norm
            )
            key, ksample = jax.random.split(key)
            sigma = jnp.exp(log_sigma)
            action = mu + sigma * jax.random.normal(ksample, mu.shape)
            logp = _gaussian_logp(action, mu, log_sigma)

            env_state, next_obs, reward, done, extras = self.env_step(
                env_state, obs, action
            )
            next_states = extras.get("states") if self.use_central_value else None
            captured = {k: extras[k] for k in self.capture_extras}
            # auto-log every scalar numeric env extra (the reference's
            # RLGPUAlgoObserver consumes arbitrary extras into TB,
            # rlgames_utils.py:174-209): keys are static per env class,
            # so the mean-reduction compiles into the rollout
            captured["_env_metrics"] = {
                k: jnp.mean(v.astype(jnp.float32))
                for k, v in extras.items()
                if k not in ("states", "time_outs")
                and hasattr(v, "ndim")
                and v.ndim == 1
            }
            shaped = reward * cfg.reward_scale
            if cfg.value_bootstrap:
                shaped = shaped + cfg.gamma * value * extras["time_outs"]

            ep_ret = ep_ret + reward
            ep_len = ep_len + 1
            # episode_cumulative: accumulate per-env term sums; capture
            # finished-episode sum/min/max this step (the compiled
            # analogue of the reference's deque of finished episodes,
            # rlgames_utils.py:157-172)
            if ep_cum is not None:
                ec = extras["episode_cumulative"]
                ep_cum = {k: ep_cum[k] + ec[k] for k in ep_cum}
                inf = jnp.float32(jnp.inf)
                captured["_ep_cum"] = {
                    k: (
                        jnp.sum(jnp.where(done, v, 0.0)),
                        jnp.min(jnp.where(done, v, inf)),
                        jnp.max(jnp.where(done, v, -inf)),
                    )
                    for k, v in ep_cum.items()
                }
                ep_cum = {
                    k: jnp.where(done, 0.0, v) for k, v in ep_cum.items()
                }
            t = Transition(
                obs=obs,
                action=action,
                states=states if self.use_central_value else 0.0,
                extras=captured,
                mu=mu,
                sigma=log_sigma,
                logp=logp,
                value=value,
                reward=shaped,
                done=done,
                ep_ret_done=jnp.sum(jnp.where(done, ep_ret, 0.0)),
                ep_len_done=jnp.sum(jnp.where(done, ep_len, 0)),
                n_done=jnp.sum(done),
            )
            ep_ret = jnp.where(done, 0.0, ep_ret)
            ep_len = jnp.where(done, 0, ep_len)
            return (
                env_state, next_obs, next_states, obs_rms, state_rms,
                ep_ret, ep_len, ep_cum, key,
            ), t

        carry = (
            ts.env_state, ts.obs, ts.states, ts.obs_rms, ts.state_rms,
            ts.ep_return, ts.ep_len, ts.ep_cum, ts.key,
        )
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.horizon_length)
        (env_state, obs, states, obs_rms, state_rms, ep_ret, ep_len,
         ep_cum, key) = carry
        ts = ts.replace(
            env_state=env_state,
            obs=obs,
            states=states,
            obs_rms=obs_rms,
            state_rms=state_rms,
            ep_return=ep_ret,
            ep_len=ep_len,
            ep_cum=ep_cum,
            key=key,
        )
        # bootstrap value for the state after the last transition
        nobs = self._norm_obs(obs_rms, obs)
        nstates = self._norm_states(state_rms, states)
        v_norm = self._value_of(ts, ts.params, nobs, nstates)
        last_value = (
            rms_denormalize(ts.value_rms, v_norm) if cfg.normalize_value else v_norm
        )
        return ts, traj, last_value

    def _gae(self, traj: Transition, last_value):
        cfg = self.cfg
        not_done = 1.0 - traj.done.astype(jnp.float32)

        def back(adv_next, inp):
            reward, value, value_next, nd = inp
            delta = reward + cfg.gamma * value_next * nd - value
            adv = delta + cfg.gamma * cfg.tau * nd * adv_next
            return adv, adv

        values_next = jnp.concatenate(
            [traj.value[1:], last_value[None]], axis=0
        )
        _, advantages = jax.lax.scan(
            back,
            jnp.zeros_like(last_value),
            (traj.reward, traj.value, values_next, not_done),
            reverse=True,
        )
        returns = advantages + traj.value
        return advantages, returns

    # ------------------------------------------------------------------
    def extra_dataset(self, ts, traj, flat) -> tuple:
        """Hook: extra per-sample arrays appended to the minibatch tuple."""
        return ()

    def extra_loss(self, params, batch_extra):
        """Hook: additional loss terms from the extra dataset entries."""
        return 0.0, {}

    def _loss(self, params, batch, value_rms, lr_unused=None):
        cfg = self.cfg
        (
            nobs, nstates, action, old_mu, old_log_sigma, old_logp,
            old_vnorm, adv, ret_norm,
        ) = batch[:9]
        mu, log_sigma, v_pol = self.network.apply(params["policy"], nobs)
        if self.use_central_value:
            v_norm = self.central_net.apply(params["central"], nstates)
        else:
            v_norm = v_pol
        logp = _gaussian_logp(action, mu, log_sigma)
        ratio = jnp.exp(logp - old_logp)
        surr1 = adv * ratio
        surr2 = adv * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
        a_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        if cfg.clip_value:
            v_clipped = old_vnorm + jnp.clip(
                v_norm - old_vnorm, -cfg.e_clip, cfg.e_clip
            )
            c_loss = jnp.maximum(
                (v_norm - ret_norm) ** 2, (v_clipped - ret_norm) ** 2
            )
        else:
            c_loss = (v_norm - ret_norm) ** 2
        c_loss = jnp.mean(c_loss)

        entropy = jnp.mean(jnp.sum(log_sigma + 0.5 * _LOG_2PI_E, axis=-1))
        # bounds loss, soft bound 1.1 (rl_games bound_loss)
        b_loss = jnp.mean(
            jnp.sum(
                jnp.maximum(mu - 1.1, 0.0) ** 2 + jnp.minimum(mu + 1.1, 0.0) ** 2,
                axis=-1,
            )
        )
        total = (
            a_loss
            + 0.5 * cfg.critic_coef * c_loss
            - cfg.entropy_coef * entropy
            + cfg.bounds_loss_coef * b_loss
        )
        xloss, _ = self.extra_loss(params, batch[9:])
        total = total + xloss
        kl = _policy_kl(old_mu, old_log_sigma, mu, log_sigma)
        return total, (a_loss, c_loss, entropy, b_loss, kl)

    def _update_lr(self, lr, kl):
        cfg = self.cfg
        if cfg.lr_schedule != "adaptive":
            return lr
        lr = jnp.where(kl > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
        lr = jnp.where(kl < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
        return jnp.clip(lr, cfg.min_lr, cfg.max_lr)

    # ------------------------------------------------------------------
    def shape_rollout_rewards(self, ts, traj):
        """Hook for subclasses to modify rollout rewards (e.g. AMP style
        rewards) before GAE. Returns (ts, traj, aux_metrics)."""
        return ts, traj, {}

    def train_epoch(self, ts: PPOTrainState):
        """One full PPO epoch: rollout + mini_epochs of minibatch updates.
        Jitted as a whole; returns (new_ts, metrics dict)."""
        cfg = self.cfg
        ts, traj, last_value = self.rollout(ts)
        ts, traj, aux_metrics = self.shape_rollout_rewards(ts, traj)
        advantages, returns = self._gae(traj, last_value)

        # value normalizer trains on the fresh values+returns
        # (rl_games train_epoch: value_mean_std updated with both)
        value_rms = ts.value_rms
        if cfg.normalize_value:
            value_rms = rms_update(value_rms, traj.value)
            value_rms = rms_update(value_rms, returns)
            old_vnorm = rms_normalize(value_rms, traj.value, clip=np.inf)
            ret_norm = rms_normalize(value_rms, returns, clip=np.inf)
        else:
            old_vnorm = traj.value
            ret_norm = returns
        ts = ts.replace(value_rms=value_rms)

        B = self.batch_size
        # S > 1: shard-blocked dataset layout (S, B/S, ...) -- rows stay on
        # their env shard, the permutation indexes within shards only, and
        # the sharded epoch compiles with no rollout all-gather
        # (cfg.local_shuffle; SCALING.md)
        S = self._shuffle_shards if cfg.local_shuffle else 1

        if S > 1:

            def flat(x):
                T, N = x.shape[0], x.shape[1]
                y = x.reshape((T, S, N // S) + x.shape[2:])
                y = jnp.swapaxes(y, 0, 1)  # (S, T, N/S, ...)
                return y.reshape((S, T * (N // S)) + x.shape[2:])

        else:

            def flat(x):
                return x.reshape((B,) + x.shape[2:])

        adv = flat(advantages)
        if cfg.normalize_advantage:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)

        nobs_all = flat(self._norm_obs(ts.obs_rms, traj.obs))
        if self.use_central_value:
            nstates_all = flat(self._norm_states(ts.state_rms, traj.states))
        elif S > 1:
            nstates_all = jnp.zeros((S, B // S, 1))
        else:
            nstates_all = jnp.zeros((B, 1))
        dataset = (
            nobs_all,
            nstates_all,
            flat(traj.action),
            flat(traj.mu),
            flat(traj.sigma),
            flat(traj.logp),
            flat(old_vnorm),
            adv,
            flat(ret_norm),
        ) + self.extra_dataset(ts, traj, flat)

        def mini_epoch(carry, _):
            params, opt_state, lr, key = carry
            key, kperm = jax.random.split(key)
            if S > 1:
                # one permutation over the per-shard row range, applied
                # identically on every shard: minibatches stay balanced
                # across shards and no row crosses a shard boundary
                perm = jax.random.permutation(kperm, B // S)
                shuffled = jax.tree.map(lambda x: x[:, perm], dataset)
            else:
                perm = jax.random.permutation(kperm, B)
                shuffled = jax.tree.map(lambda x: x[perm], dataset)

            def minibatch(carry, mb):
                params, opt_state, lr = carry
                if S > 1:  # merge (S, mb/S, ...) -> (mb, ...): shard-local
                    mb = jax.tree.map(
                        lambda x: x.reshape(
                            (self.minibatch_size,) + x.shape[2:]
                        ),
                        mb,
                    )
                grads, aux = jax.grad(self._loss, has_aux=True)(
                    params, mb, value_rms
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                updates = jax.tree.map(lambda u: -lr * u, updates)
                params = optax.apply_updates(params, updates)
                kl = aux[4]
                lr = self._update_lr(lr, kl)
                return (params, opt_state, lr), aux

            if S > 1:
                mbs = jax.tree.map(
                    lambda x: jnp.moveaxis(
                        x.reshape(
                            (
                                S,
                                self.num_minibatches,
                                self.minibatch_size // S,
                            )
                            + x.shape[2:]
                        ),
                        1,
                        0,
                    ),
                    shuffled,
                )
            else:
                mbs = jax.tree.map(
                    lambda x: x.reshape(
                        (self.num_minibatches, self.minibatch_size)
                        + x.shape[1:]
                    ),
                    shuffled,
                )
            (params, opt_state, lr), auxs = jax.lax.scan(
                minibatch, (params, opt_state, lr), mbs
            )
            return (params, opt_state, lr, key), auxs

        (params, opt_state, lr, key), auxs = jax.lax.scan(
            mini_epoch,
            (ts.params, ts.opt_state, ts.lr, ts.key),
            None,
            length=cfg.mini_epochs,
        )
        ts = ts.replace(
            params=params, opt_state=opt_state, lr=lr, key=key
        )
        a_loss, c_loss, entropy, b_loss, kl = auxs
        metrics = {
            "a_loss": jnp.mean(a_loss),
            "c_loss": jnp.mean(c_loss),
            "entropy": jnp.mean(entropy),
            "b_loss": jnp.mean(b_loss),
            "kl": jnp.mean(kl[-1]),
            "lr": lr,
            "ep_return_sum": jnp.sum(traj.ep_ret_done),
            "ep_len_sum": jnp.sum(traj.ep_len_done),
            "n_episodes": jnp.sum(traj.n_done),
            # rollout-mean of every scalar env extra (the reference's
            # RLGPUAlgoObserver TB series, rlgames_utils.py:174-209)
            **{
                f"env/{k}": jnp.mean(v)
                for k, v in traj.extras.get("_env_metrics", {}).items()
            },
            # per-episode cumulative term stats over episodes finished
            # this rollout (reference episode_cumulative/<k> mean +
            # _min/_max series, rlgames_utils.py:198-204)
            **{
                name: stat
                for k, (s, mn, mx) in traj.extras.get("_ep_cum", {}).items()
                for name, stat in (
                    (
                        f"episode_cumulative/{k}",
                        jnp.sum(s) / jnp.maximum(jnp.sum(traj.n_done), 1),
                    ),
                    (f"episode_cumulative_min/{k}_min", jnp.min(mn)),
                    (f"episode_cumulative_max/{k}_max", jnp.max(mx)),
                )
            },
            "reward_mean_step": jnp.mean(traj.reward),
            **aux_metrics,
        }
        return ts, metrics

    # ------------------------------------------------------------------
    def save(self, path: str, ts: PPOTrainState, epoch: int = 0, frames: int = 0):
        from ..utils.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            {
                "params": ts.params,
                "obs_rms": ts.obs_rms,
                "value_rms": ts.value_rms,
                "state_rms": ts.state_rms,
                "lr": ts.lr,
                "opt_state": ts.opt_state,
                "epoch": epoch,
                "frames": frames,
                # env-side curriculum / task state round-trips with the
                # checkpoint (get_env_state contract, SURVEY.md 5.4)
                "env_task_state": ts.env_state.task,
                # ADR population state (ranges/queues/worker assignment)
                # mirrors adr_vec_task.get_env_state (ref :368-399)
                "env_adr_state": ts.env_state.adr,
            },
        )

    def restore(self, path: str, ts: PPOTrainState) -> Tuple[PPOTrainState, int]:
        """Re-hydrate params AND env-side state (reference set_env_state
        vec_task.py:196-204 + adr_load_from_checkpoint adr_vec_task.py:516).
        Task curriculum state always restores when present; ADR ranges
        restore only when the task cfg sets `adr_load_from_checkpoint`."""
        from ..utils.checkpoint import load_checkpoint

        ck = load_checkpoint(path)
        ts = ts.replace(
            params=jax.device_put(ck["params"]),
            obs_rms=jax.device_put(ck["obs_rms"]),
            value_rms=jax.device_put(ck["value_rms"]),
            lr=jax.device_put(ck["lr"]),
            opt_state=jax.device_put(ck["opt_state"]),
        )
        if ck.get("state_rms") is not None:
            ts = ts.replace(state_rms=jax.device_put(ck["state_rms"]))
        env_state = ts.env_state
        task = ck.get("env_task_state")
        if task is not None and env_state.task is not None:
            env_state = env_state.replace(task=jax.device_put(task))
        adr = ck.get("env_adr_state")
        if adr is not None and env_state.adr is not None and getattr(
            self.env, "adr_load_from_checkpoint", False
        ):
            env_state = env_state.replace(adr=jax.device_put(adr))
        ts = ts.replace(env_state=env_state)
        return ts, int(ck.get("epoch", 0))

    def override_sigma(self, ts: PPOTrainState, sigma: float) -> PPOTrainState:
        """Fixed-sigma override (the reference's `sigma=` CLI flag,
        train.py:214 Runner.run sigma): replace the policy's learned
        log-std with log(sigma)."""
        import flax

        params = flax.core.unfreeze(jax.device_get(ts.params))
        pol = params["policy"]["params"]
        if "log_sigma" in pol:
            pol["log_sigma"] = np.full_like(
                np.asarray(pol["log_sigma"]), np.log(sigma)
            )
        return ts.replace(params=jax.device_put(params))

    def act(self, ts: PPOTrainState, obs, deterministic: bool = True, key=None):
        """Policy action for eval/play (CommonPlayer.get_action semantics)."""
        nobs = self._norm_obs(ts.obs_rms, obs)
        mu, log_sigma, _ = self.network.apply(ts.params["policy"], nobs)
        if deterministic:
            return mu
        return mu + jnp.exp(log_sigma) * jax.random.normal(key, mu.shape)

    def _play_step(self, ts, obs, prev_done):
        """One eval policy step; stateful players (LSTM) override this to
        thread their carry through `ts` and reset it for done envs."""
        return self.act(ts, obs), ts

    def play(
        self, checkpoint: str | None = None, num_episodes: int = 32
    ) -> float:
        """Inference loop (reference learning/common_player.py:54 run()):
        deterministic policy, report mean finished-episode return."""
        ts = self.init()
        if checkpoint:
            ts, _ = self.restore(checkpoint, ts)
        policy = jax.jit(self._play_step)
        step = jax.jit(self.env.step)
        env_state, obs = self.env.reset(jax.random.PRNGKey(self.seed + 1))
        n = self.env.num_envs
        ep_ret = jnp.zeros(n)
        done = jnp.zeros(n, bool)
        finished, total = 0, 0.0
        stat_sums: Dict[str, float] = {}
        stat_n = 0
        succ_hist: Dict[int, int] = {}
        while finished < num_episodes:
            a, ts = policy(ts, obs, done)
            env_state, obs, rew, done, extras = step(env_state, a)
            ep_ret = ep_ret + rew
            d = np.asarray(done)
            if d.any():
                r = np.asarray(ep_ret)
                total += float(r[d].sum())
                finished += int(d.sum())
                ep_ret = jnp.where(done, 0.0, ep_ret)
                # end-of-episode env stats (the reference test protocol's
                # consecutive-success printer, shadow_hand.py:426-435)
                for k, v in extras.items():
                    if k in ("states", "time_outs"):
                        continue
                    va = np.asarray(v)
                    if va.ndim == 1 and va.shape[0] == n:
                        stat_sums[k] = stat_sums.get(k, 0.0) + float(
                            va[d].astype(np.float64).sum()
                        )
                stat_n += int(d.sum())
                # evalStats-style success accounting (reference
                # allegro_kuka_base.py:932-969 / shadow_hand printer):
                # distribution + max of per-episode consecutive successes
                if "successes" in extras:
                    sv = np.asarray(extras["successes"])
                    if sv.ndim == 1 and sv.shape[0] == n:
                        for s in sv[d]:
                            succ_hist[int(s)] = succ_hist.get(int(s), 0) + 1
        mean_ret = total / max(finished, 1)
        print(f"played {finished} episodes | mean return {mean_ret:.2f}")
        for k, v in sorted(stat_sums.items()):
            print(f"  {k}: {v / max(stat_n, 1):.3f} (mean at episode end)")
        if succ_hist:
            mx = max(succ_hist)
            tot = sum(succ_hist.values())
            print(f"  max successes: {mx}")
            print(
                "  successes distribution: "
                + ", ".join(
                    f"{k}: {100.0 * v / tot:.1f}%"
                    for k, v in sorted(succ_hist.items())
                )
            )
        return mean_ret

    # ------------------------------------------------------------------
    def train(
        self,
        max_epochs: int | None = None,
        log_every: int = 10,
        on_epoch=None,
        checkpoint: str | None = None,
        train_dir: str | None = None,
        name: str = "run",
        save_best_after: int = 100,
        logger=None,
        mesh=None,
    ) -> Tuple[PPOTrainState, Dict[str, float]]:
        """Host training loop. Returns final state + last metrics.

        `mesh`: optional jax.sharding.Mesh -- env-batched leaves shard on
        its 'env' axis, params replicate, and the jitted epoch compiles
        the gradient all-reduce in (multi-chip and multi-host both route
        through here; the reference's torchrun path README.md:165-172).
        """
        cfg = self.cfg
        main = jax.process_index() == 0
        if not main:  # host effects are rank-0-only (ref train.py:178-183)
            logger = None
            train_dir = None
        ts = self.init()
        start_epoch = 0
        if checkpoint:
            ts, start_epoch = self.restore(checkpoint, ts)
        if mesh is not None:
            from ..parallel import shard_train_state

            ts = shard_train_state(ts, mesh)
            if cfg.local_shuffle:
                S = int(mesh.shape.get("env", 1))
                if self.minibatch_size % S or self.env.num_envs % S:
                    raise ValueError(
                        f"local_shuffle needs minibatch_size "
                        f"{self.minibatch_size} and num_envs "
                        f"{self.env.num_envs} divisible by the env-shard "
                        f"count {S}"
                    )
                self._shuffle_shards = S
        nn_dir = None
        if train_dir:
            nn_dir = os.path.join(train_dir, name, "nn")
            os.makedirs(nn_dir, exist_ok=True)
        best_ret = -float("inf")
        epoch = start_epoch
        max_epochs = max_epochs or cfg.max_epochs
        n = self.env.num_envs
        steps_per_epoch = cfg.horizon_length * n
        game_returns: list = []  # last-100 finished episodes mean, rl_games-style
        last_metrics: Dict[str, float] = {}
        t_start = time.time()
        for epoch in range(start_epoch + 1, max_epochs + 1):
            t0 = time.time()
            if cfg.lr_schedule == "linear":
                # rl_games LinearScheduler: lr decays to ~0 over
                # max_epochs (reference train cfgs use this for
                # dextreme/IndustReal)
                frac = max(0.0, 1.0 - (epoch - 1) / max(1, max_epochs))
                ts = ts.replace(lr=jnp.asarray(cfg.learning_rate * frac))
            ts, metrics = self._train_epoch(ts)
            metrics = jax.device_get(metrics)
            dt_epoch = time.time() - t0
            n_eps = float(metrics["n_episodes"])
            if n_eps > 0:
                game_returns.append(float(metrics["ep_return_sum"]) / n_eps)
                game_returns = game_returns[-100:]
            mean_ret = float(np.mean(game_returns)) if game_returns else float("nan")
            last_metrics = {
                **{k: float(v) for k, v in metrics.items()},
                "mean_episode_return": mean_ret,
                "epoch": epoch,
                "frames": epoch * steps_per_epoch,
                "fps": steps_per_epoch / dt_epoch,
                "time": time.time() - t_start,
            }
            if logger is not None:
                frames = epoch * steps_per_epoch
                logger.log(
                    {
                        # rl_games scalar names (reference writer layout)
                        "rewards/frame": mean_ret,
                        "rewards/iter": mean_ret,
                        "episode_lengths/frame": (
                            float(metrics["ep_len_sum"]) / max(n_eps, 1)
                        ),
                        "losses/a_loss": last_metrics["a_loss"],
                        "losses/c_loss": last_metrics["c_loss"],
                        "losses/entropy": last_metrics["entropy"],
                        "losses/bounds_loss": last_metrics["b_loss"],
                        "info/last_lr": last_metrics["lr"],
                        "info/kl": last_metrics["kl"],
                        "performance/total_fps": last_metrics["fps"],
                        "performance/step_fps": last_metrics["fps"],
                        **{
                            k: v
                            for k, v in last_metrics.items()
                            if k.startswith("env/")
                            or (
                                # only once episodes actually finished
                                # (reference new_finished_episodes gate)
                                k.startswith("episode_cumulative")
                                and np.isfinite(v)
                            )
                        },
                    },
                    frames,
                )
            # saveStates wiring (reference allegro_kuka_base accumulates in
            # post_physics_step and dumps at reset). Per-step host pulls
            # would serialize the jitted epoch, so the TPU-native cadence is
            # one (q, qd) snapshot per epoch (= one rollout horizon apart),
            # dumped through the task's own downsampling rule every 50
            # epochs and at exit.
            # (single-process only: a multi-host global array spans
            # non-addressable devices and np.asarray would raise)
            if main and jax.process_count() == 1 \
                    and getattr(self.env, "save_states", False) \
                    and getattr(self.env, "save_states_file", ""):
                self.env.accumulate_env_states(ts.env_state)
                if epoch % 50 == 0:
                    self.env.dump_env_states()
            # algo -> env frame report (reference set_train_info
            # plumbing, rlgames_utils.py:274-281)
            self.env.set_train_info(last_metrics["frames"])
            stop_requested = False
            if on_epoch is not None:
                stop_requested = bool(on_epoch(ts, last_metrics))
            if main and (epoch % log_every == 0 or epoch == 1):
                print(
                    f"epoch {epoch:5d} | return {mean_ret:10.2f} | "
                    f"fps {last_metrics['fps']:9.0f} | kl {last_metrics['kl']:.4f} "
                    f"| lr {last_metrics['lr']:.2e}"
                )
            if nn_dir is not None:
                frames = epoch * steps_per_epoch
                if cfg.save_frequency and epoch % cfg.save_frequency == 0:
                    self.save(
                        os.path.join(nn_dir, f"last_{name}_ep_{epoch}.ckpt"),
                        ts, epoch, frames,
                    )
                if (
                    epoch >= save_best_after
                    and game_returns
                    and mean_ret > best_ret
                ):
                    best_ret = mean_ret
                    self.save(os.path.join(nn_dir, f"{name}.ckpt"), ts, epoch, frames)
            if stop_requested:
                break
            if mean_ret == mean_ret and mean_ret >= cfg.score_to_win:
                if main:
                    print(f"score_to_win {cfg.score_to_win} reached at epoch {epoch}")
                break
        if main and jax.process_count() == 1 \
                and getattr(self.env, "save_states", False) \
                and getattr(self.env, "save_states_file", ""):
            self.env.dump_env_states()
        if nn_dir is not None:
            self.save(
                os.path.join(nn_dir, f"last_{name}.ckpt"),
                ts, epoch, epoch * steps_per_epoch,
            )
        return ts, last_metrics
