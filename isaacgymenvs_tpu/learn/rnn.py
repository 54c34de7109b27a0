"""Recurrent (LSTM) actor-critic + recurrent PPO.

Parity target: rl_games' LSTM networks the reference configures via
params.network.rnn (reference cfg/train/ShadowHandPPOAsymmLSTM.yaml:33-38:
lstm units/layers, before_mlp, layer_norm) trained with truncated BPTT of
`seq_length` chunks (AntPPO.yaml:70, SURVEY.md 5.7): the rollout stores
per-step hidden states; the update re-runs the cell over seq_length-long
windows starting from those stored (stale) states, minibatching over
sequences. Hidden state resets to zero on env done.

Documented divergence: the recurrent trainer uses the LSTM's own value
head on the policy observations; the reference's separate central-value
network on privileged states (asym critic) is supported only in the
feed-forward PPO path. The AsymmLSTM recipes therefore train here as
recurrent actor-critic on the policy obs — same information flow as the
reference's non-Asymm LSTM configs.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .networks import MLP
from .ppo import PPO, PPOTrainState, Transition, _gaussian_logp, _policy_kl
from .running_stats import rms_denormalize, rms_normalize, rms_update


class LSTMActorCritic(nn.Module):
    """MLP/LSTM actor-critic; rnn before or after the MLP trunk."""

    num_actions: int
    units: Sequence[int] = (512, 256, 128)
    act: str = "elu"
    rnn_units: int = 1024
    before_mlp: bool = True
    layer_norm: bool = True
    sigma_init: float = 0.0
    learn_sigma: bool = True

    @nn.compact
    def __call__(self, obs, carry):
        """obs (..., d), carry (c, h) each (..., rnn_units)."""
        cell = nn.OptimizedLSTMCell(self.rnn_units, name="lstm")
        if self.before_mlp:
            carry, x = cell(carry, obs)
            if self.layer_norm:
                x = nn.LayerNorm(name="rnn_ln")(x)
            x = MLP(self.units, self.act, name="mlp")(x)
        else:
            x = MLP(self.units, self.act, name="mlp")(obs)
            carry, x = cell(carry, x)
            if self.layer_norm:
                x = nn.LayerNorm(name="rnn_ln")(x)
        mu = nn.Dense(self.num_actions, name="mu")(x)
        value = nn.Dense(1, name="value")(x)[..., 0]
        if self.learn_sigma:
            log_sigma = self.param(
                "log_sigma", nn.initializers.constant(self.sigma_init),
                (self.num_actions,),
            )
        else:
            log_sigma = jnp.full((self.num_actions,), self.sigma_init)
        log_sigma = jnp.broadcast_to(log_sigma, mu.shape)
        return carry, (mu, log_sigma, value)

    def initial_carry(self, batch_shape):
        z = jnp.zeros(batch_shape + (self.rnn_units,))
        return (z, z)


class PPORecurrent(PPO):
    """PPO with an LSTM policy (truncated BPTT over seq_length chunks)."""

    def __init__(self, env, train_params: Dict[str, Any], seed: int = 0):
        net_cfg = train_params.get("network", {})
        rnn = net_cfg.get("rnn", {})
        c = train_params.get("config", {})
        self.seq_length = int(c.get("seq_length", c.get("seq_len", 4)))
        super().__init__(env, train_params, seed)
        mlp = net_cfg.get("mlp", {})
        space = net_cfg.get("space", {}).get("continuous", {})
        self.network = LSTMActorCritic(
            num_actions=env.num_acts,
            units=tuple(mlp.get("units", (512, 256, 128))),
            act=str(mlp.get("activation", "elu")),
            rnn_units=int(rnn.get("units", 1024)),
            before_mlp=bool(rnn.get("before_mlp", True)),
            layer_norm=bool(rnn.get("layer_norm", False)),
            sigma_init=float(space.get("sigma_init", {}).get("val", 0.0)),
            learn_sigma=bool(space.get("learn_sigma", True)),
        )
        assert self.cfg.horizon_length % self.seq_length == 0
        # sequences per batch for minibatching
        self.seqs_per_env = self.cfg.horizon_length // self.seq_length
        self.num_seqs = self.seqs_per_env * env.num_envs
        # minibatch over sequences, at parity with rl_games semantics:
        # minibatch_size counts TRANSITIONS
        assert self.minibatch_size % self.seq_length == 0
        self.seq_minibatch = self.minibatch_size // self.seq_length
        assert self.num_seqs % self.seq_minibatch == 0

    # ------------------------------------------------------------------
    def init(self) -> PPOTrainState:
        key = jax.random.PRNGKey(self.seed)
        key, knet, kenv = jax.random.split(key, 3)
        env_state, obs = self.env.reset(kenv)
        n = self.env.num_envs
        carry0 = self.network.initial_carry((n,))
        params = {
            "policy": self.network.init(knet, obs, carry0)
        }
        from .running_stats import RunningMeanStd

        ts = PPOTrainState(
            params=params,
            opt_state=None,
            lr=jnp.asarray(self.cfg.learning_rate),
            obs_rms=RunningMeanStd.create((self.env.num_obs,)),
            value_rms=RunningMeanStd.create(()),
            env_state=env_state,
            obs=obs,
            key=key,
            ep_return=jnp.zeros(n),
            ep_len=jnp.zeros(n, jnp.int32),
            states=carry0,  # recurrent carry lives in the states slot
            state_rms=None,
        )
        return ts.replace(opt_state=self.tx.init(params))

    # ------------------------------------------------------------------
    def rollout(self, ts: PPOTrainState):
        cfg = self.cfg

        def step_fn(carry, _):
            env_state, obs, rnn_carry, obs_rms, ep_ret, ep_len, key = carry
            if cfg.normalize_input:
                obs_rms = rms_update(obs_rms, obs)
            nobs = rms_normalize(obs_rms, obs) if cfg.normalize_input else obs
            new_carry, (mu, log_sigma, v_norm) = self.network.apply(
                ts.params["policy"], nobs, rnn_carry
            )
            value = (
                rms_denormalize(ts.value_rms, v_norm)
                if cfg.normalize_value else v_norm
            )
            key, ksample = jax.random.split(key)
            action = mu + jnp.exp(log_sigma) * jax.random.normal(ksample, mu.shape)
            logp = _gaussian_logp(action, mu, log_sigma)
            env_state, next_obs, reward, done, extras = self.env.step(
                env_state, action
            )
            shaped = reward * cfg.reward_scale
            if cfg.value_bootstrap:
                shaped = shaped + cfg.gamma * value * extras["time_outs"]
            # zero the rnn state of done envs
            mask = (1.0 - done.astype(jnp.float32))[:, None]
            new_carry = tuple(x * mask for x in new_carry)
            ep_ret = ep_ret + reward
            ep_len = ep_len + 1
            t = Transition(
                obs=obs,
                action=action,
                states=rnn_carry,  # PRE-step hidden (BPTT window starts)
                extras={},
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
                env_state, next_obs, new_carry, obs_rms, ep_ret, ep_len, key
            ), t

        carry = (
            ts.env_state, ts.obs, ts.states, ts.obs_rms,
            ts.ep_return, ts.ep_len, ts.key,
        )
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.horizon_length)
        env_state, obs, rnn_carry, obs_rms, ep_ret, ep_len, key = carry
        ts = ts.replace(
            env_state=env_state, obs=obs, states=rnn_carry, obs_rms=obs_rms,
            ep_return=ep_ret, ep_len=ep_len, key=key,
        )
        nobs = rms_normalize(obs_rms, obs) if cfg.normalize_input else obs
        _, (_, _, v_norm) = self.network.apply(ts.params["policy"], nobs, rnn_carry)
        last_value = (
            rms_denormalize(ts.value_rms, v_norm) if cfg.normalize_value else v_norm
        )
        return ts, traj, last_value

    # ------------------------------------------------------------------
    def train_epoch(self, ts: PPOTrainState):
        cfg = self.cfg
        ts, traj, last_value = self.rollout(ts)
        advantages, returns = self._gae(traj, last_value)

        value_rms = ts.value_rms
        if cfg.normalize_value:
            value_rms = rms_update(value_rms, traj.value)
            value_rms = rms_update(value_rms, returns)
            old_vnorm = rms_normalize(value_rms, traj.value, clip=np.inf)
            ret_norm = rms_normalize(value_rms, returns, clip=np.inf)
        else:
            old_vnorm, ret_norm = traj.value, returns
        ts = ts.replace(value_rms=value_rms)

        adv = advantages.reshape(-1)
        if cfg.normalize_advantage:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        adv = adv.reshape(advantages.shape)

        S, L, N = self.seqs_per_env, self.seq_length, self.env.num_envs

        def to_seq(x):  # (T, N, ...) -> (num_seqs, L, ...)
            x = x.reshape((S, L, N) + x.shape[2:])
            return jnp.moveaxis(x, 2, 0).reshape((S * N, L) + x.shape[3:])

        nobs_all = (
            rms_normalize(ts.obs_rms, traj.obs)
            if cfg.normalize_input else traj.obs
        )
        # initial hidden per sequence = stored state at the window start
        def seq_starts(x):  # (T, N, H) -> (num_seqs, H)
            x = x.reshape((S, L, N) + x.shape[2:])[:, 0]
            return jnp.moveaxis(x, 1, 0).reshape((S * N,) + x.shape[2:])

        dataset = (
            to_seq(nobs_all),
            tuple(seq_starts(c) for c in traj.states),
            to_seq(traj.action),
            to_seq(traj.mu),
            to_seq(traj.sigma),
            to_seq(traj.logp),
            to_seq(old_vnorm),
            to_seq(adv),
            to_seq(ret_norm),
        )

        num_mb = self.num_seqs // self.seq_minibatch

        # shard-local shuffle (cfg.local_shuffle; same scheme as the
        # feed-forward epoch): sequence rows are env-major (row = env*S +
        # chunk), so one mesh env-shard owns a CONTIGUOUS row block --
        # block the dataset (Sh, rows/Sh, ...) and permute within blocks
        # with one shared permutation; no row crosses a shard boundary
        # and the sharded epoch compiles with no rollout all-gather.
        Sh = self._shuffle_shards if cfg.local_shuffle else 1
        if Sh > 1:
            if self.seq_minibatch % Sh or (S * N) % Sh:
                raise ValueError(
                    f"local_shuffle needs seq_minibatch "
                    f"{self.seq_minibatch} and num_seqs {S * N} divisible "
                    f"by the env-shard count {Sh}"
                )
            dataset = jax.tree.map(
                lambda x: x.reshape((Sh, (S * N) // Sh) + x.shape[1:]),
                dataset,
            )

        def mini_epoch(carry, _):
            params, opt_state, lr, key = carry
            key, kperm = jax.random.split(key)
            if Sh > 1:
                perm = jax.random.permutation(kperm, (S * N) // Sh)
                shuffled = jax.tree.map(lambda x: x[:, perm], dataset)
            else:
                perm = jax.random.permutation(kperm, S * N)
                shuffled = jax.tree.map(lambda x: x[perm], dataset)

            def minibatch(carry, mb):
                params, opt_state, lr = carry
                if Sh > 1:  # merge (Sh, mb/Sh, ...) -> (mb, ...)
                    mb = jax.tree.map(
                        lambda x: x.reshape(
                            (self.seq_minibatch,) + x.shape[2:]
                        ),
                        mb,
                    )
                grads, aux = jax.grad(self._seq_loss, has_aux=True)(
                    params, mb
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                updates = jax.tree.map(lambda u: -lr * u, updates)
                params = optax.apply_updates(params, updates)
                lr = self._update_lr(lr, aux[4])
                return (params, opt_state, lr), aux

            if Sh > 1:
                mbs = jax.tree.map(
                    lambda x: jnp.swapaxes(
                        x.reshape(
                            (Sh, num_mb, self.seq_minibatch // Sh)
                            + x.shape[2:]
                        ),
                        0,
                        1,
                    ),
                    shuffled,
                )
            else:
                mbs = jax.tree.map(
                    lambda x: x.reshape(
                        (num_mb, self.seq_minibatch) + x.shape[1:]
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
        ts = ts.replace(params=params, opt_state=opt_state, lr=lr, key=key)
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
            "reward_mean_step": jnp.mean(traj.reward),
        }
        return ts, metrics

    def _seq_loss(self, params, batch):
        cfg = self.cfg
        (
            nobs, carry0, action, old_mu, old_log_sigma, old_logp,
            old_vnorm, adv, ret_norm,
        ) = batch

        def cell_step(carry, x):
            carry, out = self.network.apply(params["policy"], x, carry)
            return carry, out

        # scan over the seq_length axis: nobs (B, L, d) -> (L, B, d)
        obs_t = jnp.moveaxis(nobs, 1, 0)
        _, (mu, log_sigma, v_norm) = jax.lax.scan(cell_step, carry0, obs_t)
        mu = jnp.moveaxis(mu, 0, 1)
        log_sigma = jnp.moveaxis(log_sigma, 0, 1)
        v_norm = jnp.moveaxis(v_norm, 0, 1)

        logp = _gaussian_logp(action, mu, log_sigma)
        ratio = jnp.exp(logp - old_logp)
        surr1 = adv * ratio
        surr2 = adv * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
        a_loss = -jnp.mean(jnp.minimum(surr1, surr2))
        if cfg.clip_value:
            v_clip = old_vnorm + jnp.clip(v_norm - old_vnorm, -cfg.e_clip, cfg.e_clip)
            c_loss = jnp.maximum((v_norm - ret_norm) ** 2, (v_clip - ret_norm) ** 2)
        else:
            c_loss = (v_norm - ret_norm) ** 2
        c_loss = jnp.mean(c_loss)
        entropy = jnp.mean(jnp.sum(log_sigma + 0.5 * np.log(2 * np.pi * np.e), -1))
        b_loss = jnp.mean(
            jnp.sum(
                jnp.maximum(mu - 1.1, 0) ** 2 + jnp.minimum(mu + 1.1, 0) ** 2, -1
            )
        )
        total = (
            a_loss + 0.5 * cfg.critic_coef * c_loss
            - cfg.entropy_coef * entropy + cfg.bounds_loss_coef * b_loss
        )
        kl = _policy_kl(old_mu, old_log_sigma, mu, log_sigma)
        return total, (a_loss, c_loss, entropy, b_loss, kl)

    def act(self, ts, obs, deterministic=True, key=None):
        nobs = (
            rms_normalize(ts.obs_rms, obs) if self.cfg.normalize_input else obs
        )
        carry, (mu, log_sigma, _) = self.network.apply(
            ts.params["policy"], nobs, ts.states
        )
        return mu  # single-shot; play() threads the carry via _play_step

    def _play_step(self, ts, obs, prev_done):
        """Eval step threading the LSTM carry (rl_games BasePlayer run()
        keeps rnn states across steps and zeroes them per done env,
        player.py get_action/reset semantics); the base PPO.play drives
        this so test=True on an LSTM checkpoint is truly recurrent."""
        mask = (1.0 - prev_done.astype(jnp.float32))[:, None]
        carry = tuple(x * mask for x in ts.states)
        nobs = (
            rms_normalize(ts.obs_rms, obs) if self.cfg.normalize_input else obs
        )
        new_carry, (mu, _, _) = self.network.apply(
            ts.params["policy"], nobs, carry
        )
        return mu, ts.replace(states=new_carry)
