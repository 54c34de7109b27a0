"""AMP agent: PPO + adversarial motion-prior discriminator.

Parity target: reference isaacgymenvs/learning/amp_continuous.py (disc BCE
loss with logit regularization, gradient penalty on demos and weight decay
_disc_loss :393-430; style reward -log(1-sigmoid) _calc_disc_rewards
:505-511; reward mix task_reward_w*r + disc_reward_w*r_disc
_combine_rewards :488; demo fetch via env callback _fetch_amp_obs_demo
:449) + amp_network_builder.py (disc MLP + single logit :93). Config keys
follow cfg/train/HumanoidAMPPPO.yaml.

The discriminator trains inside the same jitted minibatch loop as the
policy (one optimizer, disc_coef-weighted loss, like rl_games)."""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .networks import MLP
from .ppo import PPO, PPOTrainState
from .running_stats import RunningMeanStd, rms_normalize, rms_update


class Discriminator(nn.Module):
    units: tuple = (1024, 512)
    act: str = "relu"

    @nn.compact
    def __call__(self, amp_obs):
        x = MLP(self.units, self.act, name="disc_mlp")(amp_obs)
        return nn.Dense(1, name="disc_logits")(x)[..., 0]


class AMPAgent(PPO):
    capture_extras = ("amp_obs",)

    def __init__(self, env, train_params: Dict[str, Any], seed: int = 0):
        c = train_params.get("config", {})
        self.task_reward_w = float(c.get("task_reward_w", 0.0))
        self.disc_reward_w = float(c.get("disc_reward_w", 1.0))
        self.disc_reward_scale = float(c.get("disc_reward_scale", 2.0))
        self.disc_coef = float(c.get("disc_coef", 5.0))
        self.disc_logit_reg = float(c.get("disc_logit_reg", 0.05))
        self.disc_grad_penalty = float(c.get("disc_grad_penalty", 5.0))
        self.disc_weight_decay = float(c.get("disc_weight_decay", 1e-4))
        self.amp_batch_size = int(c.get("amp_batch_size", 512))
        self.amp_minibatch_size = int(c.get("amp_minibatch_size", 4096))
        self.normalize_amp_input = bool(c.get("normalize_amp_input", True))
        disc_cfg = train_params.get("network", {}).get("disc", {})
        self.disc_net = Discriminator(
            units=tuple(disc_cfg.get("units", (1024, 512))),
            act=str(disc_cfg.get("activation", "relu")),
        )
        super().__init__(env, train_params, seed)
        assert hasattr(env, "fetch_amp_obs_demo"), "AMP needs a demo sampler"
        self.num_amp_obs = env.num_amp_obs

    def init(self) -> PPOTrainState:
        ts = super().init()
        key, kd = jax.random.split(ts.key)
        dummy = jnp.zeros((1, self.num_amp_obs))
        params = dict(ts.params)
        params["disc"] = self.disc_net.init(kd, dummy)
        params["amp_rms"] = RunningMeanStd.create((self.num_amp_obs,))
        # amp_rms is data, not weights: freeze by masking its gradient in
        # extra_loss (it only updates through shape_rollout_rewards)
        return ts.replace(params=params, opt_state=self.tx.init(params))

    # -- helpers ---------------------------------------------------------
    def _norm_amp(self, rms, x):
        return rms_normalize(rms, x) if self.normalize_amp_input else x

    # -- style reward -----------------------------------------------------
    def shape_rollout_rewards(self, ts, traj):
        amp_obs = traj.extras["amp_obs"]  # (T, N, A)
        params = ts.params
        rms = params["amp_rms"]
        if self.normalize_amp_input:
            rms = rms_update(rms, amp_obs)
            params = {**params, "amp_rms": rms}
            ts = ts.replace(params=params)
        namp = self._norm_amp(rms, amp_obs)
        logits = self.disc_net.apply(params["disc"], namp)
        prob = jax.nn.sigmoid(logits)
        disc_r = (
            -jnp.log(jnp.maximum(1.0 - prob, 1e-4)) * self.disc_reward_scale
        )
        combined = (
            self.task_reward_w * traj.reward + self.disc_reward_w * disc_r
        )
        traj = traj._replace(reward=combined)
        return ts, traj, {"disc_reward_mean": jnp.mean(disc_r)}

    # -- discriminator training -------------------------------------------
    def extra_dataset(self, ts, traj, flat) -> tuple:
        # (B, A) raw, or (S, B/S, A) under local_shuffle's shard-blocked
        # layout -- demos are drawn flat and reshaped to match
        amp_obs = flat(traj.extras["amp_obs"])
        # fresh demo windows sampled INSIDE the jitted epoch (the reference
        # refills its demo buffer each epoch, _fetch_amp_obs_demo :449)
        demo_key = jax.random.fold_in(ts.key, 7)
        n_rows = amp_obs.shape[0] * (
            amp_obs.shape[1] if amp_obs.ndim == 3 else 1
        )
        demos = self.env.fetch_amp_obs_demo(demo_key, n_rows)
        return (amp_obs, demos.reshape(amp_obs.shape))

    def extra_loss(self, params, batch_extra):
        amp_agent, demos = batch_extra
        rms = jax.lax.stop_gradient(params["amp_rms"])
        k = min(self.amp_minibatch_size, amp_agent.shape[0])
        agent_obs = self._norm_amp(rms, amp_agent[:k])
        demo_obs = self._norm_amp(rms, demos[:k])

        d_agent = self.disc_net.apply(params["disc"], agent_obs)
        # gradient penalty on demo observations (_disc_loss:415-424)
        def demo_logit_sum(x):
            return jnp.sum(self.disc_net.apply(params["disc"], x))

        d_demo, demo_grad = jax.value_and_grad(demo_logit_sum)(demo_obs)
        grad_pen = jnp.mean(jnp.sum(demo_grad**2, axis=-1))
        d_demo_each = self.disc_net.apply(params["disc"], demo_obs)

        # BCE: agent -> 0, demo -> 1
        loss_agent = jnp.mean(jax.nn.softplus(d_agent))
        loss_demo = jnp.mean(jax.nn.softplus(-d_demo_each))
        bce = 0.5 * (loss_agent + loss_demo)

        logit_w = params["disc"]["params"]["disc_logits"]["kernel"]
        logit_reg = jnp.sum(logit_w**2)
        mlp_decay = sum(
            jnp.sum(w["kernel"] ** 2)
            for w in params["disc"]["params"]["disc_mlp"].values()
        )
        disc_loss = (
            bce
            + self.disc_logit_reg * logit_reg
            + 0.5 * self.disc_grad_penalty * grad_pen
            + self.disc_weight_decay * mlp_decay
        )
        acc = 0.5 * (
            jnp.mean((d_agent < 0).astype(jnp.float32))
            + jnp.mean((d_demo_each > 0).astype(jnp.float32))
        )
        return self.disc_coef * disc_loss, {"disc_acc": acc}

