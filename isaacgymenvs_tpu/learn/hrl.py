"""Hierarchical RL: a high-level policy emits latent commands; a frozen
pre-trained low-level controller (LLC) turns (llc_obs, latent) into motor
actions for `llc_steps` env steps per macro-action.

Parity target: reference isaacgymenvs/learning/hrl_continuous.py
(HRLAgent:56 -- high-level action space = llc latent_dim
_setup_action_space :111-114; frozen LLC loaded from checkpoint
_build_llc :116; env_step runs _llc_steps inner steps, averages rewards
and ORs dones :74-99; llc action from the deterministic policy mean
_compute_llc_action).

TPU-native design: the inner LLC loop is a `lax.scan` INSIDE the jitted
rollout step -- one compiled program still covers
horizon x llc_steps env transitions plus the PPO update. The LLC
parameters are frozen pytree constants (never in the train state), so
XLA constant-folds them into the rollout.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

import flax.linen as nn

from ..utils.checkpoint import load_checkpoint
from .networks import ActorCritic
from .ppo import PPO


class AMPLatentActor(nn.Module):
    """ASE/gen_amp-style latent-conditioned LLC actor (the reference's
    `eval_actor(obs, amp_latents=z)`, hrl_continuous.py:150 -- the
    gen_amp modules it imports are absent from the reference repo, so
    this follows the published ASE design): the L2-normalized latent is
    linearly embedded as a style vector and injected after the first
    obs trunk layer, rather than naively concatenated to the raw obs."""

    num_actions: int
    units: tuple = (256, 128, 64)
    latent_units: int = 64

    @nn.compact
    def __call__(self, obs, z):
        emb = nn.elu(nn.Dense(self.latent_units, name="latent_embed")(z))
        x = nn.elu(nn.Dense(self.units[0], name="fc0")(obs))
        x = jnp.concatenate([x, emb], axis=-1)
        for i, u in enumerate(self.units[1:]):
            x = nn.elu(nn.Dense(u, name=f"fc{i + 1}")(x))
        return nn.Dense(self.num_actions, name="mu")(x)


class HRL(PPO):
    """PPO over latent macro-actions with a frozen LLC executor.

    train cfg keys (reference cfg schema, hrl_continuous.py:58-71):
      llc_steps        -- low-level steps per macro action
      latent_dim       -- high-level action dimensionality
      llc_checkpoint   -- path to a PPO/AMP checkpoint for the LLC
                          (empty -> randomly initialized LLC, tests only)
      llc_obs_dim      -- leading obs dims the LLC consumes
                          (default: the full env obs)
      llc_network.mlp.units -- LLC trunk (must match the checkpoint)
    """

    def __init__(self, env, train_params: Dict[str, Any], seed: int = 0):
        cfg = train_params.get("config", {})
        self._llc_steps = int(cfg.get("llc_steps", 5))
        self._latent_dim = int(cfg.get("latent_dim", 8))
        self._llc_obs_dim = int(cfg.get("llc_obs_dim", env.num_obs))
        super().__init__(env, train_params, seed=seed)
        # the high-level policy's action space is the latent space
        net_cfg = train_params.get("network", {})
        mlp = net_cfg.get("mlp", {})
        space = net_cfg.get("space", {}).get("continuous", {})
        self.network = ActorCritic(
            num_actions=self._latent_dim,
            units=tuple(mlp.get("units", (256, 128, 64))),
            act=str(mlp.get("activation", "elu")),
            d2rl=bool(mlp.get("d2rl", False)),
            sigma_init=float(space.get("sigma_init", {}).get("val", 0.0)),
            separate=bool(net_cfg.get("separate", False)),
            learn_sigma=bool(space.get("learn_sigma", True)),
        )
        # frozen LLC
        llc_mlp = cfg.get("llc_network", {}).get("mlp", {})
        self._llc_style = str(cfg.get("llc_style", "amp_latent"))
        ckpt = str(cfg.get("llc_checkpoint", "") or "")
        if self._llc_style == "amp_latent":
            self.llc_network = AMPLatentActor(
                num_actions=env.num_acts,
                units=tuple(llc_mlp.get("units", (256, 128, 64))),
                latent_units=int(cfg.get("llc_latent_units", 64)),
            )
            dummy = (
                jnp.zeros((1, self._llc_obs_dim)),
                jnp.zeros((1, self._latent_dim)),
            )
        else:
            self.llc_network = ActorCritic(
                num_actions=env.num_acts,
                units=tuple(llc_mlp.get("units", (256, 128, 64))),
            )
            dummy = (
                jnp.zeros((1, self._llc_obs_dim + self._latent_dim)),
            )
        if ckpt:
            saved = load_checkpoint(ckpt)
            self.llc_params = jax.device_put(saved["params"]["policy"])
        else:
            self.llc_params = self.llc_network.init(
                jax.random.PRNGKey(seed + 101), *dummy
            )

    def _llc_action(self, obs, latent):
        """Deterministic LLC policy mean; the latent is L2-normalized to
        the unit hypersphere (reference z = normalize(actions) :148)."""
        z = latent / jnp.maximum(
            jnp.linalg.norm(latent, axis=-1, keepdims=True), 1e-8
        )
        llc_obs = obs[..., : self._llc_obs_dim]
        if self._llc_style == "amp_latent":
            return self.llc_network.apply(self.llc_params, llc_obs, z)
        mu, _, _ = self.llc_network.apply(
            self.llc_params, jnp.concatenate([llc_obs, z], axis=-1)
        )
        return mu

    def env_step(self, env_state, obs, latent):
        """llc_steps inner env transitions per macro action; mean reward,
        OR'd dones (reference hrl_continuous.py:74-99). Latents are
        clamped like the reference's preprocess_actions (:105-109); the
        LLC additionally normalizes them to the unit sphere."""
        latent = jnp.clip(latent, -1.0, 1.0)

        def body(carry, _):
            es, ob, rew_sum, done_any = carry
            a = self._llc_action(ob, latent)
            es, ob, r, d, ex = self.env.step(es, a)
            return (es, ob, rew_sum + r, done_any | d), ex

        n = obs.shape[0]
        carry = (env_state, obs, jnp.zeros(n), jnp.zeros(n, bool))
        (env_state, obs, rew_sum, done), extras_hist = jax.lax.scan(
            body, carry, None, length=self._llc_steps
        )
        extras = jax.tree.map(lambda x: x[-1], extras_hist)
        return env_state, obs, rew_sum / self._llc_steps, done, extras
