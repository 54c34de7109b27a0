"""Random Network Adversary (RNA): a fixed random MLP that perturbs the
policy's actions, forcing robustness to unmodeled control corruption.

TPU-native re-design of the reference's RNA (reference
isaacgymenvs/utils/rna_util.py:37-163 RandomNetworkAdversary; applied in
tasks/dextreme/allegro_hand_dextreme.py:860-895 with an annealed/
ADR-controlled mixing coefficient `rna_alpha`): a per-env dropout-masked
random MLP maps observations to binned-softmax actions.

Differences from the reference (documented divergences):
  * network weights are fixed host-side constants (closed over by the
    jitted step) instead of periodically refreshed device tensors; the
    per-env dropout masks ARE refreshed -- on every env reset -- which
    supplies the same per-env diversity the reference gets from weight
    refresh without mutating globals inside jit;
  * the binned softmax output is the expectation over bin centers rather
    than a categorical sample (deterministic given the mask; keeps the
    step bitwise reproducible).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class RandomNetworkAdversary:
    """obs (in_dim,) + per-env dropout mask -> adversarial action in
    [-1, 1]^num_actions via softmax-binned readout.

    Usage (inside vmapped per-env hooks):
        rna = RandomNetworkAdversary(in_dim, num_actions)
        mask = rna.sample_mask(key)          # at env reset, store in task
        a_rna = rna(mask, obs)               # every step
        a = (1 - alpha) * a_policy + alpha * a_rna
    """

    def __init__(
        self,
        in_dim: int,
        num_actions: int,
        hidden: int = 64,
        num_bins: int = 32,
        dropout: float = 0.5,
        seed: int = 0,
    ):
        self.in_dim = in_dim
        self.num_actions = num_actions
        self.hidden = hidden
        self.num_bins = num_bins
        self.dropout = dropout
        rng = np.random.default_rng(seed)

        def glorot(shape):
            s = np.sqrt(2.0 / sum(shape))
            return jnp.asarray(rng.normal(0.0, s, shape), jnp.float32)

        self.w1 = glorot((in_dim, hidden))
        self.b1 = glorot((hidden,))
        self.w2 = glorot((hidden, hidden))
        self.b2 = glorot((hidden,))
        self.w3 = glorot((hidden, num_actions * num_bins))
        self.bin_centers = jnp.linspace(-1.0, 1.0, num_bins)

    def sample_mask(self, key: jax.Array) -> jax.Array:
        """(2, hidden) per-env dropout masks (resample at env reset)."""
        keep = jax.random.bernoulli(key, 1.0 - self.dropout, (2, self.hidden))
        return keep.astype(jnp.float32) / (1.0 - self.dropout)

    def __call__(self, mask: jax.Array, x: jax.Array) -> jax.Array:
        h = jax.nn.relu(x @ self.w1 + self.b1) * mask[0]
        h = jax.nn.relu(h @ self.w2 + self.b2) * mask[1]
        logits = (h @ self.w3).reshape(self.num_actions, self.num_bins)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs @ self.bin_centers
