"""Policy / value networks (flax).

TPU-native equivalent of the rl_games `actor_critic` network builder the
reference configures via cfg/train/*.yaml `params.network` (shared MLP
trunk, mu head, state-independent log-sigma, value head; SURVEY.md
section 2.4). Batch sizes are num_envs*horizon (tens of thousands), so
every layer is an MXU-friendly wide matmul.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACT = {
    "elu": nn.elu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "selu": nn.selu,
    "swish": nn.swish,
    "gelu": nn.gelu,
    "sigmoid": nn.sigmoid,
    "None": lambda x: x,
}


def activation(name: str) -> Callable:
    return _ACT[name]


class MLP(nn.Module):
    units: Sequence[int]
    act: str = "elu"
    d2rl: bool = False  # dense-skip variant (cfg/train/AntPPO.yaml:27)

    @nn.compact
    def __call__(self, x):
        inp = x
        for i, u in enumerate(self.units):
            if self.d2rl and i > 0:
                x = jnp.concatenate([x, inp], axis=-1)
            x = nn.Dense(u, name=f"fc{i}")(x)
            x = _ACT[self.act](x)
        return x


class ActorCritic(nn.Module):
    """Shared-trunk continuous actor-critic (`separate: False` +
    `fixed_sigma: True` rl_games layout, cfg/train/AntPPO.yaml:12-24)."""

    num_actions: int
    units: Sequence[int] = (256, 128, 64)
    act: str = "elu"
    d2rl: bool = False
    sigma_init: float = 0.0  # const_initializer val (AntPPO.yaml:21-22)
    separate: bool = False
    learn_sigma: bool = True  # False -> fixed log-std (AMP configs)

    @nn.compact
    def __call__(self, obs) -> Tuple[jax.Array, jax.Array, jax.Array]:
        trunk = MLP(self.units, self.act, self.d2rl, name="actor_mlp")(obs)
        if self.separate:
            ctrunk = MLP(self.units, self.act, self.d2rl, name="critic_mlp")(obs)
        else:
            ctrunk = trunk
        mu = nn.Dense(self.num_actions, name="mu")(trunk)
        value = nn.Dense(1, name="value")(ctrunk)[..., 0]
        if self.learn_sigma:
            log_sigma = self.param(
                "log_sigma",
                nn.initializers.constant(self.sigma_init),
                (self.num_actions,),
            )
        else:
            log_sigma = jnp.full((self.num_actions,), self.sigma_init)
        log_sigma = jnp.broadcast_to(log_sigma, mu.shape)
        return mu, log_sigma, value


class CriticNet(nn.Module):
    """Standalone value network on privileged states -- the asymmetric
    central value net (rl_games central_value_config, e.g. reference
    cfg/train/ShadowHandPPOAsymm.yaml:73-90)."""

    units: Sequence[int] = (256, 128, 64)
    act: str = "elu"

    @nn.compact
    def __call__(self, states) -> jax.Array:
        x = MLP(self.units, self.act, name="cv_mlp")(states)
        return nn.Dense(1, name="value")(x)[..., 0]
