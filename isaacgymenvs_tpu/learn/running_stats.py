"""Running mean/std normalizers as pytrees (pure functional).

TPU-native equivalent of rl_games' RunningMeanStd modules that the
reference relies on via `normalize_input` / `normalize_value`
(reference cfg/train/AntPPO.yaml:49-50; SURVEY.md section 2.4). Parallel
Welford/Chan merge so updates are a single batched reduction; under a
sharded env axis the batch moments reduce with a `pmean` inserted by XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jax.Array  # (d,) or ()
    var: jax.Array
    count: jax.Array  # () float

    @classmethod
    def create(cls, shape=()):
        return cls(
            mean=jnp.zeros(shape),
            var=jnp.ones(shape),
            count=jnp.asarray(1e-4),
        )


def rms_update(rms: RunningMeanStd, batch: jax.Array) -> RunningMeanStd:
    """Merge the moments of `batch` (reduced over ALL leading axes) into rms."""
    d = rms.mean.ndim
    red = tuple(range(batch.ndim - d))
    batch_mean = jnp.mean(batch, axis=red)
    batch_var = jnp.var(batch, axis=red)
    batch_count = jnp.asarray(batch.size / max(rms.mean.size, 1), jnp.float32)

    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m_a = rms.var * rms.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta * delta * rms.count * batch_count / tot
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


def rms_normalize(rms: RunningMeanStd, x: jax.Array, clip: float = 5.0) -> jax.Array:
    y = (x - rms.mean) / jnp.sqrt(rms.var + 1e-5)
    return jnp.clip(y, -clip, clip)


def rms_denormalize(rms: RunningMeanStd, y: jax.Array) -> jax.Array:
    return y * jnp.sqrt(rms.var + 1e-5) + rms.mean
