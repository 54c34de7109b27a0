"""Fixed-size device-resident replay buffer (dict-of-arrays ring).

TPU-native equivalent of the reference's GPU-tensor ring buffer
(reference isaacgymenvs/learning/replay_buffer.py:32-116): store/sample as
pure functions over a pytree so the whole SAC update stays jitted.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    data: Dict[str, jax.Array]  # each (capacity, ...)
    idx: jax.Array  # () next write position
    size: jax.Array  # () current fill level
    capacity: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, capacity: int, specs: Dict[str, tuple]) -> "ReplayBuffer":
        data = {
            k: jnp.zeros((capacity,) + tuple(shape)) for k, shape in specs.items()
        }
        return cls(
            data=data,
            idx=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
            capacity=capacity,
        )


def buffer_add_batch(buf: ReplayBuffer, batch: Dict[str, jax.Array]) -> ReplayBuffer:
    """Insert a batch of n transitions (ring semantics, n << capacity)."""
    n = next(iter(batch.values())).shape[0]
    pos = (buf.idx + jnp.arange(n)) % buf.capacity
    data = {k: buf.data[k].at[pos].set(v) for k, v in batch.items()}
    return buf.replace(
        data=data,
        idx=(buf.idx + n) % buf.capacity,
        size=jnp.minimum(buf.size + n, buf.capacity),
    )


def buffer_sample(buf: ReplayBuffer, key, batch_size: int) -> Dict[str, jax.Array]:
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return {k: v[idx] for k, v in buf.data.items()}
