"""Multi-chip sharding: envs shard over the device mesh, learner params
replicate; XLA compiles the gradient all-reduce into the train step.

TPU-native replacement for the reference's one-process-per-GPU
torchrun/NCCL data parallelism (reference README.md:165-172, rank plumbing
utils/rlgames_utils.py:89-107; SURVEY.md sections 2.5 and 5.8). There are
no ranks and no explicit collectives here: a single jitted program over a
`Mesh(('env',))` with NamedSharding-annotated inputs; rollout stays fully
sharded (each chip's envs never leave it), only gradients/metrics reduce.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ENV_AXIS = "env"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the local devices with a single 'env' axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (ENV_AXIS,))


def env_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _tree_of(tree, sharding):
    return jax.tree.map(lambda _: sharding, tree)


def env_state_sharding(env_state, mesh: Mesh):
    """Sharding pytree for an EnvState: every per-env leaf on the env axis,
    the scalar rng key replicated."""
    env_ax, rep = env_sharded(mesh), replicated(mesh)
    return env_state.replace(
        sim=_tree_of(env_state.sim, env_ax),
        progress=env_ax,
        reset_buf=env_ax,
        rng=rep,
        actions=env_ax,
        task=_tree_of(env_state.task, env_ax),
        dr=_tree_of(env_state.dr, env_ax),
        randomize_buf=(
            env_ax if env_state.randomize_buf is not None else None
        ),
        frames=rep if env_state.frames is not None else None,
        # AdrState: population-level range/queue arrays replicate, the
        # per-env worker-mode assignment shards on the env axis
        adr=(
            env_state.adr.replace(
                lo=rep, hi=rep, queues=rep, counts=rep,
                worker_boundary=env_ax, nats=rep,
            )
            if env_state.adr is not None
            else None
        ),
    )


def train_state_sharding(ts, mesh: Mesh):
    """Sharding pytree for a PPOTrainState: params/opt/normalizers
    replicated, env-batched leaves sharded on the env axis."""
    env_ax, rep = env_sharded(mesh), replicated(mesh)
    return ts.replace(
        params=_tree_of(ts.params, rep),
        opt_state=_tree_of(ts.opt_state, rep),
        lr=rep,
        obs_rms=_tree_of(ts.obs_rms, rep),
        value_rms=_tree_of(ts.value_rms, rep),
        env_state=env_state_sharding(ts.env_state, mesh),
        obs=env_ax,
        key=rep,
        ep_return=env_ax,
        ep_len=env_ax,
        states=env_ax if ts.states is not None else None,
        state_rms=_tree_of(ts.state_rms, rep),
    )


def shard_train_state(ts, mesh: Mesh):
    """Place a host/single-device PPOTrainState onto the mesh."""
    return jax.device_put(ts, train_state_sharding(ts, mesh))
