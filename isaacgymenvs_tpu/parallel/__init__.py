from .sharding import (  # noqa: F401
    ENV_AXIS,
    env_sharded,
    env_state_sharding,
    make_mesh,
    replicated,
    shard_train_state,
    train_state_sharding,
)
