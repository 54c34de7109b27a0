from .networks import ActorCritic, MLP  # noqa: F401
from .ppo import PPO, PPOConfig, PPOTrainState  # noqa: F401
from .running_stats import (  # noqa: F401
    RunningMeanStd,
    rms_denormalize,
    rms_normalize,
    rms_update,
)
