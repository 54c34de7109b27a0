from .networks import ActorCritic, CriticNet, MLP  # noqa: F401
from .amp import AMPAgent  # noqa: F401
from .hrl import HRL  # noqa: F401
from .ppo import PPO, PPOConfig, PPOTrainState  # noqa: F401
from .rnn import LSTMActorCritic, PPORecurrent  # noqa: F401
from .replay_buffer import ReplayBuffer, buffer_add_batch, buffer_sample  # noqa: F401
from .sac import SAC, SACConfig  # noqa: F401
from .running_stats import (  # noqa: F401
    RunningMeanStd,
    rms_denormalize,
    rms_normalize,
    rms_update,
)
