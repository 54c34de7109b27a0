"""isaacgymenvs_tpu: a TPU-native vectorized robotics-RL framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of NVIDIA
IsaacGymEnvs (reference layer map in SURVEY.md): a batched generalized-
coordinate rigid-body engine, the task suite, domain randomization, and an
in-repo PPO/SAC learner, sharded over TPU meshes.
"""

__version__ = "0.1.0"

import jax as _jax

# Physics in float32 is the correctness contract (BASELINE.md: bitwise
# trajectories); TPU matmuls otherwise default to bfloat16 passes. Neural-net
# layers that want bf16 opt in explicitly with dtype/precision annotations.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import maths  # noqa: F401
