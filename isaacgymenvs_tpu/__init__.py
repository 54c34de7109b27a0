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

# Persistent compilation cache: the fused whole-step Mosaic kernels and the
# jitted PPO epoch take tens of seconds to compile; caching them on disk
# makes every later train/bench/test invocation start in seconds. Opt out
# with IGE_TPU_NO_COMPILE_CACHE=1 (e.g. when benchmarking compile time).
import os as _os

if not _os.environ.get("IGE_TPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", "isaacgymenvs_tpu_xla"
        ),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: run uncached
        pass

from . import maths  # noqa: F401


def make(
    seed: int = 0,
    task: str = "Cartpole",
    num_envs: int | None = None,
    sim_device: str = "tpu",
    rl_device: str = "tpu",
    headless: bool = True,
    cfg=None,
    **override_kwargs,
):
    """Library API: construct a ready-to-step vectorized env.

    Mirrors `isaacgymenvs.make()` (reference isaacgymenvs/__init__.py:14-55):
    composes the task config (unless an explicit `cfg` dict is given),
    applies overrides, returns the VecTask. The returned env exposes the
    pure `reset(rng)` / `step(state, actions)` functions plus
    num_envs/num_obs/num_acts.
    """
    from .tasks import task_map
    from .utils.config import load_config

    overrides = [f"task={task}", f"seed={seed}"]
    if num_envs is not None:
        overrides.append(f"num_envs={num_envs}")
    overrides += [f"{k}={v}" for k, v in override_kwargs.items()]
    full = load_config(overrides) if cfg is None else {"task": cfg}
    if sim_device.startswith("cpu"):
        _jax.config.update("jax_platforms", "cpu")
    name = task
    if name not in task_map:
        # variant configs alias an implemented class via their name: field
        name = full["task"].get("name", name)
    return task_map[name](full["task"])
