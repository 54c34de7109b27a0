"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md section 4 test plan, item d).

Note: the axon sitecustomize registers the TPU platform before pytest
starts, so JAX_PLATFORMS in the env is already consumed; override via
jax.config instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
