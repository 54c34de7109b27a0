"""Checkpoint save/restore.

Mirrors the reference's checkpoint contract (SURVEY.md section 5.4): model
params + optimizer state + normalizer stats + env-side curriculum state +
frame counter round-trip through one file, loadable via the `checkpoint=`
CLI flag (reference train.py:106-108).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax


def save_checkpoint(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_tree = jax.device_get(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_tree, f)
    os.replace(tmp, path)  # atomic (safe_save semantics, ref pbt/pbt.py:42)


class _CheckpointUnpickler(pickle.Unpickler):
    """Restricted unpickler: checkpoints are data-only pytrees (dicts,
    numpy arrays, flax structs, optax states), so only a vetted set of
    module prefixes may be deserialized. Loading a tampered file raises
    instead of executing arbitrary reduce callables (the classic
    pickle.load RCE). Matches the reference's torch.load trust model but
    with the import surface actually closed."""

    _ALLOWED_PREFIXES = (
        "builtins",
        "collections",
        "numpy",
        "jax",
        "jaxlib",
        "flax",
        "optax",
        "isaacgymenvs_tpu",
    )

    def find_class(self, module: str, name: str):
        root = module.split(".")[0]
        if root not in self._ALLOWED_PREFIXES:
            raise pickle.UnpicklingError(
                f"checkpoint references disallowed type {module}.{name}; "
                "only data-only pytree types are deserializable"
            )
        if module == "builtins" and name in ("eval", "exec", "compile",
                                             "open", "__import__"):
            raise pickle.UnpicklingError(f"builtins.{name} is not allowed")
        return super().find_class(module, name)


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        return _CheckpointUnpickler(f).load()
