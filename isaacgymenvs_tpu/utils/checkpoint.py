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


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
