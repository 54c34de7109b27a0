"""Asset root resolution.

The framework consumes the standard IsaacGymEnvs asset tree (MJCF/URDF robot
descriptions, AMP motion captures) as DATA. Resolution order:
  1. $ISAACGYMENVS_TPU_ASSETS
  2. <repo>/assets (if present)
  3. /root/reference/assets (the mounted reference checkout)

Mirrors the reference's task-relative asset resolution with cfg override
(reference isaacgymenvs/tasks/ant.py:139-147, cfg/task/Ant.yaml:36-37).
"""
from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def asset_root() -> str:
    env = os.environ.get("ISAACGYMENVS_TPU_ASSETS")
    if env and os.path.isdir(env):
        return env
    local = os.path.join(_REPO_ROOT, "assets")
    if os.path.isdir(local):
        return local
    ref = "/root/reference/assets"
    if os.path.isdir(ref):
        return ref
    raise FileNotFoundError(
        "no asset tree found; set $ISAACGYMENVS_TPU_ASSETS to an IsaacGymEnvs "
        "assets directory"
    )


def asset_path(rel: str) -> str:
    return os.path.join(asset_root(), rel)
