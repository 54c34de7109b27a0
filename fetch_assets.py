#!/usr/bin/env python
"""Fetch the IsaacGymEnvs asset tree (the framework consumes it as data).

The assets (MJCF/URDF robot descriptions, Factory/IndustReal meshes, AMP
motion captures, ~167 MB) are published in the upstream IsaacGymEnvs
repository under their own licenses (assets/licenses/) and are not
vendored here. This script clones them into <repo>/assets, which
utils/assets.py resolves automatically (or set $ISAACGYMENVS_TPU_ASSETS).

Usage:
    python fetch_assets.py [--ref <git-ref>] [--dest assets]
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

UPSTREAM = "https://github.com/isaac-sim/IsaacGymEnvs.git"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="main")
    ap.add_argument(
        "--dest",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets"),
    )
    args = ap.parse_args()
    if os.path.isdir(args.dest) and os.listdir(args.dest):
        print(f"{args.dest} already populated; nothing to do")
        return 0
    with tempfile.TemporaryDirectory() as tmp:
        print(f"cloning {UPSTREAM} @ {args.ref} (sparse: assets/) ...")
        subprocess.check_call(
            ["git", "clone", "--depth", "1", "--branch", args.ref,
             "--filter=blob:none", "--sparse", UPSTREAM, tmp]
        )
        subprocess.check_call(["git", "-C", tmp, "sparse-checkout", "set", "assets"])
        src = os.path.join(tmp, "assets")
        if not os.path.isdir(src):
            print("upstream checkout has no assets/ directory", file=sys.stderr)
            return 1
        shutil.copytree(src, args.dest)
    print(f"assets installed at {args.dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
