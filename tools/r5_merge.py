#!/usr/bin/env python
"""Merge round-5 PARITY snapshots (concurrent parity.py invocations each
rewrite PARITY.json from their own start-of-run snapshot; last-writer
wins and can drop rows written in between). Union of all snapshots,
preferring entries with curves over error/partial ones, then regenerate
PARITY.md."""
import glob
import json
import sys

sys.path.insert(0, "/root/repo")
from parity import write_md  # noqa: E402

paths = ["PARITY.json"] + sorted(glob.glob("runs/r5/PARITY_*.json"))
merged = {}
for p in paths:
    try:
        d = json.load(open(p))
    except Exception:
        continue
    for k, v in d.items():
        cur = merged.get(k)
        if cur is None:
            merged[k] = v
            continue
        # prefer a completed row (has a curve) over error/partial
        if "curve" in v and "curve" not in cur:
            merged[k] = v
        elif "curve" in v and "curve" in cur:
            # prefer the one that trained further
            if v.get("final_frames", 0) >= cur.get("final_frames", 0):
                merged[k] = v

# keep error rows honest but one-line
for k, v in merged.items():
    if "error" in v:
        v["error"] = v["error"].splitlines()[0][:160]

json.dump(merged, open("PARITY.json", "w"), indent=1)
write_md(merged)
print("merged rows:", sorted(merged))
