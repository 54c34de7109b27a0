#!/usr/bin/env python
"""Extract round-5 parity-run artifacts from PARITY.json into docs/curves/.

For each selected row writes docs/curves/<key>_curve.json with the
training curve, the success-eval series, and (when present) the
env-metrics series — which carries the DeXtreme ADR range-entropy
('adr_nats', reference adr_vec_task.py:767) and the IndustReal SBC
state ('curr_max_disp' descending, industreal_algo_utils.py:284-344).
"""
import json
import os
import sys

KEYS = sys.argv[1:] or [
    "FactoryTaskNutBoltScrew",
    "AllegroHandADR",
    "AllegroHand",
    "IndustRealTaskPegsInsert",
    "Trifinger",
    "BallBalance_s3",
    "Ingenuity_s2",
]

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
data = json.load(open("PARITY.json"))
for k in KEYS:
    r = data.get(k)
    if not r or "error" in r:
        print(f"skip {k}: {None if not r else r['error']}")
        continue
    out = {
        "task": k,
        "metric": r.get("metric", "return"),
        "milestone": r.get("milestone"),
        "frames_to_milestone": r.get("frames_to_milestone"),
        "within_reference_budget": r.get("within_reference_budget"),
        "final_frames": r.get("final_frames"),
        "fps": r.get("fps"),
        "curve": r.get("curve"),
        "success_evals": r.get("success_evals") or r.get(
            "deterministic_evals"),
    }
    emc = r.get("env_metrics_curve")
    if emc:
        # transpose [frames, {k: v}] rows into named series
        names = sorted({n for _, d in emc for n in d})
        out["env_metrics"] = {
            "frames": [f for f, _ in emc],
            **{n: [d.get(n) for _, d in emc] for n in names},
        }
    path = f"docs/curves/{k}_curve.json"
    json.dump(out, open(path, "w"))
    print(f"wrote {path}: final_frames={out['final_frames']} "
          f"hit={out['frames_to_milestone']}")
