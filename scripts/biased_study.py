#!/usr/bin/env python
"""Biased vs unbiased local regularization, trained head-to-head.

The paper's biased variant samples t1 from the solver's accepted grid
(cheaper: reuses a visited point) instead of uniformly. Compare NFE
reduction at matched accuracy. Usage: python scripts/biased_study.py [steps]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nfe_study import run  # noqa: E402

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
out = []
for reg, w in (("none", 0.0), ("unbiased", 30.0), ("biased", 30.0)):
    print(f"=== {reg} w={w} ===", flush=True)
    r = run(reg, w, w, steps)
    out.append(
        {
            "regularize": reg, "w_reg": w,
            "final_eval_nfe": r["final_eval_nfe"],
            "final_eval_acc": r["final_eval_acc"],
        }
    )
    print(out[-1], flush=True)
base = out[0]["final_eval_nfe"]
for r in out[1:]:
    r["reduction"] = base / max(r["final_eval_nfe"], 1)
with open("biased_study.json", "w") as f:
    json.dump(out, f, indent=1)
for r in out:
    print(r)
