#!/usr/bin/env python
"""Run just the regularized arm of the paper-tolerance config for N steps.
Usage: python scripts/run_unbiased_full.py [steps=3000] [out.json]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from paper_config_run import run  # noqa: E402

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
out = sys.argv[2] if len(sys.argv) > 2 else "paper_config_unbiased_full.json"
r = run("unbiased", steps, 512)
with open(out, "w") as f:
    json.dump(r, f, indent=1)
print("final_nfe", r["final_eval_nfe"], "acc", r["final_eval_acc"],
      "wall", round(r["wall_s"], 1))
