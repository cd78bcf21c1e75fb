#!/usr/bin/env python
"""Multi-seed robustness check of the NFE-reduction effect.

Usage: python scripts/nfe_multiseed.py [steps=600] [out.json]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nfe_study import run  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    out_path = sys.argv[2] if len(sys.argv) > 2 else "nfe_study_multiseed.json"
    out = []
    for seed in (0, 1, 2):
        print(f"=== seed {seed} ===", flush=True)
        base = run("none", 0.0, 0.0, steps, seed=seed)
        reg = run("unbiased", 100.0, 100.0, steps, seed=seed)
        rec = {
            "seed": seed,
            "none_nfe": base["final_eval_nfe"],
            "none_acc": base["final_eval_acc"],
            "reg_nfe": reg["final_eval_nfe"],
            "reg_acc": reg["final_eval_acc"],
            "reduction": base["final_eval_nfe"] / max(reg["final_eval_nfe"], 1),
        }
        out.append(rec)
        print("seed", seed, rec, flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
