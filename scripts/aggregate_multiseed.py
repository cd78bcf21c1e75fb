#!/usr/bin/env python
"""Aggregate multiseed science artifacts into one summary table.

Reads every ``paper_config_hard*.json`` (hard-task paper-tolerance ODE
study: reference config tol 1.4e-8, maxiters 10k) and
``sde_nfe_study*.json`` (MNIST-SDE config, w_reg from the reference
mlp.yml) in the repo root, and prints per-seed rows plus the
across-seed band for the headline observables:

- ODE: NFE reduction (none/unbiased final-eval NFE) and the accuracy
  gap at that reduction.
- SDE: drift-NFE reduction for the w_reg=1000 arm and its accuracy gap.

Usage: python scripts/aggregate_multiseed.py [out.json]
"""
import glob
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _band(xs):
    return {
        "n": len(xs),
        "min": min(xs),
        "max": max(xs),
        "mean": sum(xs) / len(xs),
    }


def collect_ode():
    rows = []
    for f in sorted(glob.glob(str(ROOT / "paper_config_hard*.json"))):
        arms = json.load(open(f))
        if not isinstance(arms, list) or len(arms) < 2:
            continue
        by = {a["regularize"]: a for a in arms}
        if "none" not in by or "unbiased" not in by:
            continue
        none, unb = by["none"], by["unbiased"]
        rows.append({
            "file": Path(f).name,
            "seed": unb.get("seed", 0),
            "nfe_none": none["final_eval_nfe"],
            "nfe_unbiased": unb["final_eval_nfe"],
            "nfe_reduction": none["final_eval_nfe"]
            / max(unb["final_eval_nfe"], 1),
            "acc_gap": unb["final_eval_acc"] - none["final_eval_acc"],
            "both_success": bool(
                none["all_train_success"] and unb["all_train_success"]
            ),
        })
    return rows


def collect_sde(arm_name="unbiased-1000", pattern="sde_nfe_study*.json"):
    rows = []
    for f in sorted(glob.glob(str(ROOT / pattern))):
        d = json.load(open(f))
        arms = {a["arm"]: a for a in d.get("arms", [])}
        if "none" not in arms or arm_name not in arms:
            continue
        none, unb = arms["none"], arms[arm_name]
        rows.append({
            "file": Path(f).name,
            "seed": d.get("meta", {}).get("seed", 0),
            "nfe_drift_none": none["final_eval_nfe_drift"],
            "nfe_drift_unbiased": unb["final_eval_nfe_drift"],
            "nfe_reduction": none["final_eval_nfe_drift"]
            / max(unb["final_eval_nfe_drift"], 1),
            "acc_gap": unb["final_eval_acc"] - none["final_eval_acc"],
        })
    return rows


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "multiseed_summary.json"
    ode, sde = collect_ode(), collect_sde()
    sde300 = collect_sde("unbiased-300", "sde_wreg300_s*.json")
    summary = {
        "ode_paper_tol_hard": {"rows": ode},
        "sde_wreg1000": {"rows": sde},
        "sde_wreg300": {"rows": sde300},
    }
    for key in summary:
        rows = summary[key]["rows"]
        if rows:
            summary[key]["nfe_reduction_band"] = _band(
                [r["nfe_reduction"] for r in rows]
            )
            summary[key]["acc_gap_band"] = _band([r["acc_gap"] for r in rows])
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    for key, blk in summary.items():
        print(f"== {key} ({len(blk['rows'])} seeds)")
        for r in blk["rows"]:
            print(f"  seed {r['seed']}: nfe_reduction={r['nfe_reduction']:.2f} "
                  f"acc_gap={r['acc_gap']:+.1f}")
        if "nfe_reduction_band" in blk:
            b, g = blk["nfe_reduction_band"], blk["acc_gap_band"]
            print(f"  band: nfe_reduction {b['min']:.2f}-{b['max']:.2f} "
                  f"(mean {b['mean']:.2f}), acc_gap {g['min']:+.1f}..{g['max']:+.1f}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
