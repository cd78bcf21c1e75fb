#!/usr/bin/env python
"""Combine the round-5 full-31,250-step CIFAR arms (run as separate
crash-isolated invocations) into one cell artifact with reductions.

Each arm's summary JSON is preferred; if an arm was cut short (wall-clock
budget), its eval trajectory is parsed from the study stdout log instead
and the row is marked partial with the last completed eval step.

Usage: python scripts/cifar_full_combine.py none.json unb.json \
         [none.log unb.log] [out.json]
"""
import json
import re
import sys
from pathlib import Path


def evals_from_log(path):
    rows = []
    pat = re.compile(
        r"\[eval @ (\d+)\] \{(.*)\}"
    )
    for line in open(path, errors="replace"):
        m = pat.search(line)
        if not m:
            continue
        d = {}
        for kv in re.finditer(r"'([a-z_0-9]+)': ([0-9.eE+-]+)", m.group(2)):
            d[kv.group(1)] = float(kv.group(2))
        d["step"] = int(m.group(1))
        rows.append(d)
    return rows


def arm_row(json_path, log_path):
    p = Path(json_path)
    if p.exists():
        arms = json.load(open(p))
        if arms:
            a = arms[0]
            row = {
                "regularize": a["regularize"],
                "w_reg": a["w_reg"],
                "steps_completed": a["steps"],
                "partial": False,
                "best_eval_acc": a["best_eval_acc"],
                "final_eval_acc": a["final_eval"]["accuracy_top1"],
                "final_eval_nfe": a["final_eval"]["nfe"],
                "wall_s": a["wall_s"],
                "final_eval_running_bn": a.get("final_eval_running_bn"),
            }
            return row, None
    if log_path and Path(log_path).exists():
        ev = evals_from_log(log_path)
        if ev:
            best = max(ev, key=lambda d: d["accuracy_top1"])
            last = ev[-1]
            return {
                "partial": True,
                "steps_completed": last["step"],
                "best_eval_acc": best["accuracy_top1"],
                "final_eval_acc": last["accuracy_top1"],
                "final_eval_nfe": last["nfe"],
                "eval_trajectory": ev,
            }, None
    return None, f"no artifact for {json_path}"


def main():
    none_json = sys.argv[1] if len(sys.argv) > 1 else "cifar_full31250_hard_none.json"
    unb_json = sys.argv[2] if len(sys.argv) > 2 else "cifar_full31250_hard_unb.json"
    none_log = sys.argv[3] if len(sys.argv) > 3 else "/tmp/cifar_none.log"
    unb_log = sys.argv[4] if len(sys.argv) > 4 else "/tmp/cifar_unb.log"
    out = sys.argv[5] if len(sys.argv) > 5 else "cifar_full31250_hard.json"

    none_row, e1 = arm_row(none_json, none_log)
    unb_row, e2 = arm_row(unb_json, unb_log)
    doc = {
        "protocol": (
            "full reference schedule (total_steps 31250, uncompressed "
            "cosine cycle 31250, eval every 2500), hard synthetic, "
            "bn_eval_stats=batch de-confounded protocol + default "
            "running-stats eval of the best ckpt alongside, seed 0"
        ),
        "none": none_row,
        "unbiased_2p5": unb_row,
        "errors": [e for e in (e1, e2) if e],
    }
    if none_row and unb_row:
        doc["nfe_reduction"] = round(
            none_row["final_eval_nfe"] / max(unb_row["final_eval_nfe"], 1.0), 3
        )
        doc["acc_gap"] = round(
            unb_row["best_eval_acc"] - none_row["best_eval_acc"], 3
        )
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v for k, v in doc.items()
                      if k != "none" or True}, indent=1, default=str)[:2000])


if __name__ == "__main__":
    main()
