#!/usr/bin/env python
"""Compare the uninterrupted vs killed+resumed mnist_ode runs produced by
scripts/kill_resume_probe.sh and write kill_resume_parity.json.

Parity contract (round-5): the resumed run replays the exact batch stream
(loader skip_batches fast-forward), restores the best-eval marker, and
re-enters the identical jitted programs — so final checkpoints should
match the uninterrupted run leaf-for-leaf (bitwise on deterministic
hardware) and the eval trajectory should be identical from the resume
point on. Reference behavior being validated: main.jl:57-72 resume.
"""
import glob
import json
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def find_ckpt(subdir):
    hits = glob.glob(str(REPO / "checkpoints" / subdir / "*" / "model_current.ckpt"))
    if not hits:
        raise FileNotFoundError(f"no model_current.ckpt under {subdir}")
    return hits[0]


def evals_from_log(path):
    rows = {}
    for line in open(path, errors="replace"):
        m = re.search(r"\[eval @ (\d+)\] (\{.*\})", line)
        if m:
            try:
                rows[int(m.group(1))] = eval(m.group(2))  # repr'd dict of floats
            except Exception:
                pass
    return rows


def main():
    from localregneuralde_tpu.harness.checkpoint import load_checkpoint

    a = load_checkpoint(find_ckpt("killresume_full"))
    b = load_checkpoint(find_ckpt("killresume_cut"))
    import jax

    la = [x for x in jax.tree_util.tree_leaves(a["tstate"]) if hasattr(x, "shape")]
    lb = [x for x in jax.tree_util.tree_leaves(b["tstate"]) if hasattr(x, "shape")]
    max_abs = 0.0
    bitwise = len(la) == len(lb)
    for xa, xb in zip(la, lb):
        xa, xb = np.asarray(xa), np.asarray(xb)
        if xa.shape != xb.shape:
            bitwise = False
            continue
        if xa.dtype.kind in "fc":
            d = float(np.max(np.abs(xa - xb))) if xa.size else 0.0
            max_abs = max(max_abs, d)
            bitwise &= bool(np.array_equal(xa, xb))
        else:
            bitwise &= bool(np.array_equal(xa, xb))

    ev_full = evals_from_log(REPO / "logs" / "kr_full.log")
    ev_cut1 = evals_from_log(REPO / "logs" / "kr_cut1.log")
    ev_cut2 = evals_from_log(REPO / "logs" / "kr_cut2.log")
    ev_cut = dict(ev_cut1)
    ev_cut.update(ev_cut2)
    # accuracy deltas at every eval step both arms have
    acc_delta = {
        s: ev_cut[s]["accuracy_top1"] - ev_full[s]["accuracy_top1"]
        for s in sorted(set(ev_full) & set(ev_cut))
    }
    kill_step = max(ev_cut1) if ev_cut1 else None
    resume_steps = sorted(ev_cut2)

    out = {
        "final_step_full": int(a["step"]),
        "final_step_resumed": int(b["step"]),
        "best_marker_full": a.get("best"),
        "best_marker_resumed": b.get("best"),
        "checkpoint_bitwise_equal": bool(bitwise),
        "checkpoint_max_abs_param_diff": max_abs,
        "killed_after_eval_step": kill_step,
        "resumed_eval_steps": resume_steps[:3] + ["..."] if len(resume_steps) > 3 else resume_steps,
        "eval_acc_delta_by_step": acc_delta,
        "final_eval_full": ev_full.get(max(ev_full)) if ev_full else None,
        "final_eval_resumed": ev_cut.get(max(ev_cut)) if ev_cut else None,
    }
    with open(REPO / "kill_resume_parity.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps(out, indent=1, default=str))


if __name__ == "__main__":
    main()
