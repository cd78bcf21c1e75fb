#!/usr/bin/env python
"""NFE-reduction study for the PhysioNet latent-ODE family — the paper's
fourth experiment (reference: experiments/physionet/main.jl + physionet.yml).

Runs the SHIPPED experiment configuration end-to-end through the latent
runner (same path as `python experiments/physionet/main.py`) with and
without local unbiased (error-estimate) regularization, at the reference's
exact hyperparameters (tol 1.4e-8, maxiters 10,000, adamax, inverse-decay
LR, w_reg 100->10 exponential), and compares eval-mode NFE at matched
masked-MSE. Default steps = the FULL reference schedule (3,000).

The dataset is the synthetic irregular-time-series stand-in unless a real
physionet.npz is present (zero egress; the loader takes either).

Usage: python scripts/latent_nfe_study.py [steps] [out.json] [arms...]
  arms default: none unbiased:100:10
  arm syntax:   none | unbiased:W0:W1 | biased:W0:W1 (exponential decay W0->W1)
  LRN_SEED=k   env var sets the training seed for every arm (default 0)
  LRN_HARD=1   env var switches the synthetic stand-in to the 'hard'
               difficulty (multi-scale latent + observation noise) so the
               trained baseline's NFE sits well off the adaptive-solver
               floor at tol 1.4e-8 and the comparison discriminates
  LRN_STEPS_PER_CALL=K  sets train.steps_per_call (must divide the
               shipped print_frequency=10 and evaluate_every=100)
"""
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

if os.environ.get("LRN_CPU"):
    jax.config.update("jax_platforms", "cpu")

from localregneuralde_tpu.harness import define_configuration
from localregneuralde_tpu.harness.latent_runner import run_latent_ode_experiment

CONFIG = REPO / "experiments" / "physionet" / "physionet.yaml"


def parse_arm(spec):
    if spec == "none":
        # w_reg is inert with regularize='none'; 1.0 keeps the shipped
        # exponential-decay schedule constructible (log(w0/w1) at 0/0 dies)
        return ("none", 1.0, 1.0)
    kind, w0, w1 = spec.split(":")
    return (kind, float(w0), float(w1))


def run_arm(reg, w0, w1, steps, subdir, seed=0, difficulty="easy"):
    cfg = define_configuration([], str(CONFIG))
    cfg.model.model_type = "time_series"
    cfg.dataset.difficulty = difficulty
    if os.environ.get("LRN_STEPS_PER_CALL"):
        cfg.train.steps_per_call = int(os.environ["LRN_STEPS_PER_CALL"])
    cfg.model.regularize = reg
    cfg.loss.w_reg_start = w0
    cfg.loss.w_reg_end = w1
    cfg.seed = seed
    cfg.train.total_steps = steps
    # keep the shipped eval cadence valid for short runs
    cfg.train.evaluate_every = min(cfg.train.evaluate_every, steps)
    cfg.train.expt_subdir = subdir
    tag = f"{reg}_w{w0:g}to{w1:g}_s{seed}"
    t0 = time.time()
    summary = run_latent_ode_experiment(cfg, f"lns_{tag}")
    summary["wall_s"] = time.time() - t0
    summary["regularize"] = reg
    summary["w_reg"] = [w0, w1]
    summary["seed"] = seed
    summary["steps"] = steps
    summary["difficulty"] = difficulty
    return summary


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "latent_nfe_study.json"
    arm_specs = sys.argv[3:] or ["none", "unbiased:100:10"]
    seed = int(os.environ.get("LRN_SEED", "0"))
    difficulty = "hard" if os.environ.get("LRN_HARD") else "easy"
    subdir = f"latent_nfe_study_{steps}_s{seed}_{difficulty}"
    for root in ("checkpoints", "logs"):
        shutil.rmtree(REPO / root / subdir, ignore_errors=True)

    results = []
    for spec in arm_specs:
        reg, w0, w1 = parse_arm(spec)
        print(f"=== arm {reg} w_reg={w0}->{w1} ({steps} steps) ===", flush=True)
        results.append(
            run_arm(reg, w0, w1, steps, subdir, seed=seed,
                    difficulty=difficulty)
        )
        # dump after every arm: a crash in arm k keeps arms 1..k-1
        base = next((r for r in results if r["regularize"] == "none"), None)
        if base is not None:
            for r in results:
                if r is base:
                    continue
                r["nfe_reduction_vs_none"] = (
                    base["final_eval_nfe"] / max(r["final_eval_nfe"], 1.0)
                )
                r["mse_gap_vs_none"] = (
                    r["best_eval_mse"] - base["best_eval_mse"]
                )
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, default=str)
    for r in results:
        print(
            r["regularize"], r["w_reg"],
            "final_eval_nfe", round(r.get("final_eval_nfe", -1), 1),
            "best_mse", round(r["best_eval_mse"], 5),
            "reduction", round(r.get("nfe_reduction_vs_none", 1.0), 2),
            flush=True,
        )


if __name__ == "__main__":
    main()
