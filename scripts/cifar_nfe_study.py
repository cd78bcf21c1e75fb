#!/usr/bin/env python
"""NFE-reduction study for the CIFAR-10 conv Neural-ODE family — the paper's
image-scale experiment (reference: experiments/cifar10/main.jl + cnn.yml).

Runs the SHIPPED cnn.yaml configuration end-to-end through the
classification runner (same path as `python experiments/cifar10/main.py`)
with and without local regularization at the reference's hyperparameters
(tol 1e-4, maxiters 10,000, batch 32, adam + cosine LR, w_reg 2.5), and
compares eval-mode NFE at matched top-1 accuracy. The cosine LR cycle is
rescaled to the arm's step count so short runs are a complete (compressed)
schedule rather than a truncated one.

The dataset is the synthetic 32x32x3 stand-in unless real CIFAR-10 binaries
are present (zero egress; the loader takes either).

Usage: python scripts/cifar_nfe_study.py [steps] [out.json] [arms...]
  arms default: none unbiased:2.5:2.5 stiffness:2.5:2.5
  arm syntax:   none | unbiased:W0:W1 | stiffness:W0:W1 | biased:W0:W1
  LRN_SEED=k   env var sets the training seed for every arm (default 0)
  LRN_HARD=1   env var switches the synthetic stand-in to the 'hard'
               difficulty (overlapping prototypes + label noise) so the
               matched-accuracy comparison discriminates (non-saturating)
  LRN_BN_EVAL=batch  sets model.bn_eval_stats (escape hatch for the
               BN-inside-dynamics eval pathology; default 'running')
"""
import json
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

if os.environ.get("LRN_CPU"):
    jax.config.update("jax_platforms", "cpu")

from localregneuralde_tpu.harness import define_configuration
from localregneuralde_tpu.harness.runner import run_classification_experiment

CONFIG = REPO / "experiments" / "cifar10" / "cnn.yaml"

# per-channel normalization, reference cifar10/main.jl:7-16
CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2023, 0.1994, 0.2010], np.float32)


def normalize(x: np.ndarray) -> np.ndarray:
    return (x - CIFAR_MEAN) / CIFAR_STD


def parse_arm(spec):
    if spec == "none":
        # w_reg is inert with regularize='none'; 1.0 keeps the shipped
        # exponential-decay schedule constructible (log(w0/w1) at 0/0 dies)
        return ("none", 1.0, 1.0)
    kind, w0, w1 = spec.split(":")
    return (kind, float(w0), float(w1))


def run_arm(reg, w0, w1, steps, subdir, seed=0, difficulty="easy"):
    cfg = define_configuration([], str(CONFIG))
    cfg.model.model_type = "cifar10_cnn"
    cfg.model.bn_eval_stats = os.environ.get("LRN_BN_EVAL", "running")
    cfg.dataset.difficulty = difficulty
    if reg == "stiffness":
        # 'stiffness' selects WHAT is regularized; the t1-sampling mode
        # stays unbiased (cf. scripts/stiffness_study.py and the reference
        # mlp_stiff.yml whose regularize_type is stiffness_estimate)
        cfg.model.regularize = "unbiased"
        cfg.model.regularize_type = "stiffness_estimate"
    else:
        cfg.model.regularize = reg
    cfg.loss.w_reg_start = w0
    cfg.loss.w_reg_end = w1
    cfg.seed = seed
    cfg.train.total_steps = steps
    # eval cadence: frequent enough to watch the baseline's train/eval-gap
    # trajectory (round-3 collapse diagnosis), coarse enough to stay cheap
    cfg.train.evaluate_every = min(
        int(os.environ.get("LRN_EVAL_EVERY", "500")), steps
    )
    cfg.train.print_frequency = min(cfg.train.print_frequency, max(steps // 10, 1))
    # compress the cosine cycle to the arm length (the shipped 31,250-step
    # cycle would leave a short run on a nearly-constant LR plateau)
    cfg.optimizer.scheduler.cosine_cycle_length = steps
    cfg.train.expt_subdir = subdir
    tag = f"{reg}_w{w0:g}to{w1:g}_s{seed}"
    t0 = time.time()
    summary = run_classification_experiment(cfg, f"cns_{tag}", normalize=normalize)
    summary["wall_s"] = time.time() - t0
    summary["regularize"] = reg
    summary["w_reg"] = [w0, w1]
    summary["seed"] = seed
    summary["steps"] = steps
    summary["difficulty"] = difficulty
    if cfg.model.bn_eval_stats != "running":
        # de-confounded protocol: the run evaluated with batch statistics
        # (the BN-inside-dynamics eval pathology escape hatch); log the
        # DEFAULT reference semantics (running stats) alongside by
        # re-evaluating the best checkpoint once in eval-only mode
        cfg2 = define_configuration([], str(CONFIG))
        for attr, val in (
            ("model_type", cfg.model.model_type),
            ("bn_eval_stats", "running"),
            ("regularize", cfg.model.regularize),
            ("regularize_type", cfg.model.regularize_type),
        ):
            setattr(cfg2.model, attr, val)
        cfg2.dataset.difficulty = difficulty
        cfg2.seed = seed
        cfg2.train.evaluate = True
        cfg2.train.expt_subdir = subdir + "_runningbn_eval"
        cfg2.train.resume = os.path.join(
            summary["ckpt_dir"], "model_best.ckpt"
        )
        ev = run_classification_experiment(
            cfg2, f"cns_{tag}_runbn", normalize=normalize
        )
        summary["final_eval_running_bn"] = ev["eval"]
    return summary


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "cifar_nfe_study.json"
    arm_specs = sys.argv[3:] or ["none", "unbiased:2.5:2.5", "stiffness:2.5:2.5"]
    seed = int(os.environ.get("LRN_SEED", "0"))
    difficulty = "hard" if os.environ.get("LRN_HARD") else "easy"
    subdir = f"cifar_nfe_study_{steps}_s{seed}_{difficulty}"
    if os.environ.get("LRN_BN_EVAL"):
        subdir += f"_bn{os.environ['LRN_BN_EVAL']}"
    if os.environ.get("LRN_SUBDIR_TAG"):
        # lets long arms run as SEPARATE invocations (own subdir + own
        # json each, crash-isolated); cross-arm reductions are then
        # computed by the caller from the per-arm jsons
        subdir += f"_{os.environ['LRN_SUBDIR_TAG']}"
    if not os.environ.get("LRN_KEEP"):
        # LRN_KEEP=1 preserves the subdir so a killed long arm RESUMES
        # from model_current (exact resume incl. data stream, round 5)
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
                    base["final_eval"]["nfe"]
                    / max(r["final_eval"]["nfe"], 1.0)
                )
                r["acc_gap_vs_none"] = (
                    r["best_eval_acc"] - base["best_eval_acc"]
                )
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, default=str)
    for r in results:
        print(
            r["regularize"], r["w_reg"],
            "final_eval_nfe", round(r["final_eval"]["nfe"], 1),
            "best_acc", round(r["best_eval_acc"], 2),
            "reduction", round(r.get("nfe_reduction_vs_none", 1.0), 2),
            flush=True,
        )


if __name__ == "__main__":
    main()
