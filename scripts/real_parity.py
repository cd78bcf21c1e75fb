#!/usr/bin/env python
"""Real-data training parity runner (VERDICT round-3 ask #6, BASELINE.md
"accuracy within 0.2% of the paper configs").

Runs the SHIPPED experiment YAMLs unchanged against real datasets under
``--data-root`` and reports the parity observables (top-1 accuracy / masked
MSE, eval NFE) next to the acceptance band. The reference publishes no
numbers in-repo (BASELINE.md) — the ±0.2 pt contract is against a
reference run of the same config, so pass ``--target`` with the accuracy
your Julia reference run produced; without it the script reports against
coarse paper-ballpark sanity floors and marks the verdict "unverified
(no reference target supplied)".

Families and their shipped configs (reference file in parens):
  mnist_ode  experiments/mnist_ode/mlp.yaml      (mnist_ode/mlp.yml)
  mnist_sde  experiments/mnist_sde/mlp.yaml      (mnist_sde/mlp.yml)
  cifar10    experiments/cifar10/cnn.yaml        (cifar10/cnn.yml)
  physionet  experiments/physionet/physionet.yaml (physionet/physionet.yml)

Usage:
  # the real thing (after scripts/ingest_data.py; full shipped schedules):
  python scripts/real_parity.py --data-root data --families mnist_ode

  # abbreviated schedules for budgeted checks:
  python scripts/real_parity.py --data-root data --steps 600

  # end-to-end path proof with no real data (scales the committed format
  # fixtures up to a usable synthetic-but-real-format dataset):
  python scripts/real_parity.py --fixtures-smoke --steps 3

Emits one JSON summary (default real_parity.json) with per-family rows:
{family, real_data, steps, metric, value, nfe, target, band, verdict}.
"""
import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

if os.environ.get("LRN_CPU"):
    jax.config.update("jax_platforms", "cpu")

# Coarse sanity floors ONLY (paper-scale ballparks for the full shipped
# schedules; arXiv 2303.02262 reports per-config curves, not single
# numbers). The real ±0.2 pt parity check needs --target from a reference
# run. metric: 'acc' = top-1 %, 'mse' = masked eval MSE.
SANITY = {
    "mnist_ode": {"metric": "acc", "floor": 97.0},
    "mnist_sde": {"metric": "acc", "floor": 96.0},
    "cifar10": {"metric": "acc", "floor": 55.0},
    "physionet": {"metric": "mse", "ceiling": 0.01},
}

CONFIGS = {
    "mnist_ode": "experiments/mnist_ode/mlp.yaml",
    "mnist_sde": "experiments/mnist_sde/mlp.yaml",
    "cifar10": "experiments/cifar10/cnn.yaml",
    "physionet": "experiments/physionet/physionet.yaml",
}

CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2023, 0.1994, 0.2010], np.float32)


def build_fixture_data_root(tmp: Path) -> Path:
    """Tile the committed format fixtures into a small but usable dataset
    so the real-data code path (loaders -> runners) executes end-to-end
    without egress. Synthetic content, REAL formats."""
    fix = REPO / "tests" / "fixtures"
    root = tmp / "data"
    root.mkdir(parents=True)

    d = np.load(fix / "mnist_npz" / "mnist.npz")
    reps = -(-2048 // d["x_train"].shape[0])
    np.savez(
        root / "mnist.npz",
        x_train=np.tile(d["x_train"], (reps, 1, 1)),
        y_train=np.tile(d["y_train"], reps),
        x_test=np.tile(d["x_test"], (8, 1, 1)),
        y_test=np.tile(d["y_test"], 8),
    )
    c = np.load(fix / "cifar_npz" / "cifar10.npz")
    reps = -(-1024 // c["x_train"].shape[0])
    np.savez(
        root / "cifar10.npz",
        x_train=np.tile(c["x_train"], (reps, 1, 1, 1)),
        y_train=np.tile(c["y_train"], reps),
        x_test=np.tile(c["x_test"], (8, 1, 1, 1)),
        y_test=np.tile(c["y_test"], 8),
    )
    # tile the physionet artifact along the series axis so the shipped
    # train_batchsize=512 yields non-empty drop_last batches
    p = np.load(fix / "physionet" / "physionet.npz")
    reps = -(-1024 // p["observed_data"].shape[2])
    np.savez(
        root / "physionet.npz",
        **{
            k: np.tile(p[k], (1,) * (p[k].ndim - 1) + (reps,))
            for k in p.files
        },
    )
    return root


def smoke_learning_bars(data_root: Path) -> dict:
    """Learning bars for --fixtures-smoke (round-4 verdict Weak #2: a
    smoke that can't distinguish a learning model from a broken loss is a
    weak guarantee). Classification families must clear absolute accuracy
    bars on the fixture sets; the latent family must beat 0.7x the
    zero-prediction masked MSE (the 'predicted nothing' floor, computed
    from the fixture artifact itself)."""
    p = np.load(Path(data_root) / "physionet.npz")
    data = p["observed_data"].astype(np.float64)  # (F, T, N)
    mask = p["observed_mask"].astype(np.float64)
    per_series = (
        (np.square(data) * mask).sum(axis=(0, 1))
        / np.maximum(mask.sum(axis=(0, 1)), 1.0)
    )
    zero_mse = float(per_series.mean())
    return {
        "mnist_ode": ("acc", 90.0),
        "mnist_sde": ("acc", 90.0),
        "cifar10": ("acc", 30.0),
        "physionet": ("mse", 0.7 * zero_mse),
    }


def run_family(family: str, data_root: str, steps, targets,
               smoke_bars=None):
    import shutil

    from localregneuralde_tpu.harness import define_configuration

    # fresh subdir: auto-resume (round 5, exact) would otherwise pick up a
    # stale checkpoint from a previous parity/smoke invocation
    for root in ("checkpoints", "logs"):
        shutil.rmtree(REPO / root / "real_parity", ignore_errors=True)

    cfg = define_configuration([], str(REPO / CONFIGS[family]))
    cfg.dataset.data_root = data_root
    if steps:
        cfg.train.total_steps = steps
        cfg.train.evaluate_every = min(cfg.train.evaluate_every, steps)
        cfg.train.print_frequency = min(
            cfg.train.print_frequency, max(steps // 10, 1)
        )
        if cfg.optimizer.scheduler.lr_scheduler == "cosine":
            cfg.optimizer.scheduler.cosine_cycle_length = steps
    cfg.train.expt_subdir = "real_parity"

    t0 = time.time()
    if family == "physionet":
        from localregneuralde_tpu.harness.latent_runner import (
            run_latent_ode_experiment,
        )

        cfg.model.model_type = "time_series"
        summary = run_latent_ode_experiment(cfg, f"parity_{family}")
        value = summary["best_eval_mse"]
        metric = "mse"
    else:
        from localregneuralde_tpu.harness.runner import (
            run_classification_experiment,
        )

        normalize = None
        if family == "cifar10":
            cfg.model.model_type = "cifar10_cnn"

            def normalize(x):
                return (x - CIFAR_MEAN) / CIFAR_STD

        summary = run_classification_experiment(
            cfg, f"parity_{family}", normalize=normalize
        )
        value = summary["best_eval_acc"]
        metric = "acc"

    row = {
        "family": family,
        "config": CONFIGS[family],
        "real_data": bool(summary.get("real_data")),
        "steps": int(cfg.train.total_steps),
        "metric": metric,
        "value": float(value),
        "nfe": float(
            summary.get("final_eval", {}).get(
                "nfe",
                summary.get("final_eval", {}).get(  # SDE: drift NFE
                    "nfe_drift", summary.get("final_eval_nfe", -1)
                ),
            )
        ),
        "wall_s": time.time() - t0,
    }

    target = targets.get(family)
    full_schedule = steps is None
    if target is not None:
        row["target"] = target
        row["band"] = 0.2
        if metric == "acc":
            row["verdict"] = (
                "PASS" if value >= target - 0.2 else "FAIL"
            )
        else:
            row["verdict"] = (
                "PASS" if value <= target * 1.05 else "FAIL"
            )
    elif smoke_bars is not None:
        kind, bar = smoke_bars[family]
        assert kind == metric
        ok = value >= bar if metric == "acc" else value <= bar
        row["smoke_bar"] = bar
        row["verdict"] = (
            f"learned ({metric}={value:.4g} vs bar "
            f"{'>=' if metric == 'acc' else '<='} {bar:.4g}; fixture "
            "smoke — supply real data + --target for the ±0.2 pt check)"
            if ok
            else f"FAILED-TO-LEARN ({metric}={value:.4g} missed the "
                 f"fixture-smoke bar {bar:.4g})"
        )
    elif full_schedule and row["real_data"]:
        s = SANITY[family]
        ok = (
            value >= s["floor"] if metric == "acc"
            else value <= s["ceiling"]
        )
        row["verdict"] = (
            f"{'SANE' if ok else 'BELOW-SANITY'} "
            "(paper ballpark; supply --target for the ±0.2 pt check)"
        )
    else:
        why = []
        if not row["real_data"]:
            why.append("synthetic data")
        if not full_schedule:
            why.append("abbreviated schedule")
        row["verdict"] = f"unverified ({', '.join(why)})"
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data-root", default="data")
    ap.add_argument(
        "--families", nargs="*", default=list(CONFIGS),
        choices=list(CONFIGS),
    )
    ap.add_argument(
        "--steps", type=int, default=None,
        help="abbreviate every schedule (default: full shipped schedules)",
    )
    ap.add_argument(
        "--target", action="append", default=[],
        metavar="FAMILY=VALUE",
        help="reference-run parity target, e.g. mnist_ode=98.1 "
             "(acc in %%) or physionet=0.0033 (MSE)",
    )
    ap.add_argument("--out", default="real_parity.json")
    ap.add_argument(
        "--fixtures-smoke", action="store_true",
        help="ignore --data-root; tile the committed format fixtures into "
             "a temp data root (proves the real-data path end-to-end)",
    )
    args = ap.parse_args()

    targets = {}
    for spec in args.target:
        fam, val = spec.split("=")
        targets[fam] = float(val)

    smoke_bars = None
    if args.fixtures_smoke:
        tmp = Path(tempfile.mkdtemp(prefix="real_parity_fix_"))
        data_root = str(build_fixture_data_root(tmp))
        print(f"[fixtures-smoke] data root: {data_root}")
        if args.steps is None:
            # enough steps that a correct loss/optimizer MUST clear the
            # learning bars on the small fixture sets; a broken loss won't
            args.steps = 400
        smoke_bars = smoke_learning_bars(Path(data_root))
        print(f"[fixtures-smoke] learning bars: {smoke_bars}")
    else:
        data_root = args.data_root

    rows = []
    for fam in args.families:
        print(f"=== {fam} ({CONFIGS[fam]}) ===", flush=True)
        rows.append(
            run_family(fam, data_root, args.steps, targets,
                       smoke_bars=smoke_bars)
        )
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(json.dumps(rows[-1], indent=1), flush=True)

    print(f"\nwrote {args.out}")
    for r in rows:
        print(
            f"  {r['family']:10s} {r['metric']}={r['value']:.4g} "
            f"nfe={r['nfe']:.0f} real={r['real_data']} -> {r['verdict']}"
        )


if __name__ == "__main__":
    main()
