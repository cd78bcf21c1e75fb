#!/usr/bin/env python
"""SDE NFE-reduction study: the paper's effect on the NeuralDSDE family.

The ODE study (``scripts/nfe_study.py``) demonstrates the headline >=1.5x
NFE reduction; the reference's second experiment family is the MNIST
Neural SDE (``experiments/mnist_sde/mlp.yml``: tol 1.4e-1, w_reg 1000
const, adam 1e-2 with inverse decay) and publishes no numbers either.
This study trains the harness-constructed SDE model (784 -> 32
downsample -> NeuralDSDE(drift 32-64-32, diagonal diffusion) ->
classifier, reference ``construct.jl:202-210``) with and without the
local (unbiased, error-estimate) regularizer and tracks the DRIFT NFE
(the true solver-cost observable; the reference logs diffusion NFE
mirroring drift — ``construct.jl:9,24`` quirk) plus accuracy on the hard
synthetic task, so the matched-accuracy control is non-vacuous.

Arms: none / unbiased w_reg=1000 (the reference's exact weight) /
unbiased w_reg=100 (sensitivity cross-check).

Usage: python scripts/sde_nfe_study.py [steps] [out.json] [difficulty]
           [seed] [arms]
       ``arms`` is a comma list of ``none``, w_reg values, and/or
       ``anneal:START:END`` (exponential w_reg decay over the schedule,
       the decay the reference's ODE configs use — ``mlp.yml``
       w_reg 2.5→1.0). Default ``none,1000,100``; e.g. ``none,300`` for
       the intermediate-weight ladder cell, ``anneal:1000:10`` for the
       accuracy-recovery arm (compare against an existing ``none`` run
       at the same steps/seed — ratios are computed only when a
       ``none`` arm is present in THIS run).
Env:   LRN_CPU=1 forces the CPU backend (relay-outage fallback).
       LRN_CLIP=c enables optimizer.gradient_clip_norm=c on every arm
       (the destabilization-mitigation probe for the mid-weight cells).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("LRN_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.harness.config import define_configuration
from localregneuralde_tpu.harness.construct import (
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.losses import accuracy, logitcrossentropy
from localregneuralde_tpu.harness.schedulers import (
    ExponentialDecay,
    InverseDecay,
)
from localregneuralde_tpu.harness.train import create_train_state, make_train_step

YAML = str(Path(__file__).resolve().parents[1] / "experiments/mnist_sde/mlp.yaml")


def build(regularize, seed):
    overrides = [
        f"--model.regularize={regularize}",
        # capacity headroom only — tol 1.4e-1 accepts in O(10) steps
        "--model.solver.max_steps=512",
        f"--seed={seed}",
    ]
    if os.environ.get("LRN_CLIP"):
        overrides.append(
            f"--optimizer.gradient_clip_norm={float(os.environ['LRN_CLIP'])}"
        )
    cfg = define_configuration(overrides, YAML)
    model = construct_model(cfg)
    optimizer, _ = construct_optimizer(cfg)
    return cfg, model, optimizer


def make_loss(regularize):
    """Like the harness classification loss but logging the TRUE
    drift/diffusion NFE split instead of the reference's mirror quirk."""
    regularized = regularize != "none"

    def loss_fn(model, params, state, data, w_reg, *, training=True):
        x, y = data
        y_pred, st_ = model(params, state, x, training=training)
        ce = logitcrossentropy(y_pred, y)
        st_node = st_["neural_dsde"]
        reg_val = st_node["reg_val"] if regularized else jnp.zeros(())
        loss = ce + w_reg * reg_val if regularized else ce
        return loss, st_, {
            "nfe_drift": st_node["nfe_drift"],
            "nfe_diffusion": st_node["nfe_diffusion"],
            "ce": ce, "y_pred": y_pred, "reg_val": reg_val,
        }

    return loss_fn


def run(name, regularize, w_reg, steps, seed=0, difficulty="hard"):
    """``w_reg`` is a constant float or a callable step -> weight (the
    annealed arms pass an ``ExponentialDecay``)."""
    w_sched = w_reg if callable(w_reg) else (lambda step: w_reg)
    cfg, model, optimizer = build(regularize, seed)
    batch = cfg.dataset.train_batchsize
    loss_fn = make_loss(regularize)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(seed))
    train_step = make_train_step(model, loss_fn, optimizer)
    # reference scheduler: adam 1e-2, inverse decay 1e-5 (mlp.yml)
    lr_sched = InverseDecay(
        cfg.optimizer.learning_rate,
        cfg.optimizer.scheduler.inverse_decay_factor,
    )

    x_train, y_train, x_test, y_test = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=2048, seed=0,
        difficulty=difficulty,
    )
    y_train_oh = one_hot(y_train, 10)

    nfe_log, acc_log = [], []
    rng = np.random.RandomState(seed)
    t0 = time.time()
    for step in range(1, steps + 1):
        idx = rng.randint(0, len(x_train), batch)
        xb = jnp.asarray(x_train[idx])
        yb = jnp.asarray(y_train_oh[idx])
        w = float(w_sched(step)) if regularize != "none" else 0.0
        ts, loss, stats = train_step(ts, (xb, yb), w, float(lr_sched(step)))
        if step % 25 == 0 or step == 1:
            acc = float(accuracy(stats["y_pred"], yb))
            nfe_log.append((step, int(stats["nfe_drift"])))
            acc_log.append((step, acc))
            print(
                f"  [{name}] {step}: nfe_drift={int(stats['nfe_drift'])} "
                f"nfe_diff={int(stats['nfe_diffusion'])} "
                f"ce={float(stats['ce']):.3f} acc={acc:.1f} "
                f"reg={float(stats['reg_val']):.2e}",
                flush=True,
            )
    wall = time.time() - t0

    # final eval accuracy + eval-mode NFE (fresh Brownian path via state rng)
    xe = jnp.asarray(x_test[:1024])
    ye = jnp.asarray(one_hot(y_test[:1024], 10))
    _, st_, stats = jax.jit(
        lambda p, s, d: loss_fn(model, p, s, d, 0.0, training=False)
    )(ts.params, ts.state, (xe, ye))
    final_acc = float(accuracy(stats["y_pred"], ye))
    final_nfe = int(stats["nfe_drift"])
    return {
        "arm": name,
        "regularize": regularize,
        "w_reg": name if callable(w_reg) else w_reg,
        "nfe_log": nfe_log,
        "acc_log": acc_log,
        "final_eval_acc": final_acc,
        "final_eval_nfe_drift": final_nfe,
        "final_eval_nfe_diffusion": int(stats["nfe_diffusion"]),
        "wall_s": wall,
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    out_path = sys.argv[2] if len(sys.argv) > 2 else "sde_nfe_study.json"
    difficulty = sys.argv[3] if len(sys.argv) > 3 else "hard"
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    arm_spec = sys.argv[5] if len(sys.argv) > 5 else "none,1000,100"
    arms = []
    for tok in arm_spec.split(","):
        if tok == "none":
            arms.append(("none", "none", 0.0))
        elif tok.startswith("anneal:"):
            _, start, end = tok.split(":")
            arms.append((
                f"unbiased-anneal-{start}-{end}",
                "unbiased",
                ExponentialDecay(float(start), float(end), steps),
            ))
        else:
            w = float(tok)
            arms.append((f"unbiased-{tok}", "unbiased", w))
    results = []
    for name, reg, w in arms:
        print(f"=== {name} ===", flush=True)
        results.append(run(name, reg, w, steps, seed=seed,
                           difficulty=difficulty))
    base = results[0] if results[0]["regularize"] == "none" else None
    for r in (results[1:] if base is not None else []):
        r["nfe_reduction_vs_none"] = base["final_eval_nfe_drift"] / max(
            r["final_eval_nfe_drift"], 1
        )
        r["acc_gap_vs_none"] = r["final_eval_acc"] - base["final_eval_acc"]
        r["matched_accuracy"] = bool(
            r["final_eval_acc"] >= base["final_eval_acc"] - 2.0
        )
    meta = {"steps": steps, "difficulty": difficulty, "seed": seed,
            "backend": jax.default_backend(), "config": YAML}
    with open(out_path, "w") as f:
        json.dump({"meta": meta, "arms": results}, f, indent=1)
    for r in results:
        print(
            r["arm"], "final_nfe_drift", r["final_eval_nfe_drift"],
            "acc", round(r["final_eval_acc"], 2),
            "reduction", round(r.get("nfe_reduction_vs_none", 1.0), 2),
        )


if __name__ == "__main__":
    main()
