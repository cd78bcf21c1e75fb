#!/usr/bin/env python
"""Stiffness-regularization study: the mlp_stiff.yml config's effect,
measured end-to-end.

The reference ships ``experiments/mnist_ode/mlp_stiff.yml`` (regularize_type
stiffness_estimate, w_reg 0.1 const — see our ``mlp_stiff.yaml``) but, like
everything else, publishes no numbers. This study demonstrates the
regularizer's effect: training the flagship MNIST MLP Neural ODE with the
stiffness-estimate penalty (reference ``perform_step.jl:34-47``: stiffness =
rms(k7−k6)/(rms(g7−g6)+eps)/3.5068, the Tsit5 stability-region-normalized
dominant-eigenvalue proxy) should drive the LEARNED dynamics toward lower
stiffness than an unregularized arm.

Measurement: stiffness of the trained dynamics is measured IDENTICALLY for
every arm by a probe model (same params, regularize_type=stiffness_estimate)
whose training-mode forward returns one stiffness sample at a random t1;
we average K samples by threading the probe's rng state. Also tracked: eval
NFE + accuracy (hard synthetic task, like nfe_study.py) so the stiffness
arms' cost/quality story is on the record, and a cross-check of whether the
error-estimate regularizer ALSO reduces stiffness (the paper's two
regularizers are siblings).

Usage: python scripts/stiffness_study.py [steps] [out.json] [difficulty]
Env:   LRN_CPU=1 forces the CPU backend (relay-outage fallback).
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

from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import construct_optimizer
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.losses import accuracy, logitcrossentropy
from localregneuralde_tpu.harness.train import create_train_state, make_train_step
from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
from localregneuralde_tpu.nn import Chain, Dense, Flatten, WrappedFunction

F, H = 784, 100


def build_model(regularize, regularize_type, rtol):
    use_pallas = jax.default_backend() == "tpu"
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(
        td, regularize=regularize, regularize_type=regularize_type,
        rtol=rtol, atol=rtol, max_steps=64, checkpoint_every=8,
        use_pallas=use_pallas,
    )
    return Chain(
        flatten=Flatten(), neural_ode=node,
        sol_to_arr=WrappedFunction(diffeqsol_to_array),
        classifier=Dense(F, 10),
    )


def make_loss(model):
    def loss_fn(model, params, state, data, w_reg, *, training=True):
        x, y = data
        y_pred, st_ = model(params, state, x, training=training)
        ce = logitcrossentropy(y_pred, y)
        st_node = st_["neural_ode"]
        return ce + w_reg * st_node["reg_val"], st_, {
            "nfe": st_node["nfe"], "ce": ce, "y_pred": y_pred,
            "reg_val": st_node["reg_val"],
        }

    return loss_fn


def measure_stiffness(params, xe, rtol, k=16, seed=123):
    """Mean stiffness estimate of the dynamics given by ``params``,
    averaged over k random t1 draws (each a fenced training-mode forward
    of a stiffness-probe model sharing the params)."""
    probe = build_model("unbiased", "stiffness_estimate", rtol)
    loss_fn = make_loss(probe)
    # params trees are identical across regularize flags; seed only the state
    st = probe.init(jax.random.PRNGKey(seed))[1]

    @jax.jit
    def one(st, x):
        _, st_, stats = loss_fn(probe, params, st, (x, None_y), 0.0)
        return st_, stats["reg_val"]

    None_y = jnp.zeros((xe.shape[0], 10), dtype=jnp.float32)
    vals = []
    for _ in range(k):
        st, v = one(st, xe)
        vals.append(float(v))
    return float(np.mean(vals)), float(np.std(vals))


def run(name, regularize, regularize_type, w_reg, steps, batch=512,
        rtol=1e-4, seed=0, difficulty="hard"):
    model = build_model(regularize, regularize_type, rtol)
    loss_fn = make_loss(model)

    cfg = ExperimentConfig()
    cfg.optimizer.optimizer = "adam"
    cfg.optimizer.learning_rate = 1e-3
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(seed))
    train_step = make_train_step(model, loss_fn, optimizer)

    x_train, y_train, x_test, y_test = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=2048, seed=0,
        difficulty=difficulty,
    )
    y_train_oh = one_hot(y_train, 10)

    log = []
    rng = np.random.RandomState(0)
    t0 = time.time()
    for step in range(1, steps + 1):
        idx = rng.randint(0, len(x_train), batch)
        xb = jnp.asarray(x_train[idx])
        yb = jnp.asarray(y_train_oh[idx])
        w = w_reg if regularize != "none" else 0.0
        ts, loss, stats = train_step(ts, (xb, yb), w, 1e-3)
        if step % 50 == 0 or step == 1:
            log.append((step, int(stats["nfe"]), float(stats["reg_val"])))
            print(
                f"  [{name}] {step}: nfe={int(stats['nfe'])} "
                f"ce={float(stats['ce']):.3f} reg={float(stats['reg_val']):.3e}",
                flush=True,
            )
    wall = time.time() - t0

    xe = jnp.asarray(x_test[:1024])
    ye = jnp.asarray(one_hot(y_test[:1024], 10))
    _, stats = jax.jit(
        lambda ts, d: (lambda l, s, st: (l, st))(
            *loss_fn(model, ts.params, ts.state, d, 0.0, training=False)
        )
    )(ts, (xe, ye))
    final_acc = float(accuracy(stats["y_pred"], ye))
    final_nfe = int(stats["nfe"])
    stiff_mean, stiff_std = measure_stiffness(ts.params, xe, rtol)
    print(
        f"  [{name}] final: eval_nfe={final_nfe} acc={final_acc:.1f} "
        f"stiffness={stiff_mean:.3f}±{stiff_std:.3f}",
        flush=True,
    )
    return {
        "arm": name,
        "regularize": regularize,
        "regularize_type": regularize_type,
        "w_reg": w_reg,
        "train_log": log,
        "final_eval_acc": final_acc,
        "final_eval_nfe": final_nfe,
        "stiffness_mean": stiff_mean,
        "stiffness_std": stiff_std,
        "wall_s": wall,
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out_path = sys.argv[2] if len(sys.argv) > 2 else "stiffness_study.json"
    difficulty = sys.argv[3] if len(sys.argv) > 3 else "hard"
    arms = [
        ("none", "none", "error_estimate", 0.0),
        # mlp_stiff.yml's exact weight (const 0.1)
        ("stiff-0.1", "unbiased", "stiffness_estimate", 0.1),
        # a stronger arm: the default-tolerance regime needs more pressure
        ("stiff-1.0", "unbiased", "stiffness_estimate", 1.0),
        # cross-check: does the error-estimate regularizer also de-stiffen?
        ("error-30", "unbiased", "error_estimate", 30.0),
    ]
    results = []
    for name, reg, rtype, w in arms:
        print(f"=== {name} ===", flush=True)
        results.append(run(name, reg, rtype, w, steps,
                           difficulty=difficulty))
    base = results[0]
    for r in results[1:]:
        r["stiffness_vs_none"] = r["stiffness_mean"] / max(
            base["stiffness_mean"], 1e-12
        )
        r["nfe_vs_none"] = r["final_eval_nfe"] / max(
            base["final_eval_nfe"], 1
        )
        r["acc_gap_vs_none"] = r["final_eval_acc"] - base["final_eval_acc"]
    meta = {"steps": steps, "difficulty": difficulty,
            "backend": jax.default_backend()}
    with open(out_path, "w") as f:
        json.dump({"meta": meta, "arms": results}, f, indent=1)
    for r in results:
        print(
            r["arm"], "stiffness", round(r["stiffness_mean"], 3),
            "eval_nfe", r["final_eval_nfe"],
            "acc", round(r["final_eval_acc"], 2),
        )


if __name__ == "__main__":
    main()
