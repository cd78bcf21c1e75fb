#!/usr/bin/env python
"""NFE-reduction study: the paper's headline effect, measured end-to-end.

Trains the flagship MNIST MLP Neural ODE with and without local (unbiased,
error-estimate) regularization and tracks the forward NFE over training.
Target (BASELINE.md): ≥1.5× NFE reduction at matched accuracy.

The task is the HARD synthetic variant (overlapping prototypes + 8% label
noise): eval accuracy plateaus below ~93%, so "at matched accuracy" is a
discriminating claim — on the easy variant every arm hits 100% by step 50
(round-2 verdict) and the control is vacuous.

Usage: python scripts/nfe_study.py [steps] [out.json] [difficulty]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.harness.construct import construct_optimizer
from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.losses import accuracy, logitcrossentropy
from localregneuralde_tpu.harness.schedulers import ExponentialDecay
from localregneuralde_tpu.harness.train import create_train_state, make_train_step
from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
from localregneuralde_tpu.nn import Chain, Dense, Flatten, WrappedFunction


def run(regularize, w_reg_start, w_reg_end, steps, batch=512, rtol=1e-4,
        seed=0, difficulty="hard"):
    F, H = 784, 100
    use_pallas = jax.default_backend() == "tpu"
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(
        td, regularize=regularize, rtol=rtol, atol=rtol,
        max_steps=64, checkpoint_every=8, use_pallas=use_pallas,
    )
    model = Chain(
        flatten=Flatten(), neural_ode=node,
        sol_to_arr=WrappedFunction(diffeqsol_to_array),
        classifier=Dense(F, 10),
    )

    def loss_fn(model, params, state, data, w_reg, *, training=True):
        x, y = data
        y_pred, st_ = model(params, state, x, training=training)
        ce = logitcrossentropy(y_pred, y)
        st_node = st_["neural_ode"]
        loss = ce + w_reg * st_node["reg_val"]
        return loss, st_, {
            "nfe": st_node["nfe"], "ce": ce, "y_pred": y_pred,
            "reg_val": st_node["reg_val"],
        }

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
    if regularize == "none" or w_reg_start <= 0:
        w_sched = lambda t: 0.0  # noqa: E731
    else:
        w_sched = ExponentialDecay(w_reg_start, max(w_reg_end, 1e-8), steps)

    nfe_log, acc_log = [], []
    rng = np.random.RandomState(0)
    t0 = time.time()
    for step in range(1, steps + 1):
        idx = rng.randint(0, len(x_train), batch)
        xb = jnp.asarray(x_train[idx])
        yb = jnp.asarray(y_train_oh[idx])
        w = float(w_sched(step)) if regularize != "none" else 0.0
        ts, loss, stats = train_step(ts, (xb, yb), w, 1e-3)
        if step % 25 == 0 or step == 1:
            acc = float(accuracy(stats["y_pred"], yb))
            nfe_log.append((step, int(stats["nfe"])))
            acc_log.append((step, acc))
            print(
                f"  [{regularize} w={w_reg_start}] {step}: nfe={int(stats['nfe'])} "
                f"ce={float(stats['ce']):.3f} acc={acc:.1f} "
                f"reg={float(stats['reg_val']):.2e}",
                flush=True,
            )
    wall = time.time() - t0

    # final eval accuracy + eval-mode NFE (while-loop path)
    xe = jnp.asarray(x_test[:1024])
    ye = jnp.asarray(one_hot(y_test[:1024], 10))
    loss, stats = jax.jit(
        lambda ts, d: (lambda l, s, st: (l, st))(*loss_fn(model, ts.params, ts.state, d, 0.0, training=False))
    )(ts, (xe, ye))
    final_acc = float(accuracy(stats["y_pred"], ye))
    final_nfe = int(stats["nfe"])
    return {
        "regularize": regularize,
        "w_reg": [w_reg_start, w_reg_end],
        "nfe_log": nfe_log,
        "acc_log": acc_log,
        "final_eval_acc": final_acc,
        "final_eval_nfe": final_nfe,
        "wall_s": wall,
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    out_path = sys.argv[2] if len(sys.argv) > 2 else "nfe_study.json"
    difficulty = sys.argv[3] if len(sys.argv) > 3 else "hard"
    results = []
    # w_reg=30 const is the headline arm: robust across seeds (round-2
    # finding: w_reg=100 const is bimodal — regularization-induced training
    # oscillations make its outcome a coin flip over fp-noise realizations;
    # 38–272 final NFE across seeds with verified-correct gradients).
    for reg, w0, w1 in [
        ("none", 0.0, 0.0),
        ("unbiased", 2.5, 1.0),
        ("unbiased", 30.0, 30.0),
        ("unbiased", 100.0, 100.0),
    ]:
        print(f"=== {reg} w_reg={w0}→{w1} ===", flush=True)
        results.append(run(reg, w0, w1, steps, difficulty=difficulty))
    base = results[0]["final_eval_nfe"]
    base_acc = results[0]["final_eval_acc"]
    for r in results[1:]:
        r["nfe_reduction_vs_none"] = base / max(r["final_eval_nfe"], 1)
        # matched-accuracy control: reduction only counts if the regularized
        # arm reaches the unregularized arm's accuracy (within 2 points)
        r["acc_gap_vs_none"] = r["final_eval_acc"] - base_acc
        r["matched_accuracy"] = bool(r["final_eval_acc"] >= base_acc - 2.0)
    for r in results:
        r["difficulty"] = difficulty
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    for r in results:
        print(
            r["regularize"], r["w_reg"], "final_nfe", r["final_eval_nfe"],
            "acc", round(r["final_eval_acc"], 2),
            "reduction", round(r.get("nfe_reduction_vs_none", 1.0), 2),
        )


if __name__ == "__main__":
    main()
