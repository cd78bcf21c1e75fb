#!/usr/bin/env python
"""Decompose the paper-tol train step's remaining ~40 ms (after
grad_precision='default' the K-slope shows 47.8 ms/step while the
inference forward costs 3.6 ms and the sweep ~4-6 ms).

Measures, at FIXED params (no optimizer, so NFE cannot drift between
arms), on-device K-chain slopes in ONE jit each:
  fwd_none      forward only, regularize='none' (inference-equivalent)
  fwd_unb       forward only, regularize='unbiased' (adds t1-saveat +
                fenced reg step)
  grad_none     value_and_grad, regularize='none' (adds knot recording +
                dense sweep)
  grad_unb      value_and_grad, regularize='unbiased' (the bench path
                minus adam)

Each chain reuses the SAME params/state and consumes a fresh epsilon per
link (relay-memo defeat). Per-solve time = (t(K2) - t(K1)) / (K2 - K1).

Usage: python scripts/paper_tol_decomp_probe.py [K1=3] [K2=9] [reps=5] [grad_precision=default]
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
from localregneuralde_tpu.harness.construct import construct_loss, construct_model
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification


def build(regularize, gp):
    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = regularize
    cfg.model.image_size = [28, 28]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 100
    cfg.model.solver.abstol = 1.4e-8
    cfg.model.solver.reltol = 1.4e-8
    cfg.model.solver.max_steps = 512
    cfg.model.solver.grad_precision = gp
    cfg.dataset.train_batchsize = 512
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, loss_fn, params, state


def main():
    K1 = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    K2 = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    gp = sys.argv[4] if len(sys.argv) > 4 else "default"

    x_train, y_train, _, _ = synthetic_classification(
        (28, 28), 1, 10, n_train=2048, n_test=64, seed=0, difficulty="hard"
    )
    xb = jnp.asarray(x_train[:512])
    yb = jnp.asarray(one_hot(y_train[:512], 10))

    out = {"K1": K1, "K2": K2, "grad_precision": gp,
           "backend": jax.default_backend()}

    def arm(tag, regularize, with_grad):
        model, loss_fn, params, state = build(regularize, gp)
        w = 2.5 if regularize != "none" else 0.0

        def one(x):
            if with_grad:
                l, g = jax.value_and_grad(
                    lambda p: loss_fn(
                        model, p, state, (x, yb), w, training=True
                    )[0]
                )(params)
                return l + jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b * b), g, 0.0
                )
            return loss_fn(model, params, state, (x, yb), w, training=True)[0]

        def chain(n):
            @jax.jit
            def run(x, eps):
                def body(i, acc):
                    return acc + one(x + eps * (i + 1) * 1e-6)

                return jax.lax.fori_loop(0, n, body, 0.0)

            return run

        r1, r2 = chain(K1), chain(K2)
        t0 = time.time()
        float(r1(xb, jnp.float32(1.0)))
        float(r2(xb, jnp.float32(1.0)))
        compile_s = time.time() - t0
        t1s, t2s = [], []
        for rep in range(reps):
            e = jnp.float32(rep + 2)
            t0 = time.perf_counter()
            float(r1(xb, e))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(r2(xb, e))
            t2s.append(time.perf_counter() - t0)
        per = (np.median(t2s) - np.median(t1s)) / (K2 - K1)
        out[tag] = {"per_solve_ms": per * 1e3, "compile_s": compile_s}
        print(f"{tag}: {per*1e3:.2f} ms/solve (compile {compile_s:.0f}s)",
              flush=True)

    arm("fwd_none", "none", False)
    arm("fwd_unb", "unbiased", False)
    arm("grad_none", "none", True)
    arm("grad_unb", "unbiased", True)

    print(json.dumps(out, indent=1))
    with open("paper_tol_decomp.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
