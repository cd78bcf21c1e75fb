#!/usr/bin/env python
"""Per-attempt cost of the persistent forward solve at the paper tolerance.

The paper-tol train step is FORWARD-dominated (paper_tol_phase_probe:
value_only ~95% of the step). This probe separates per-attempt kernel
compute from fixed per-solve/dispatch overhead with the two-length
on-device chain pattern (relay doctrine, scripts/roofline.py): run the
solve N times in a dependent lax.fori chain at two N values and take the
slope, all inside ONE jit.

Floor to compare: the per-step fused Tsit5 kernel at 'highest' measured
44.6 us/attempt (roofline.json fused_fwd_highest_us), so a solve of A
attempts has compute floor ~A*44.6 us.

Usage: python scripts/persist_fwd_slope.py [n1=4] [n2=12]
"""
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


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = "none"  # pure solve: no reg step
    cfg.model.image_size = [28, 28]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 100
    cfg.model.solver.abstol = 1.4e-8
    cfg.model.solver.reltol = 1.4e-8
    cfg.model.solver.max_steps = 512
    cfg.dataset.train_batchsize = 512

    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    params, state = model.init(jax.random.PRNGKey(0))

    x_train, y_train, _, _ = synthetic_classification(
        (28, 28), 1, 10, n_train=2048, n_test=64, seed=0, difficulty="hard"
    )
    xb = jnp.asarray(x_train[:512])
    yb = jnp.asarray(one_hot(y_train[:512], 10))

    def chain(n):
        @jax.jit
        def run(x, eps):
            def body(i, carry):
                x_c, acc = carry
                # eps*i*1e-6: fresh input values per link (relay memo defeat)
                loss, _, stats = loss_fn(
                    model, params, state, (x_c + eps * (i + 1) * 1e-6, yb),
                    0.0, training=True,
                )
                return (x_c, acc + loss + 0.0 * stats["nfe"])

            _, acc = jax.lax.fori_loop(0, n, body, (x, 0.0))
            return acc

        return run

    run1, run2 = chain(n1), chain(n2)

    # NFE of one solve (same inputs)
    _, _, stats = loss_fn(model, params, state, (xb, yb), 0.0, training=True)
    nfe = int(stats["nfe"])
    attempts = (nfe - 2) // 6

    for tag, run, n in (("warm1", run1, n1), ("warm2", run2, n2)):
        t0 = time.time()
        float(run(xb, jnp.float32(1.0)))
        print(f"{tag}: compile+run {time.time()-t0:.1f}s", flush=True)

    t1s, t2s = [], []
    for rep in range(5):
        e = jnp.float32(rep + 2)
        t0 = time.perf_counter()
        float(run1(xb, e))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run2(xb, e))
        t2s.append(time.perf_counter() - t0)
    t1, t2 = np.median(t1s), np.median(t2s)
    per_solve = (t2 - t1) / (n2 - n1)
    per_attempt = per_solve / max(attempts, 1)
    print(f"nfe={nfe} attempts={attempts}")
    print(f"chain {n1}: {t1*1e3:.1f} ms   chain {n2}: {t2*1e3:.1f} ms")
    print(f"per-solve (slope): {per_solve*1e3:.2f} ms")
    print(f"per-attempt: {per_attempt*1e6:.1f} us "
          f"(fused-step floor 44.6 us; ratio "
          f"{per_attempt*1e6/44.6:.2f}x)")


if __name__ == "__main__":
    main()
