#!/usr/bin/env python
"""MXU input-precision ladder at the paper tolerance (rtol=atol=1.4e-8).

The framework auto-selects ``precision='highest'`` (6 bf16 passes = exact
f32 matmuls) below rtol 1e-4 because TPU-default single-pass-bf16 matmuls
flood the embedded error estimate with rounding noise (RESULTS.md). The
open question: does the intermediate ``'high'`` (3 bf16 passes, ~2x
cheaper per eval) clear the noise floor at the paper tolerance — and if
so, does the NFE inflation it pays stay under the per-eval savings?

Protocol (all in ONE process — relay drift rides both arms):
  1. Train the flagship paper config at 'highest' for ``train_steps``.
  2. FROZEN-params eval solve per arm ('highest', 'high'): NFE physics.
  3. If 'high' is viable (success AND NFE < 4x 'highest'), clone the
     trained state into both arms and block-interleave train-step timing
     (fresh batch values per step; float(loss) readback barrier).

Usage: python scripts/precision_ladder_probe.py \
           [train_steps=150] [max_steps=10000] [out.json]
"""
import copy
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.train import create_train_state, make_train_step
from paper_config_run import make_cfg

BLOCK = 8          # steps per interleave block
N_BLOCKS = 4       # blocks per arm in the timing phase


def build(precision, steps, max_steps):
    cfg = make_cfg("unbiased", steps, max_steps)
    cfg.model.solver.precision = precision
    model = construct_model(cfg)
    loss_fn, w_sched = construct_loss(cfg)
    optimizer, lr_sched = construct_optimizer(cfg)
    return cfg, model, loss_fn, w_sched, optimizer, lr_sched


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else "precision_ladder.json"

    x_train, y_train, x_test, y_test = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=2048, seed=0
    )
    y_oh = one_hot(y_train, 10)
    rng = np.random.RandomState(0)

    # --- phase 1: train at 'highest' (the shipped auto choice) ---
    cfg, model, loss_fn, w_sched, optimizer, lr_sched = build(
        "highest", train_steps, max_steps
    )
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(cfg.seed))
    train_step = make_train_step(model, loss_fn, optimizer)
    print(f"=== phase 1: train {train_steps} steps at 'highest' "
          f"(max_steps={max_steps}) ===", flush=True)
    for step in range(1, train_steps + 1):
        idx = rng.randint(0, len(x_train), 512)
        xb, yb = jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx])
        ts, loss, stats = train_step(
            ts, (xb, yb), float(w_sched(step)), float(lr_sched(step))
        )
        if step in (1, 2) or step % 25 == 0:
            print(f"  step {step}: nfe={int(stats['nfe'])} "
                  f"loss={float(loss):.4f}", flush=True)

    # --- phase 2: frozen-params eval NFE per precision arm ---
    xe = jnp.asarray(x_test[:1024])
    ye = jnp.asarray(one_hot(y_test[:1024], 10))
    evals = {}
    for prec in ("highest", "high"):
        _, m_p, lf_p, _, _, _ = build(prec, train_steps, max_steps)
        t0 = time.time()
        _, _, st_e = lf_p(m_p, ts.params, ts.state, (xe, ye), 0.0,
                          training=False)
        nfe = int(st_e["nfe"])
        ok = bool(st_e.get("solver_success", True))
        evals[prec] = {"nfe": nfe, "success": ok,
                       "wall_s_incl_compile": time.time() - t0}
        print(f"=== phase 2 [{prec}]: eval nfe={nfe} success={ok} ===",
              flush=True)

    result = {"train_steps": train_steps, "max_steps": max_steps,
              "frozen_eval": evals, "backend": jax.default_backend()}

    # --- phase 3: block-interleaved train-step timing ---
    viable = (evals["high"]["success"]
              and evals["high"]["nfe"] < 4 * max(evals["highest"]["nfe"], 1))
    result["high_viable"] = viable
    try:
        _timing_phase(viable, result, ts, arms_factory=lambda prec: build(
            prec, train_steps, max_steps), rng=rng,
            x_train=x_train, y_oh=y_oh, train_steps=train_steps)
    except Exception as e:  # e.g. Mosaic declining HIGH-precision dots
        result["timing_error"] = f"{type(e).__name__}: {e}"
        print(f"timing phase failed: {result['timing_error']}", flush=True)

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}", flush=True)


def _timing_phase(viable, result, ts, arms_factory, rng, x_train, y_oh,
                  train_steps):
    if viable:
        arms = {}
        for prec in ("highest", "high"):
            _, m_p, lf_p, ws_p, opt_p, lrs_p = arms_factory(prec)
            arms[prec] = {
                "ts": copy.deepcopy(ts),
                "step": make_train_step(m_p, lf_p, opt_p),
                "w": ws_p, "lr": lrs_p,
                "times": [], "nfes": [],
            }
        order = ["highest", "high"]
        gstep = train_steps
        for blk in range(2 * N_BLOCKS):
            prec = order[blk % 2]
            a = arms[prec]
            for _ in range(BLOCK):
                gstep += 1
                idx = rng.randint(0, len(x_train), 512)
                xb = jnp.asarray(x_train[idx])
                yb = jnp.asarray(y_oh[idx])
                t0 = time.time()
                a["ts"], loss, stats = a["step"](
                    a["ts"], (xb, yb),
                    float(a["w"](gstep)), float(a["lr"](gstep)),
                )
                _ = float(loss)  # host readback barrier
                el = time.time() - t0
                if blk >= 2:  # both arms compiled/warm after first pair
                    a["times"].append(el)
                    a["nfes"].append(int(stats["nfe"]))
            print(f"  block {blk} [{prec}] last_step={el*1e3:.1f} ms "
                  f"nfe={int(stats['nfe'])}", flush=True)
        for prec, a in arms.items():
            result[prec] = {
                "median_step_s": statistics.median(a["times"]),
                "mean_nfe": float(np.mean(a["nfes"])),
                "nfe_per_s": float(np.mean(a["nfes"]))
                / statistics.median(a["times"]),
            }
        result["high_speedup_steptime"] = (
            result["highest"]["median_step_s"]
            / result["high"]["median_step_s"]
        )
        print(json.dumps({k: result[k] for k in
                          ("highest", "high", "high_speedup_steptime")},
                         indent=1), flush=True)


if __name__ == "__main__":
    main()
