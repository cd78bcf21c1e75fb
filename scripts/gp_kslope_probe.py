#!/usr/bin/env python
"""On-device per-step time of the paper-tolerance train step, K-step-scan
slope, grad_precision match vs default (dense stored-adjoint path).

Per-call relay dispatch (~50-90 ms) swamps per-step effects in
host-dispatched loops (paper_tol_phase_probe), so this uses
train.steps_per_call machinery: ONE donated-jit call runs K optimizer
steps over a device-resident K-stacked batch; per-step time = slope
between K=K1 and K=K2 chains. Arms alternate per round in one process.

Usage: python scripts/gp_kslope_probe.py [K1=4] [K2=16] [rounds=4] [max_steps=512]
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
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.train import (
    create_train_state,
    make_multi_train_step,
)


def build(gp, max_steps):
    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = os.environ.get("LRN_REG", "unbiased")
    cfg.model.image_size = [28, 28]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 100
    cfg.model.solver.abstol = 1.4e-8
    cfg.model.solver.reltol = 1.4e-8
    cfg.model.solver.max_steps = max_steps
    cfg.model.solver.checkpoint_every = 16
    cfg.model.solver.grad_precision = gp
    cfg.loss.w_reg_start = 2.5
    cfg.loss.w_reg_end = 1.0
    cfg.dataset.train_batchsize = 512
    cfg.optimizer.learning_rate = 1e-3
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))

    def reduce_fn(loss, stats, data):
        return {"nfe": stats["nfe"].astype(jnp.float32), "loss": loss}

    stepK = make_multi_train_step(model, loss_fn, optimizer, reduce_fn)
    return ts, stepK


def main():
    K1 = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    K2 = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    max_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    x_train, y_train, _, _ = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=64, seed=0, difficulty="hard"
    )
    y_oh = one_hot(y_train, 10)
    rng = np.random.RandomState(0)

    def stack(K, i):
        idx = rng.randint(0, len(x_train), (K, 512))
        return (jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx]))

    arms = {}
    for gp in ("match", "default"):
        ts, stepK = build(gp, max_steps)
        # compile both K programs, warm state a little
        for K in (K1, K2):
            t0 = time.time()
            ts, _last, win = stepK(ts, stack(K, 0), jnp.full((K,), 2.5),
                                   jnp.full((K,), 1e-3))
            nfe = float(win["nfe"]) / K
            print(f"[{gp}] K={K} compiled {time.time()-t0:.0f}s "
                  f"nfe/step={nfe:.0f}", flush=True)
        arms[gp] = {"ts": ts, "stepK": stepK, "t1": [], "t2": [],
                    "nfe": nfe}

    for r in range(rounds):
        order = ("match", "default") if r % 2 == 0 else ("default", "match")
        for gp in order:
            a = arms[gp]
            for K, key in ((K1, "t1"), (K2, "t2")):
                t0 = time.perf_counter()
                a["ts"], _last, win = a["stepK"](
                    a["ts"], stack(K, 10 + r), jnp.full((K,), 2.5),
                    jnp.full((K,), 1e-3),
                )
                float(win["loss"])  # readback barrier
                a[key].append(time.perf_counter() - t0)
        print(f"round {r} done", flush=True)

    out = {"K1": K1, "K2": K2, "max_steps": max_steps,
           "backend": jax.default_backend()}
    for gp, a in arms.items():
        t1, t2 = np.median(a["t1"]), np.median(a["t2"])
        per_step = (t2 - t1) / (K2 - K1)
        out[gp] = {
            "per_step_ms": per_step * 1e3,
            "nfe_per_step": a["nfe"],
            "nfe_per_sec": a["nfe"] / per_step,
            "t1_ms": t1 * 1e3, "t2_ms": t2 * 1e3,
        }
        print(f"{gp}: per-step {per_step*1e3:.2f} ms  "
              f"nfe/s {a['nfe']/per_step:,.0f}", flush=True)
    if "match" in out and "default" in out:
        out["speedup"] = (
            out["match"]["per_step_ms"] / out["default"]["per_step_ms"]
        )
        print(f"speedup default vs match: {out['speedup']:.3f}x")
    with open(f"gp_kslope_{os.environ.get('LRN_REG', 'unbiased')}_{max_steps}.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
