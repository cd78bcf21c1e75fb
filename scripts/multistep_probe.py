#!/usr/bin/env python
"""Multi-step fused train call: dispatch-amortization A/B on the flagship.

Measures optimizer steps/s for K=1 (one host dispatch per step — the
classic loop) vs K=8 (``train.make_multi_train_step``: one donated jit
scanning 8 steps) on the flagship MNIST MLP Neural-ODE config (rtol 1e-4,
batch 512, persistent Pallas kernels on TPU).

Honesty protocol (CLAUDE.md): both arms run in ONE process with
block-interleaved timing (relay drift rides both arms); fresh batch
values every step (params evolve, so no (executable, inputs) pair ever
repeats); one host readback per block as the barrier. Each arm keeps its
OWN train state (cloned from one init) so executables never retrace;
per-arm NFE is reported so params-divergence confounds are visible.

Usage: python scripts/multistep_probe.py [blocks=6] [steps_per_block=32]
           [K=8] [out.json]
Env:   LRN_CPU=1 forces the CPU backend.
       LRN_DEVICE_POOL=1 cycles a pregenerated DEVICE-RESIDENT batch pool
       instead of shipping fresh host batches — isolates dispatch
       amortization from host->device transfer (through the axon tunnel a
       fresh 512x784 f32 batch is ~1.6 MB/step and dominates BOTH arms;
       measured 2026-08-19: host-batch mode 102 vs 94 ms/step = 1.09x).
       Params evolve every step, so relay memoization cannot fire even
       with repeated batch values (CLAUDE.md freshness doctrine: the memo
       key is (executable, inputs) and the TrainState input never repeats).
"""
import json
import os
import statistics
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
    make_train_step,
)


def main():
    blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spb = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    out_path = sys.argv[4] if len(sys.argv) > 4 else "multistep_probe.json"
    assert spb % K == 0, "steps_per_block must be a multiple of K"

    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.image_size = [28, 28]
    cfg.model.in_channels = 1
    cfg.model.regularize = "unbiased"
    cfg.model.solver.abstol = 1e-4
    cfg.model.solver.reltol = 1e-4
    cfg.model.solver.max_steps = 64
    cfg.model.solver.checkpoint_every = 0
    cfg.dataset.train_batchsize = 512
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)

    step1 = make_train_step(model, loss_fn, optimizer)

    def reduce_fn(loss, stats, data):
        return {"loss": loss, "nfe": stats["nfe"].astype(jnp.float32)}

    stepK = make_multi_train_step(model, loss_fn, optimizer, reduce_fn)

    x_train, y_train, *_ = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=64, seed=0
    )
    y_oh = one_hot(y_train, 10)
    rng = np.random.RandomState(7)

    if os.environ.get("LRN_DEVICE_POOL"):
        n_pool = 16
        pool = []
        for _ in range(n_pool):
            idx = rng.randint(0, len(x_train), 512)
            pool.append(
                (jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx]))
            )
        jax.block_until_ready(pool)

        def batch(i):
            return pool[i % n_pool]

        stacked = []
        for s in range(n_pool):
            bs = [pool[(s + j) % n_pool] for j in range(K)]
            stacked.append(
                (
                    jnp.stack([b[0] for b in bs]),
                    jnp.stack([b[1] for b in bs]),
                )
            )
        jax.block_until_ready(stacked)

        def batch_stack(i):
            return stacked[(i // K) % n_pool]
    else:

        def batch(i):
            idx = rng.randint(0, len(x_train), 512)
            return jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx])

        def batch_stack(i):
            bs = [batch(i + j) for j in range(K)]
            return (
                jnp.stack([b[0] for b in bs]),
                jnp.stack([b[1] for b in bs]),
            )

    ts0 = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    clone = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.asarray(x).copy(), t
    )
    ts1, tsK = clone(ts0), clone(ts0)
    wK = jnp.full((K,), 1.0, jnp.float32)
    lrK = jnp.full((K,), 1e-3, jnp.float32)

    # compile both arms before timing
    ts1, l1, s1 = step1(ts1, batch(0), 1.0, 1e-3)
    _ = float(l1)
    tsK, lK, rK = stepK(tsK, batch_stack(0), wK, lrK)
    _ = float(lK)

    t1s, tKs, nfe1, nfeK = [], [], 0.0, 0.0
    it = 1
    for b in range(blocks):
        # arm 1: spb single-step dispatches
        t0 = time.perf_counter()
        for _ in range(spb):
            ts1, l1, s1 = step1(ts1, batch(it), 1.0, 1e-3)
            nfe_last = s1["nfe"]
            it += 1
        _ = float(l1)
        t1s.append((time.perf_counter() - t0) / spb)
        nfe1 = float(nfe_last)

        # arm K: spb/K multi-step dispatches
        t0 = time.perf_counter()
        for _ in range(spb // K):
            tsK, lK, rK = stepK(tsK, batch_stack(it), wK, lrK)
            it += K
        _ = float(lK)
        tKs.append((time.perf_counter() - t0) / spb)
        nfeK = float(rK["nfe"]) / K
        print(
            f"block {b}: single {t1s[-1]*1e3:.2f} ms/step, "
            f"K={K} {tKs[-1]*1e3:.2f} ms/step "
            f"(nfe/step {nfe1:.0f} vs {nfeK:.0f})",
            flush=True,
        )

    med1 = statistics.median(t1s)
    medK = statistics.median(tKs)
    out = {
        "backend": jax.default_backend(),
        "K": K,
        "blocks": blocks,
        "steps_per_block": spb,
        "single_ms_per_step": round(med1 * 1e3, 3),
        "multi_ms_per_step": round(medK * 1e3, 3),
        "speedup": round(med1 / medK, 3),
        "single_ms_band": [round(min(t1s) * 1e3, 3), round(max(t1s) * 1e3, 3)],
        "multi_ms_band": [round(min(tKs) * 1e3, 3), round(max(tKs) * 1e3, 3)],
        "final_nfe_per_step": {"single": nfe1, "multi": nfeK},
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
