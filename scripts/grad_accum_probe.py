#!/usr/bin/env python
"""TPU probe: train.grad_accumulation on the flagship config.

Question: what does microbatched accumulation cost on the persistent
Pallas path? ga=N runs N sequential B/N solves per optimizer update —
same total dynamics FLOPs at ~N× the loop-machinery count, so the
per-NFE throughput ratio is the machinery overhead (plus any tile-shape
effect of the smaller microbatch).

Protocol (CLAUDE.md doctrine): both arms in ONE process, block-interleaved
(10 iters/block), fresh batch values per iteration from a pregenerated
pool, one host readback per block as the barrier, trimmed medians.

Usage: python scripts/grad_accum_probe.py [GA] [N_BLOCKS]
Writes grad_accum_probe.json at the repo root.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

GA = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ITERS_PER_BLOCK = 10


def main():
    import numpy as np

    from bench import _batch_maker, _flagship_ode, _make_opt_and_state
    from localregneuralde_tpu.harness.train import make_train_step

    model, loss_fn, nfe_of = _flagship_ode(1e-4, 64)
    optimizer, ts1 = _make_opt_and_state(model)
    _, tsG = _make_opt_and_state(model)
    step1 = make_train_step(model, loss_fn, optimizer)
    stepG = make_train_step(model, loss_fn, optimizer, grad_accumulation=GA)
    make_batch = _batch_maker(512, (28, 28, 1))

    # compile both arms up front
    ts1, l1, s1 = step1(ts1, make_batch(0), 1.0, 1e-3)
    tsG, lG, sG = stepG(tsG, make_batch(0), 1.0, 1e-3)
    jax.block_until_ready((l1, lG))

    res = {1: {"ms": [], "nfe": []}, GA: {"ms": [], "nfe": []}}
    it = 1
    for blk in range(N_BLOCKS):
        for arm, (step, ts_ref) in (
            (1, (step1, "ts1")), (GA, (stepG, "tsG"))
        ):
            ts = ts1 if arm == 1 else tsG
            nfes = []
            t0 = time.perf_counter()
            for _ in range(ITERS_PER_BLOCK):
                ts, loss, stats = step(ts, make_batch(it), 1.0, 1e-3)
                nfes.append(nfe_of(stats))
                it += 1
            _ = float(loss)  # host readback barrier
            dt = (time.perf_counter() - t0) / ITERS_PER_BLOCK
            res[arm]["ms"].append(dt * 1e3)
            res[arm]["nfe"].append(float(jnp.mean(jnp.stack(nfes))))
            if arm == 1:
                ts1 = ts
            else:
                tsG = ts

    out = {"ga": GA, "backend": jax.default_backend()}
    for arm in (1, GA):
        ms = statistics.median(res[arm]["ms"])
        nfe = statistics.median(res[arm]["nfe"])
        # an accumulated step's NFE sums over GA microbatches but each
        # eval is B/GA samples — weight by microbatch size so both arms
        # count the same unit (sample-evals)
        sample_evals = nfe * (512 // arm)
        out[f"arm{arm}_ms_per_step"] = round(ms, 3)
        out[f"arm{arm}_nfe_per_step"] = round(nfe, 1)
        out[f"arm{arm}_sample_evals_per_sec"] = round(
            sample_evals / (ms / 1e3), 1
        )
        out[f"arm{arm}_ms_band"] = [
            round(min(res[arm]["ms"]), 3), round(max(res[arm]["ms"]), 3)
        ]
    # per-step overhead of microbatching (same effective batch per step;
    # NFE drifts apart as each arm trains its own params — doctrine note)
    out["per_step_ratio"] = round(
        out[f"arm{GA}_ms_per_step"] / out["arm1_ms_per_step"], 3
    )
    out["sample_eval_throughput_ratio"] = round(
        out[f"arm{GA}_sample_evals_per_sec"]
        / out["arm1_sample_evals_per_sec"], 3
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "grad_accum_probe.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
