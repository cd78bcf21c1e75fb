#!/usr/bin/env python
"""TPU serving-throughput probe: the early-exit inference path, live vs
AOT-exported artifact, across batch sizes.

Trains the flagship briefly (so eval NFE is the trained-regime ~32, not
the random-init worst case), then times eval-mode forwards: (a) the live
jitted model, (b) the deserialized StableHLO artifact — same program
modulo the export round-trip, so the two should match; any gap is
serialization/calling-convention overhead.

Timing doctrine: jitted calls, fresh-ish inputs (pool of 8, params frozen
→ relay memoization can't help across distinct batches), one host
readback per trial, trimmed medians over N_TRIALS.

Writes serving_probe.json at the repo root.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCHES = (256, 1024, 4096)
TRAIN_STEPS = 150
N_TRIALS = 6
N_ITERS = 20


def _timed(fn, pool):
    # warmup
    jax.block_until_ready(fn(pool[0]))
    rates = []
    it = 0
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            y = fn(pool[it % len(pool)])
            it += 1
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        rates.append(N_ITERS / dt)
    rates.sort()
    k = max(1, len(rates) // 4)
    core = rates[k:-k] if len(rates) > 2 * k else rates
    return statistics.median(core)


def main():
    from bench import _batch_maker, _flagship_ode, _make_opt_and_state
    from localregneuralde_tpu.harness.train import make_train_step
    from localregneuralde_tpu.utils.export import (
        export_model,
        load_exported,
        save_exported,
    )

    model, loss_fn, _ = _flagship_ode(1e-4, 64)
    optimizer, ts = _make_opt_and_state(model)
    step = make_train_step(model, loss_fn, optimizer)
    make_batch = _batch_maker(512, (28, 28, 1))
    for i in range(TRAIN_STEPS):
        ts, loss, stats = step(ts, make_batch(i), 1.0, 1e-3)
    print(f"trained {TRAIN_STEPS} steps: loss={float(loss):.4f}", flush=True)

    params, state = ts.params, ts.state
    out = {"backend": jax.default_backend(), "train_steps": TRAIN_STEPS}
    rng = np.random.RandomState(23)
    for B in BATCHES:
        pool = [
            jnp.asarray(rng.rand(B, 28, 28, 1).astype("float32"))
            for _ in range(8)
        ]
        live = jax.jit(
            lambda x: model(params, state, x, training=False)[0]
        )
        art_path = f"/tmp/serve_{B}.stablehlo"
        save_exported(export_model(model, params, state, pool[0]), art_path)
        served = load_exported(art_path)

        # interleave the two arms per batch size
        r_live = _timed(live, pool)
        r_art = _timed(served, pool)
        r_live2 = _timed(live, pool)
        r_art2 = _timed(served, pool)
        out[f"b{B}_live_imgs_per_sec"] = round(
            B * statistics.median([r_live, r_live2]), 1
        )
        out[f"b{B}_artifact_imgs_per_sec"] = round(
            B * statistics.median([r_art, r_art2]), 1
        )
        y1, y2 = live(pool[0]), served(pool[0])
        out[f"b{B}_parity_max_abs"] = float(
            jnp.max(jnp.abs(y1 - y2))
        )
        print(json.dumps({k: v for k, v in out.items() if str(B) in k}),
              flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "serving_probe.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
