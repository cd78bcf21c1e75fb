#!/usr/bin/env python
"""Interleaved A/B: persistent 'vpsde' kernel vs the XLA loop for
``sample_vpsde`` on the score-SDE demo config (B=4096, F=2, 3-layer
TD score net, SOSRI, rtol=atol=1e-2).

Timing doctrine (CLAUDE.md): both arms in ONE process, block-interleaved
(~K iters/block) to dodge relay drift; fresh noise key every call so the
relay's (executable, inputs) memoization cannot fire; one host readback
per block as the barrier. Reports per-arm median block rates and the
paired per-round ratio (median of per-round kernel/xla), plus NFE match.

Usage: python scripts/vpsde_ab.py [rounds=8] [iters_per_block=6] [out.json] [sampler=sde|pf]

``sampler=pf`` measures the deterministic probability-flow sampler
('pfode' Tsit5 kernel family) instead; NFE there = 2 init + 6/attempt.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.models.score_sde import (
    sample_probability_flow,
    sample_vpsde,
)
from localregneuralde_tpu.models import TDChain
from localregneuralde_tpu.nn import Dense

B, F = 4096, 2
RTOL = 1e-2
MAX_STEPS = 512


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    out_path = sys.argv[3] if len(sys.argv) > 3 else "vpsde_ab.json"
    sampler = sys.argv[4] if len(sys.argv) > 4 else "sde"
    evals_per_attempt = 8 if sampler == "sde" else 6

    net = TDChain(Dense(3, 64, "tanh"), Dense(65, 64, "tanh"), Dense(65, 2))
    params, _ = net.init(jax.random.PRNGKey(0))

    def make(use_pallas):
        @jax.jit
        def draw(key):
            if sampler == "sde":
                s, sol = sample_vpsde(
                    None, (B, F), key, params, score_module=net,
                    use_pallas=use_pallas, rtol=RTOL, atol=RTOL,
                    solver="sosri", max_steps=MAX_STEPS,
                )
            else:
                s, sol = sample_probability_flow(
                    None, (B, F), key, params, score_module=net,
                    use_pallas=use_pallas, rtol=RTOL, atol=1e-4,
                    max_steps=MAX_STEPS,
                )
            return (jnp.sum(s), sol.naccept + sol.nreject, sol.naccept,
                    sol.success)

        return draw

    arms = {"kernel": make(True), "xla": make(False)}

    # compile both arms up front (first TPU compile is minutes)
    for name, fn in arms.items():
        t0 = time.perf_counter()
        out = fn(jax.random.PRNGKey(99))
        s, natt, nacc, ok = (float(out[0]), int(out[1]), int(out[2]),
                             bool(out[3]))
        print(f"compiled {name}: {time.perf_counter()-t0:.1f}s "
              f"natt={natt} naccept={nacc} success={ok}", flush=True)
        assert ok

    k = [0]

    def block(fn):
        t0 = time.perf_counter()
        tot_natt = jnp.int32(0)
        last = None
        for _ in range(iters):
            k[0] += 1
            out = fn(jax.random.PRNGKey(1000 + k[0]))
            tot_natt = tot_natt + out[1]
            last = out[0]
        _ = float(last)  # barrier
        dt = time.perf_counter() - t0
        # dynamics evals/s (sde: 4 f + 4 g per attempt; pf: 6 f)
        return int(tot_natt) * evals_per_attempt * B / dt, dt

    recs = {"kernel": [], "xla": []}
    ratios = []
    for r in range(rounds):
        order = ["kernel", "xla"] if r % 2 == 0 else ["xla", "kernel"]
        rr = {}
        for name in order:
            rate, dt = block(arms[name])
            recs[name].append(rate)
            rr[name] = rate
            print(f"round {r} {name}: {rate/1e6:.3f} M evals/s "
                  f"({dt:.2f}s)", flush=True)
        ratios.append(rr["kernel"] / rr["xla"])

    med = {n: float(np.median(v)) for n, v in recs.items()}
    res = dict(
        config=dict(B=B, F=F, rtol=RTOL, sampler=sampler,
                    solver="sosri" if sampler == "sde" else "tsit5",
                    max_steps=MAX_STEPS, rounds=rounds, iters=iters),
        kernel_evals_per_sec=med["kernel"],
        xla_evals_per_sec=med["xla"],
        ratio_median=float(np.median(ratios)),
        ratio_band=[float(min(ratios)), float(max(ratios))],
        kernel_rates=recs["kernel"],
        xla_rates=recs["xla"],
    )
    print(json.dumps(res, indent=1), flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
