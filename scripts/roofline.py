#!/usr/bin/env python
"""Roofline accounting for the fused Tsit5 TD-MLP kernels (BASELINE.md
target: ≥70% of the relevant roofline or a quantified ceiling analysis).

Timing methodology: every iteration's input depends on the previous
iteration's output (serial chains), because the axon relay can coalesce
repeated identical executions — independent-call timing reads 20x+ above
physical peak. Chained timing measures true device throughput.

Measures: compute roofs (big-matmul bf16 / f32-default / f32-highest), the
flagship stage shapes in isolation, an HBM bandwidth probe, the fused
fwd/bwd kernels at both precisions, and the XLA-composed twin.
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def chain_time(step_fn, carry, n1=50, n2=400, outer=3):
    """Per-iteration device time of a serial on-device chain, free of fixed
    overheads: runs jitted fori_loops of n1 and n2 chained applications and
    takes the SLOPE (T(n2) − T(n1)) / (n2 − n1). The axon tunnel has ~30 ms
    fixed sync cost per dispatch and may coalesce identical independent
    calls — the slope of two different-length chains cancels every
    per-dispatch constant. Median of ``outer`` pairs."""
    from functools import partial
    from jax import lax

    @partial(jax.jit, static_argnums=1)
    def run(c, n):
        return lax.fori_loop(0, n, lambda i, cc: step_fn(cc), c)

    jax.block_until_ready(run(carry, n1))  # compile both
    jax.block_until_ready(run(carry, n2))
    slopes = []
    for _ in range(outer):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry, n1))
        t1 = time.perf_counter()
        jax.block_until_ready(run(carry, n2))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return max(sorted(slopes)[len(slopes) // 2], 1e-9)


def main():
    out = {"backend": jax.default_backend()}
    B, F, H, Hp = 512, 784, 100, 128
    # per-run salt: the axon relay MEMOIZES (executable, inputs) pairs
    # ACROSS PROCESSES — a re-run with identical seeds returns cached
    # results for any unchanged measurement (observed: a 205 PF/s "shape
    # roof"). A fresh key per run makes every carrier unique.
    key = jax.random.PRNGKey(time.time_ns() % (2**31))

    # 1. compute roofs: y <- normalize(y) @ a, 4096^3
    N = 4096
    flops_big = 2 * N * N * N
    a32 = jax.random.normal(key, (N, N), jnp.float32) / jnp.sqrt(N)
    a16 = a32.astype(jnp.bfloat16)

    def mk_mm(a, prec):
        def step(y):
            y = jnp.matmul(y, a, precision=prec)
            return y / jnp.sqrt(jnp.mean(y * y) + 1e-6)  # keep bounded

        return step

    out["peak_bf16_tflops"] = flops_big / chain_time(
        mk_mm(a16, None), a16, n1=10, n2=60
    ) / 1e12
    out["peak_f32_default_tflops"] = flops_big / chain_time(
        mk_mm(a32, None), a32, n1=10, n2=60
    ) / 1e12
    out["peak_f32_highest_tflops"] = flops_big / chain_time(
        mk_mm(a32, "highest"), a32, n1=5, n2=30
    ) / 1e12

    # 2. shape roof: tanh(x@W1)@W2 at flagship shapes, chained on x
    w1 = jax.random.normal(key, (F, Hp)) * 0.05
    w2 = jax.random.normal(key, (Hp, F)) * 0.05
    fl_pair = 2 * B * F * Hp * 2

    def mk_pair(prec):
        def step(x):
            return jnp.tanh(jnp.matmul(
                jnp.tanh(jnp.matmul(x, w1, precision=prec)), w2,
                precision=prec,
            ))

        return step

    x0 = jax.random.normal(key, (B, F))
    # long chains: at ~1 µs/iter the default n1/n2 delta (~0.4 ms) can
    # drown in dispatch jitter and collapse the slope to the 1e-9 floor
    # (measured: a bit-exact 205,520 "TF/s" = fl_pair/1e-9 twice in a row)
    out["shape_pair_default_tflops"] = fl_pair / chain_time(
        mk_pair(None), x0, n1=400, n2=4000
    ) / 1e12
    out["shape_pair_highest_tflops"] = fl_pair / chain_time(
        mk_pair("highest"), x0, n1=100, n2=1000
    ) / 1e12

    # 3. memory roof: x <- x*1.0000001 + 1e-9 over 256 MB (read+write)
    big = jax.random.normal(key, (64, 1024, 1024), jnp.float32)
    t_copy = chain_time(lambda x: x * 1.0000001 + 1e-9, big, n1=20, n2=120)
    out["hbm_gbps"] = 2 * big.nbytes / t_copy / 1e9

    # 4. fused kernels (chained: u <- u_new, k1 <- k7)
    from localregneuralde_tpu.ops.pallas.fused_mlp import (
        get_fused_tsit5_step, _pure_step,
    )
    from localregneuralde_tpu.ops.pallas.fused_mlp_bwd import fused_step_bwd

    params = {
        "layer_0": {
            "w": jax.random.normal(key, (F + 1, H)) * 0.05,
            "b": jnp.zeros((H,)),
        },
        "layer_1": {
            "w": jax.random.normal(key, (H + 1, F)) * 0.05,
            "b": jnp.zeros((F,)),
        },
    }
    u0 = jax.random.normal(key, (B, F))
    k10 = jax.random.normal(key, (B, F))
    t_s = jnp.asarray(0.3)
    dt_s = jnp.asarray(0.01)

    flops_step_pad = 12 * 2 * B * F * Hp
    flops_step_use = 12 * 2 * B * F * H
    bytes_fwd = 4 * (11 * B * F + 2 * F * Hp)

    for label, prec in (("default", None), ("highest", "highest")):
        fused = get_fused_tsit5_step(prec)

        def fwd_chain(c, fused=fused):
            u, k1 = c
            r = fused(params, u, t_s, dt_s, k1)
            return (jnp.tanh(r[0]), jnp.tanh(r[7]))  # u_new, k7, bounded

        t_fwd = chain_time(fwd_chain, (u0, k10))
        out[f"fused_fwd_{label}_us"] = t_fwd * 1e6
        out[f"fused_fwd_{label}_tflops_padded"] = flops_step_pad / t_fwd / 1e12
        out[f"fused_fwd_{label}_tflops_useful"] = flops_step_use / t_fwd / 1e12
        out[f"fused_fwd_{label}_gbps"] = bytes_fwd / t_fwd / 1e9

        def bwd_chain(c, prec=prec):
            du, dk1 = c
            cts = (du, dk1, du, dk1, du, dk1, du, dk1, du)
            d_params, du2, _, _, dk12 = fused_step_bwd(
                params, u0, t_s, dt_s, k10, cts, prec
            )
            n = jnp.tanh(du2)  # keep magnitudes bounded
            return (n, jnp.tanh(dk12))

        t_bwd = chain_time(bwd_chain, (u0, k10))
        flops_bwd = 36 * 2 * B * F * H
        out[f"fused_bwd_{label}_us"] = t_bwd * 1e6
        out[f"fused_bwd_{label}_tflops_useful"] = flops_bwd / t_bwd / 1e12

        def twin_chain(c, prec=prec):
            u, k1 = c
            r = _pure_step(params, u, t_s, dt_s, k1, prec)
            return (jnp.tanh(r[0]), jnp.tanh(r[7]))

        t_twin = chain_time(twin_chain, (u0, k10))
        out[f"xla_twin_fwd_{label}_us"] = t_twin * 1e6

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out, indent=1))
    with open("roofline.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
