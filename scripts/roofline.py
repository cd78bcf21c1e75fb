#!/usr/bin/env python
"""Roofline accounting for the fused Tsit5 TD-MLP kernels (BASELINE.md
target: ≥70% of the relevant roofline or a quantified ceiling analysis).

Measures on the current device:
  1. peak matmul throughput: bf16 and f32-default and f32-highest at a large
     square shape (the *compute roof* for each input precision);
  2. the flagship stage-matmul shapes in isolation (B=512, F=784, H=128):
     what XLA itself achieves at these small shapes (the *shape roof*);
  3. an HBM bandwidth probe (big copy) — the *memory roof*;
  4. the fused fwd step kernel and fused bwd kernel: wall time, achieved
     FLOP/s (padded machine FLOPs and useful H=100 FLOPs), achieved GB/s;
  5. the XLA-composed pure-twin step (same math, unfused) for comparison.

Prints a JSON dict; paste into RESULTS.md.
"""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    out = {"backend": jax.default_backend()}
    B, F, H, Hp = 512, 784, 100, 128

    # 1. compute roofs (4096^3 matmul)
    N = 4096
    flops_big = 2 * N * N * N
    a16 = jnp.ones((N, N), jnp.bfloat16)
    a32 = jnp.ones((N, N), jnp.float32)
    mm = jax.jit(lambda a, b: a @ b)
    mm_hi = jax.jit(partial(jnp.matmul, precision="highest"))
    out["peak_bf16_tflops"] = flops_big / timeit(mm, a16, a16) / 1e12
    out["peak_f32_default_tflops"] = flops_big / timeit(mm, a32, a32) / 1e12
    out["peak_f32_highest_tflops"] = flops_big / timeit(mm_hi, a32, a32) / 1e12

    # 2. shape roof: the two stage matmuls at flagship shapes, f32
    x1 = jnp.ones((B, F), jnp.float32)
    w1 = jnp.ones((F, Hp), jnp.float32)
    h1 = jnp.ones((B, Hp), jnp.float32)
    w2 = jnp.ones((Hp, F), jnp.float32)
    fl_pair = 2 * B * F * Hp * 2

    def pair(x, w1, w2):
        return jnp.tanh(x @ w1) @ w2

    def pair_hi(x, w1, w2):
        return jnp.matmul(
            jnp.tanh(jnp.matmul(x, w1, precision="highest")), w2,
            precision="highest",
        )

    t_pair = timeit(jax.jit(pair), x1, w1, w2)
    t_pair_hi = timeit(jax.jit(pair_hi), x1, w1, w2)
    out["shape_pair_default_tflops"] = fl_pair / t_pair / 1e12
    out["shape_pair_highest_tflops"] = fl_pair / t_pair_hi / 1e12

    # 3. memory roof: copy 256 MB
    big = jnp.ones((64, 1024, 1024), jnp.float32)
    t_copy = timeit(jax.jit(lambda x: x + 1.0), big)
    out["hbm_gbps_copy"] = 2 * big.nbytes / t_copy / 1e9

    # 4. fused kernels
    from localregneuralde_tpu.ops.pallas.fused_mlp import (
        get_fused_tsit5_step, _split_params,
    )
    from localregneuralde_tpu.ops.pallas.fused_mlp_bwd import fused_step_bwd

    key = jax.random.PRNGKey(0)
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
    u = jax.random.normal(key, (B, F))
    k1 = jax.random.normal(key, (B, F))
    t_s = jnp.asarray(0.3)
    dt_s = jnp.asarray(0.05)

    flops_step_pad = 12 * 2 * B * F * Hp  # 12 matmuls at padded H
    flops_step_use = 12 * 2 * B * F * H
    bytes_fwd = 4 * (11 * B * F + 2 * F * Hp)  # 2 in + 9 out tiles + weights

    for label, prec in (("default", None), ("highest", "highest")):
        step = jax.jit(get_fused_tsit5_step(prec))
        t_fwd = timeit(step, params, u, t_s, dt_s, k1)
        out[f"fused_fwd_{label}_us"] = t_fwd * 1e6
        out[f"fused_fwd_{label}_tflops_padded"] = flops_step_pad / t_fwd / 1e12
        out[f"fused_fwd_{label}_tflops_useful"] = flops_step_use / t_fwd / 1e12
        out[f"fused_fwd_{label}_gbps"] = bytes_fwd / t_fwd / 1e9

        cts = tuple(jnp.ones((B, F)) for _ in range(9))
        bwd = jax.jit(
            lambda p, u_, k_, c: fused_step_bwd(
                p, u_, t_s, dt_s, k_, c, prec
            )
        )
        t_bwd = timeit(bwd, params, u, k1, cts)
        # bwd: 6 stage recomputes (12 mm) + 6*(dh,dx,dW1,dW2) (24 mm) = 36 mm
        flops_bwd = 36 * 2 * B * F * H
        out[f"fused_bwd_{label}_us"] = t_bwd * 1e6
        out[f"fused_bwd_{label}_tflops_useful"] = flops_bwd / t_bwd / 1e12

    # 5. XLA-composed pure twin (unfused, same math)
    from localregneuralde_tpu.ops.pallas.fused_mlp import _pure_step

    for label, prec in (("default", None), ("highest", "highest")):
        twin = jax.jit(lambda p, u_, k_: _pure_step(p, u_, t_s, dt_s, k_, prec))
        t_twin = timeit(twin, params, u, k1)
        out[f"xla_twin_fwd_{label}_us"] = t_twin * 1e6

    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
    print(json.dumps(out, indent=1))
    with open("roofline.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
