#!/usr/bin/env python
"""Go/no-go probe for the batch-first conv orientation (round-2 verdict
item 2).

The CIFAR train step is conv-FLOP-bound at XLA's ~24 TFLOP/s effective
(RESULTS.md round 3); conv2 (65->64 3x3 at (32,32,32)) carries ~79% of
the FLOPs. This probe times ONLY that op in competing formulations:

  xla       lax.conv_general_dilated, NHWC (what the model uses today)
  xla_im    im2col built with XLA ops + one jnp.dot (orientation test
            without Pallas in the loop)
  tap       Pallas, batch-first flat (M=B*H*W, C): halo-padded scratch,
            9 static-offset sublane-slice matmuls (M,64)@(64,64) with
            in-kernel iota border masks folded into the accumulate
  im2col    Pallas, tiled: whole halo-padded x VMEM-resident; per tile
            build (TILE, 576) im2col scratch by 9 masked slice-copies,
            then one (TILE,576)@(576,64) matmul

Timing: jitted DEPENDENT chains (y feeds the next eval) at two lengths,
slope method (CLAUDE.md relay rules); fresh values each run.

Usage: python scripts/conv_orient_probe.py [out.json]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 32, 32, 32, 64
M = B * H * W
FLOPS = 2 * M * (9 * C) * C

TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
PAD = 64  # halo sublanes each side (>= W+1, multiple of 8)
TILE = 8192


def conv_xla(x_nhwc, w):
    """w: (3, 3, C, C)."""
    return lax.conv_general_dilated(
        x_nhwc, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_xla_im2col(x_flat, wcat):
    """x_flat: (M, C); wcat: (576, C). im2col via XLA pad+slice+concat."""
    xp = jnp.pad(x_flat.reshape(B, H, W, C), ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        lax.dynamic_slice(xp, (0, dy + 1, dx + 1, 0), (B, H, W, C))
        for dy, dx in TAPS
    ]
    xcat = jnp.concatenate(cols, axis=-1).reshape(M, 9 * C)
    return jnp.dot(xcat, wcat)


def _tap_masks(n, base):
    """Row/col validity masks, (n,1) f32, for each of the 9 taps."""
    i = base + lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col = i % W
    row = (i // W) % H
    out = []
    for dy, dx in TAPS:
        m = ((col + dx >= 0) & (col + dx < W)
             & (row + dy >= 0) & (row + dy < H))
        out.append(m.astype(jnp.float32))
    return out


def _tap_kernel(x_ref, w_ref, o_ref, xpad):
    xpad[pl.ds(0, PAD), :] = jnp.zeros((PAD, C), jnp.float32)
    xpad[pl.ds(PAD + M, PAD), :] = jnp.zeros((PAD, C), jnp.float32)
    xpad[pl.ds(PAD, M), :] = x_ref[...]
    masks = _tap_masks(M, 0)
    acc = jnp.zeros((M, C), jnp.float32)
    for t, (dy, dx) in enumerate(TAPS):
        d = dy * W + dx
        sl = xpad[pl.ds(PAD + d, M), :]
        y = jnp.dot(sl, w_ref[t], preferred_element_type=jnp.float32)
        acc = acc + masks[t] * y
    o_ref[...] = acc


def conv_pallas_tap(x_flat, wtap):
    """x_flat (M, C); wtap (9, C, C)."""
    return pl.pallas_call(
        _tap_kernel,
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M + 2 * PAD, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_flat, wtap)


def _im2col_kernel(x_ref, w_ref, o_ref, xcat):
    # x_ref: FULL (M + 2*PAD, C) halo-padded input, VMEM-resident.
    g = pl.program_id(0)
    base = g * TILE
    masks = _tap_masks(TILE, base)
    for t, (dy, dx) in enumerate(TAPS):
        d = dy * W + dx
        sl = x_ref[pl.ds(PAD + base + d, TILE), :]
        xcat[:, pl.ds(t * C, C)] = masks[t] * sl
    o_ref[...] = jnp.dot(
        xcat[...], w_ref[...], preferred_element_type=jnp.float32
    )


def conv_pallas_im2col(x_halo, wcat):
    """x_halo (M + 2*PAD, C) pre-padded; wcat (576, C)."""
    grid = M // TILE
    return pl.pallas_call(
        _im2col_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((M + 2 * PAD, C), lambda i: (0, 0)),
            pl.BlockSpec((9 * C, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, 9 * C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(x_halo, wcat)


def chain(fn, n):
    """Dependent chain: y = normalize(fn(y)) n times."""

    @jax.jit
    def run(x0, *consts):
        def body(_, y):
            z = fn(y, *consts)
            return z / (jnp.max(jnp.abs(z)) + 1e-6)

        return lax.fori_loop(0, n, body, x0)

    return run


def time_two_lengths(fn, consts, shape, n_lo=8, n_hi=40, reps=3):
    rng = np.random.RandomState(0)
    outs = {}
    for n in (n_lo, n_hi):
        run = chain(fn, n)
        x0 = jnp.asarray(rng.rand(*shape).astype(np.float32))
        jax.block_until_ready(run(x0, *consts))  # compile
        ts = []
        for k in range(reps):
            x0 = jnp.asarray(rng.rand(*shape).astype(np.float32) + 0.1 * k)
            t0 = time.perf_counter()
            r = run(x0, *consts)
            _ = float(jnp.sum(r))
            ts.append(time.perf_counter() - t0)
        outs[n] = min(ts)
    per = (outs[n_hi] - outs[n_lo]) / (n_hi - n_lo)
    return per, outs


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "conv_orient_probe.json"
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05)
    wtap = jnp.asarray(np.asarray(w).reshape(9, C, C))
    wcat = jnp.asarray(np.asarray(w).reshape(9 * C, C))

    results = {}

    # correctness cross-check
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    y_ref = conv_xla(x, w)
    y_tap = conv_pallas_tap(x.reshape(M, C), wtap).reshape(B, H, W, C)
    xh = jnp.pad(x.reshape(M, C), ((PAD, PAD), (0, 0)))
    y_im = conv_pallas_im2col(xh, wcat).reshape(B, H, W, C)
    y_xi = conv_xla_im2col(x.reshape(M, C), wcat).reshape(B, H, W, C)
    for name, y in [("tap", y_tap), ("im2col", y_im), ("xla_im", y_xi)]:
        err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
        print(f"parity {name}: rel max err {err:.2e}", flush=True)
        results[f"parity_{name}"] = err

    arms = {
        "xla": (lambda y, w_: conv_xla(y, w_), (w,), (B, H, W, C)),
        "xla_im": (lambda y, wc: conv_xla_im2col(y, wc), (wcat,), (M, C)),
        "tap": (lambda y, wt: conv_pallas_tap(y, wt), (wtap,), (M, C)),
        "im2col": (
            lambda y, wc: conv_pallas_im2col(
                jnp.pad(y, ((PAD, PAD), (0, 0))), wc
            ),
            (wcat,), (M, C)),
    }
    for name, (fn, consts, shape) in arms.items():
        try:
            per, raw = time_two_lengths(fn, consts, shape)
            tf = FLOPS / per / 1e12
            print(f"{name:8s} {per*1e6:8.1f} us/eval  {tf:6.1f} TF/s "
                  f"(raw {raw})", flush=True)
            results[name] = {"us_per_eval": per * 1e6, "tflops": tf}
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            results[name] = {"error": str(e)[:300]}

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
