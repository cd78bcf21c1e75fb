"""Pallas TPU kernels: fused time-dependent MLP dynamics and a fully fused
Tsit5 step.

The hot loop of the flagship model (SURVEY.md §3.1) evaluates a 2-layer
time-dependent MLP 6× per solver step. Generic XLA executes each stage as
two matmul kernels with the hidden activation and the stage output round-
tripping through HBM. These kernels keep everything in VMEM:

- ``fused_tdmlp``: one dynamics evaluation
  ``y = [tanh([x,s]·W1+b1), s]·W2 + b2`` with the time channel folded into
  per-stage bias terms (``[x,s]·W = x·W[:-1] + s·W[-1]``) — no concat
  materialization.
- ``fused_tsit5_step``: the entire 6-stage Tsit5 step (12 matmuls), per
  batch tile, with stage derivatives k2..k7, the 5th-order update and the
  embedded estimate ũ computed without leaving VMEM. Returns exactly what
  the generic ``ode.step.tsit5_step`` returns for this dynamics family.

Weights (784×100 + 100×784 ≈ 0.63 MB f32) are replicated into VMEM per grid
step; a 128-row batch tile needs ~7 k-buffers × 0.4 MB ≈ 3.5 MB — well
inside the ~16 MB/core VMEM budget.

On non-TPU backends the kernels run in Pallas interpreter mode, so the same
code path is unit-testable on the CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ode.tableaus import Tsit5Tableau as T
from .fused_mlp_bwd import fused_step_bwd


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _eval_mlp(x, s, w1, b1, w1t, w2, b2, w2t, precision=None):
    """One time-dependent MLP evaluation at scalar stage time s (in VMEM).

    ``precision`` sets the MXU input precision: None = backend default (one
    bf16 pass — inadequate below rtol 1e-4, see nn.resolve_solver_precision);
    'highest' = f32-exact multi-pass.
    """
    h = jnp.tanh(
        jnp.dot(x, w1, preferred_element_type=jnp.float32,
                precision=precision) + b1 + s * w1t
    )
    return (
        jnp.dot(h, w2, preferred_element_type=jnp.float32,
                precision=precision) + b2 + s * w2t
    )


def _tdmlp_kernel(precision, ts_ref, x_ref, w1_ref, b1_ref, w1t_ref, w2_ref,
                  b2_ref, w2t_ref, out_ref):
    s = ts_ref[0]
    out_ref[:] = _eval_mlp(
        x_ref[:], s, w1_ref[:], b1_ref[:], w1t_ref[:], w2_ref[:],
        b2_ref[:], w2t_ref[:], precision,
    )


def _step_kernel(precision, sc_ref, u_ref, k1_ref, w1_ref, b1_ref, w1t_ref,
                 w2_ref, b2_ref, w2t_ref, unew_ref, utilde_ref, k2_ref,
                 k3_ref, k4_ref, k5_ref, k6_ref, k7_ref, g6_ref):
    t = sc_ref[0]
    dt = sc_ref[1]
    u = u_ref[:]
    k1 = k1_ref[:]
    w = (w1_ref[:], b1_ref[:], w1t_ref[:], w2_ref[:], b2_ref[:], w2t_ref[:])

    def f(x, s):
        return _eval_mlp(x, s, *w, precision)

    k2 = f(u + dt * (T.a21 * k1), t + T.c1 * dt)
    k3 = f(u + dt * (T.a31 * k1 + T.a32 * k2), t + T.c2 * dt)
    k4 = f(u + dt * (T.a41 * k1 + T.a42 * k2 + T.a43 * k3), t + T.c3 * dt)
    k5 = f(
        u + dt * (T.a51 * k1 + T.a52 * k2 + T.a53 * k3 + T.a54 * k4),
        t + T.c4 * dt,
    )
    g6 = u + dt * (
        T.a61 * k1 + T.a62 * k2 + T.a63 * k3 + T.a64 * k4 + T.a65 * k5
    )
    k6 = f(g6, t + dt)
    u_new = u + dt * (
        T.a71 * k1 + T.a72 * k2 + T.a73 * k3 + T.a74 * k4 + T.a75 * k5
        + T.a76 * k6
    )
    k7 = f(u_new, t + dt)

    unew_ref[:] = u_new
    utilde_ref[:] = dt * (
        T.btilde1 * k1 + T.btilde2 * k2 + T.btilde3 * k3 + T.btilde4 * k4
        + T.btilde5 * k5 + T.btilde6 * k6 + T.btilde7 * k7
    )
    k2_ref[:] = k2
    k3_ref[:] = k3
    k4_ref[:] = k4
    k5_ref[:] = k5
    k6_ref[:] = k6
    k7_ref[:] = k7
    g6_ref[:] = g6


def _split_params(params, pad_hidden: bool = False) -> Tuple[jnp.ndarray, ...]:
    """TDChain(Dense(F+1→H, tanh), Dense(H+1→F)) params → kernel operands.
    The last input row of each weight is the time-channel column.

    ``pad_hidden`` zero-pads the hidden dim up to a multiple of 128 (MXU
    lane width) — mathematically exact: padded units see zero weight, zero
    bias and zero time column, so they output tanh(0)=0 and multiply zero
    rows of W2. Improves MXU utilization for H like 100.
    """
    p1 = params["layer_0"]
    p2 = params["layer_1"]
    w1 = p1["w"][:-1]
    w1t = p1["w"][-1][None, :]
    b1 = p1["b"][None, :]
    w2 = p2["w"][:-1]
    w2t = p2["w"][-1][None, :]
    b2 = p2["b"][None, :]
    if pad_hidden:
        h = w1.shape[1]
        h_pad = -(-h // 128) * 128
        if h_pad != h:
            extra = h_pad - h
            w1 = jnp.pad(w1, ((0, 0), (0, extra)))
            w1t = jnp.pad(w1t, ((0, 0), (0, extra)))
            b1 = jnp.pad(b1, ((0, 0), (0, extra)))
            w2 = jnp.pad(w2, ((0, extra), (0, 0)))
    return w1, b1, w1t, w2, b2, w2t


def _pick_tile(batch: int, features: int = 784, n_buffers: int = 20) -> int:
    """Largest divisor tile keeping ~n_buffers tile-sized f32 live values
    (stages + outputs + inputs) under a 10 MB VMEM budget. NOTE: v5e has
    128 MB physical VMEM, but bigger tiles measured SLOWER for these
    grid-pipelined kernels (whole-batch tiles lose the HBM/compute
    overlap of the sequential grid) — 10 MB lands on the measured-best
    128/64 tiles."""
    budget = 10 * 1024 * 1024
    cap = max(1, budget // (n_buffers * features * 4))
    for tb in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if tb <= cap and batch % tb == 0:
            return tb
    return min(batch, cap)


# --- pure-JAX twins (used for the custom backward passes; mathematically
# identical to the kernels, so jax.vjp of these transposes the fused ops)


def _pure_tdmlp(params, x, s, precision=None):
    # NOTE: deliberately unpadded — padding here (inside the custom-VJP
    # backward, under remat, per scan step) inflates XLA compile time badly
    # for no measured end-to-end win; the kernels pad independently.
    w1, b1, w1t, w2, b2, w2t = _split_params(params)
    return _eval_mlp(x, s, w1, b1[0], w1t[0], w2, b2[0], w2t[0], precision)


def _pure_step(params, u, t, dt, k1, precision=None):
    def f(x, s):
        return _pure_tdmlp(params, x, s, precision)

    k2 = f(u + dt * (T.a21 * k1), t + T.c1 * dt)
    k3 = f(u + dt * (T.a31 * k1 + T.a32 * k2), t + T.c2 * dt)
    k4 = f(u + dt * (T.a41 * k1 + T.a42 * k2 + T.a43 * k3), t + T.c3 * dt)
    k5 = f(
        u + dt * (T.a51 * k1 + T.a52 * k2 + T.a53 * k3 + T.a54 * k4),
        t + T.c4 * dt,
    )
    g6 = u + dt * (
        T.a61 * k1 + T.a62 * k2 + T.a63 * k3 + T.a64 * k4 + T.a65 * k5
    )
    k6 = f(g6, t + dt)
    u_new = u + dt * (
        T.a71 * k1 + T.a72 * k2 + T.a73 * k3 + T.a74 * k4 + T.a75 * k5
        + T.a76 * k6
    )
    k7 = f(u_new, t + dt)
    utilde = dt * (
        T.btilde1 * k1 + T.btilde2 * k2 + T.btilde3 * k3 + T.btilde4 * k4
        + T.btilde5 * k5 + T.btilde6 * k6 + T.btilde7 * k7
    )
    return (u_new, utilde, k2, k3, k4, k5, k6, k7, g6)


@functools.lru_cache(maxsize=None)
def get_fused_tdmlp(precision=None):
    """Fused dynamics evaluation at the given MXU input precision."""

    @jax.custom_vjp
    def fused_tdmlp(params, x, s):
        """One fused dynamics evaluation: x (B, F) → dx (B, F) at time s.
        Differentiable: backward transposes the pure-JAX twin."""
        return _fused_tdmlp_impl(params, x, s, precision)

    def _fwd(params, x, s):
        return _fused_tdmlp_impl(params, x, s, precision), (params, x, s)

    def _bwd(res, ct):
        params, x, s = res
        _, vjp = jax.vjp(
            lambda p_, x_, s_: _pure_tdmlp(p_, x_, s_, precision),
            params, x, s,
        )
        return vjp(ct)

    fused_tdmlp.defvjp(_fwd, _bwd)
    return fused_tdmlp


fused_tdmlp = get_fused_tdmlp(None)


def _fused_tdmlp_impl(params, x, s, precision=None):
    w1, b1, w1t, w2, b2, w2t = _split_params(params, pad_hidden=True)
    B, F = x.shape
    H = w1.shape[1]
    tb = _pick_tile(B, F, n_buffers=6)
    ts = jnp.asarray([s], jnp.float32)
    grid = (B // tb,)
    vspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_tdmlp_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            vspec((F, H)),
            vspec((1, H)),
            vspec((1, H)),
            vspec((H, F)),
            vspec((1, F)),
            vspec((1, F)),
        ],
        out_specs=pl.BlockSpec(
            (tb, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
        interpret=_interpret(),
    )(ts, x, w1, b1, w1t, w2, b2, w2t)


@functools.lru_cache(maxsize=None)
def get_fused_tsit5_step(precision=None):
    """Fused Tsit5 step at the given MXU input precision (None = backend
    default; 'highest' = f32-exact — REQUIRED below rtol 1e-4, where the
    default bf16-pass noise in ũ makes acceptance impossible)."""

    @jax.custom_vjp
    def fused_tsit5_step(params, u, t, dt, k1):
        """Entire Tsit5 step for the TD-MLP dynamics, fused in VMEM.

        Returns ``(u_new, utilde, k2, k3, k4, k5, k6, k7, g6)`` matching the
        generic step's contract (``ode/step.py``); 12 matmuls, no
        intermediate HBM traffic (stage derivatives are written out once for
        the dense-output interpolant). Differentiable via the hand-fused
        Pallas backward kernel.
        """
        return _fused_step_impl(params, u, t, dt, k1, precision)

    def _fwd(params, u, t, dt, k1):
        return (
            _fused_step_impl(params, u, t, dt, k1, precision),
            (params, u, t, dt, k1),
        )

    def _bwd(res, ct):
        """Hand-fused Pallas backward (fused_mlp_bwd.py): forward recompute
        + reverse through all stages + weight-grad accumulation in one
        kernel. Returns zero cotangents for (t, dt) — exact for every
        exposed gradient because the solver stop_gradient-fences both (see
        fused_mlp_bwd docstring; parity asserted in tests)."""
        params, u, t, dt, k1 = res
        # grad_precision=None: cotangent/weight-grad dots run at backend-fast
        # precision (gradients tolerate ~1e-3 relative noise; measured 2.4x
        # faster at 'highest' with 0.4% max weight-grad difference) — the
        # forward-recompute dots keep `precision`.
        return fused_step_bwd(
            params, u, t, dt, k1, tuple(ct), precision, grad_precision=None
        )

    fused_tsit5_step.defvjp(_fwd, _bwd)
    return fused_tsit5_step


fused_tsit5_step = get_fused_tsit5_step(None)


def _fused_step_bwd_reference(res, ct):
    _, vjp = jax.vjp(_pure_step, *res)
    return vjp(tuple(ct))


def _fused_step_impl(params, u, t, dt, k1, precision=None):
    w1, b1, w1t, w2, b2, w2t = _split_params(params, pad_hidden=True)
    B, F = u.shape
    H = w1.shape[1]
    tb = _pick_tile(B, F, n_buffers=20)
    sc = jnp.stack([jnp.asarray(t, jnp.float32), jnp.asarray(dt, jnp.float32)])
    grid = (B // tb,)
    tile = lambda: pl.BlockSpec(  # noqa: E731
        (tb, F), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_step_kernel, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile(),
            tile(),
            vspec((F, H)),
            vspec((1, H)),
            vspec((1, H)),
            vspec((H, F)),
            vspec((1, F)),
            vspec((1, F)),
        ],
        out_specs=tuple(tile() for _ in range(9)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, F), jnp.float32) for _ in range(9)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * B * (F * H + H * F),
            bytes_accessed=4 * (7 * B * F + 2 * (F * H)),
            transcendentals=6 * B * H,
        ),
        interpret=_interpret(),
    )(sc, u, k1, w1, b1, w1t, w2, b2, w2t)
    return out
