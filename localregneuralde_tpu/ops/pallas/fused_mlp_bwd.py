"""Hand-fused Pallas backward kernel for the fused Tsit5 TD-MLP step.

The training step is backward-dominated: the naive custom VJP transposes the
pure-JAX twin, paying an unfused XLA forward recompute + backward (~24
matmul kernels with HBM round trips per solver step). This kernel fuses the
whole thing — forward recompute of the 6 stages, reverse-mode through the
stage chain, and weight-gradient accumulation — into a single Pallas call
per step, with weight grads accumulated across batch tiles through the
sequential TPU grid.

Stage math (per dynamics eval at time s):
    z = x·W1 + b1 + s·w1t ;  h = tanh(z) ;  k = h·W2 + b2 + s·w2t
VJP: dh = dk·W2ᵀ ; dz = dh·(1−h²) ; dx = dz·W1ᵀ ;
     dW1 += xᵀ·dz ; db1 += Σ_rows dz ; dw1t += s·Σ_rows dz ;
     dW2 += hᵀ·dk ; db2 += Σ_rows dk ; dw2t += s·Σ_rows dk.

Cotangents for (t, dt) are returned as zeros: inside the solver both are
produced under ``stop_gradient`` (controller fencing), so their true
cotangents are annihilated upstream — zeros are exact for every gradient
the framework exposes (asserted against the pure-twin VJP in tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ode.tableaus import Tsit5Tableau as T


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stage_coeffs():
    """(a_ij rows for stage inputs, c_i stage-time fractions)."""
    return (
        ((T.a21,), T.c1),
        ((T.a31, T.a32), T.c2),
        ((T.a41, T.a42, T.a43), T.c3),
        ((T.a51, T.a52, T.a53, T.a54), T.c4),
        ((T.a61, T.a62, T.a63, T.a64, T.a65), 1.0),
        ((T.a71, T.a72, T.a73, T.a74, T.a75, T.a76), 1.0),
    )


_BTILDE = (T.btilde1, T.btilde2, T.btilde3, T.btilde4, T.btilde5, T.btilde6,
           T.btilde7)


def _bwd_kernel(precision, grad_precision, sc_ref, u_ref, k1_ref,
                w1_ref, b1_ref, w1t_ref, w2_ref, b2_ref, w2t_ref,
                d_unew_ref, d_utilde_ref, d_k2_ref, d_k3_ref, d_k4_ref,
                d_k5_ref, d_k6_ref, d_k7_ref, d_g6_ref,
                du_ref, dk1_ref, dw1_ref, db1_ref, dw1t_ref, dw2_ref,
                db2_ref, dw2t_ref):
    t = sc_ref[0]
    dt = sc_ref[1]
    u = u_ref[:]
    k1 = k1_ref[:]
    w1, b1, w1t = w1_ref[:], b1_ref[:], w1t_ref[:]
    w2, b2, w2t = w2_ref[:], b2_ref[:], w2t_ref[:]

    # ---- forward recompute (keep stage inputs x_i and hiddens h_i live)
    ks = [k1]
    xs = []
    hs = []
    ss = []
    for (a_row, c) in _stage_coeffs():
        x = u
        for a, k in zip(a_row, ks):
            x = x + (dt * a) * k
        s = t + c * dt
        z = jnp.dot(x, w1, preferred_element_type=jnp.float32, precision=precision) + b1 + s * w1t
        h = jnp.tanh(z)
        k_new = (
            jnp.dot(h, w2, preferred_element_type=jnp.float32,
                    precision=precision) + b2 + s * w2t
        )
        ks.append(k_new)
        xs.append(x)
        hs.append(h)
        ss.append(s)
    # After the loop: ks = [k1..k7]; xs/hs/ss hold the 6 evals producing
    # k2..k7. The a6-row input is g6 (xs[4]); the a7-row input is u_new
    # (xs[5]) — the FSAL evaluation.

    # ---- backward
    zero = jnp.zeros_like(u)
    d_ks = [zero] * 7  # cotangents for k1..k7
    d_u = jnp.zeros_like(u)

    d_ct = (d_k2_ref[:], d_k3_ref[:], d_k4_ref[:], d_k5_ref[:], d_k6_ref[:],
            d_k7_ref[:])
    d_utilde = d_utilde_ref[:]
    d_unew = d_unew_ref[:]
    d_g6 = d_g6_ref[:]

    # utilde = dt * Σ btilde_i k_i
    for i in range(7):
        d_ks[i] = d_ks[i] + (dt * _BTILDE[i]) * d_utilde
    # explicit stage cotangents k2..k7
    for i in range(6):
        d_ks[i + 1] = d_ks[i + 1] + d_ct[i]

    d_x_pending = [zero] * 6  # cotangent flowing into each stage input x_i

    # stage-input cotangent seeds: x7 = u_new gets d_unew (+ dx from k7's
    # own vjp, handled in the loop); g6 (= x of stage k6) gets d_g6.
    d_x_pending[5] = d_x_pending[5] + d_unew
    d_x_pending[4] = d_x_pending[4] + d_g6

    coeffs = _stage_coeffs()
    dzs = [None] * 6
    dks_out = [None] * 6
    for i in reversed(range(6)):  # stage evals producing k_{i+2}... k7
        dk = d_ks[i + 1]
        # vjp through k = h·W2 + b2 + s·w2t ; h = tanh(z) ; z = x·W1 + ...
        h = hs[i]
        s = ss[i]
        dh = jnp.dot(dk, w2.T, preferred_element_type=jnp.float32, precision=grad_precision)
        dz = dh * (1.0 - h * h)
        dx = jnp.dot(dz, w1.T, preferred_element_type=jnp.float32, precision=grad_precision)
        dzs[i] = dz
        dks_out[i] = dk

        dx_total = dx + d_x_pending[i]
        # x_i = u + dt Σ_j a_ij k_j
        d_u = d_u + dx_total
        a_row = coeffs[i][0]
        for j, a in enumerate(a_row):
            d_ks[j] = d_ks[j] + (dt * a) * dx_total

    # ---- weight grads, stage-batched: the 12 per-stage contractions
    # (K = batch tile, which under-fills the MXU K pipeline — measured 57%
    # of roof at 'highest') become 2 contractions at K = 6·tile by
    # concatenating the stages along the batch (sublane) axis.
    #   dW1 = Σ_i x_iᵀ·dz_i = [x]ᵀ·[dz] ;  dW2 = Σ_i h_iᵀ·dk_i = [h]ᵀ·[dk]
    xcat = jnp.concatenate(xs, axis=0)
    dzcat = jnp.concatenate(dzs, axis=0)
    hcat = jnp.concatenate(hs, axis=0)
    dkcat = jnp.concatenate(dks_out, axis=0)
    dw1_acc = jnp.dot(xcat.T, dzcat, preferred_element_type=jnp.float32,
                      precision=grad_precision)
    dw2_acc = jnp.dot(hcat.T, dkcat, preferred_element_type=jnp.float32,
                      precision=grad_precision)
    db1_acc = jnp.sum(dzcat, axis=0, keepdims=True)
    db2_acc = jnp.sum(dkcat, axis=0, keepdims=True)
    # time-channel grads: Σ_i s_i·Σ_rows dz_i = Σ_rows (s_row ⊙ [dz]) where
    # s_row broadcasts each stage's scalar time over its tile rows.
    tb = u.shape[0]
    srow = jnp.concatenate(
        [jnp.full((tb, 1), 1.0, jnp.float32) * s for s in ss], axis=0
    )
    dw1t_acc = jnp.sum(srow * dzcat, axis=0, keepdims=True)
    dw2t_acc = jnp.sum(srow * dkcat, axis=0, keepdims=True)

    du_ref[:] = d_u
    dk1_ref[:] = d_ks[0]

    # accumulate weight grads across the (sequential) batch-tile grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)

    dw1_ref[:] += dw1_acc
    db1_ref[:] += db1_acc
    dw1t_ref[:] += dw1t_acc
    dw2_ref[:] += dw2_acc
    db2_ref[:] += db2_acc
    dw2t_ref[:] += dw2t_acc


def fused_step_bwd(params, u, t, dt, k1, cts, precision=None,
                   grad_precision="match", tile_override=None):
    """Run the fused backward kernel; returns (d_params, d_u, 0, 0, d_k1)
    in the TDChain param structure.

    ``precision`` governs the forward-recompute dots (stage values must
    match the forward trajectory at tight tolerances); ``grad_precision``
    governs the cotangent-chain and weight-gradient dots — gradients
    tolerate ~1e-3 relative noise, so 'match' (= precision) is the safe
    default and None (backend-fast) is a measured speed lever."""
    from .fused_mlp import _pick_tile, _split_params

    # pad_hidden: H→multiple of 128 (MXU lane width), exactly as the forward
    # kernel does — mathematically exact (padded units have zero weights,
    # bias and time column throughout, so dz/dh vanish on the pad and the
    # padded grad columns/rows are exactly zero; sliced off below).
    w1, b1, w1t, w2, b2, w2t = _split_params(params, pad_hidden=True)
    H_true = params["layer_0"]["w"].shape[1]
    B, F = u.shape
    H = w1.shape[1]
    # tile 128 measured fastest at both precisions (interleaved on-device
    # slope A/B vs 64/256: highest 146.6/133.5/167.9 µs, default
    # 45.4/33.2/33.2 µs) — M=128 fills the MXU sublanes on the 24 serial
    # chain dots; 256 loses the grid's HBM/compute overlap.
    if tile_override:
        tb = tile_override
    elif B % 128 == 0:
        tb = 128
    else:
        tb = _pick_tile(B, F, n_buffers=40)
    grid = (B // tb,)
    sc = jnp.stack(
        [jnp.asarray(t, jnp.float32), jnp.asarray(dt, jnp.float32)]
    )
    (d_unew, d_utilde, d_k2, d_k3, d_k4, d_k5, d_k6, d_k7, d_g6) = cts

    tile = lambda: pl.BlockSpec(  # noqa: E731
        (tb, F), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vspec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    if grad_precision == "match":
        grad_precision = precision
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, precision, grad_precision),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [tile(), tile()]
        + [vspec((F, H)), vspec((1, H)), vspec((1, H)), vspec((H, F)),
           vspec((1, F)), vspec((1, F))]
        + [tile() for _ in range(9)],
        out_specs=(
            tile(), tile(),
            vspec((F, H)), vspec((1, H)), vspec((1, H)),
            vspec((H, F)), vspec((1, F)), vspec((1, F)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, F), jnp.float32),
            jax.ShapeDtypeStruct((B, F), jnp.float32),
            jax.ShapeDtypeStruct((F, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # ~46 live tile-sized values at the chosen tile (incl. the
            # stage-batched concat buffers); sized generously — v5e VMEM
            # is 128 MB physical (measured, CLAUDE.md)
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                max(46 * tb * F * 4 + 4 * F * H * 4, 32 * 1024 * 1024),
            ),
        ),
        interpret=_interpret(),
    )(sc, u, k1, w1, b1, w1t, w2, b2, w2t,
      d_unew, d_utilde, d_k2, d_k3, d_k4, d_k5, d_k6, d_k7, d_g6)

    du, dk1, dw1, db1, dw1t, dw2, db2, dw2t = out
    if H != H_true:  # strip the exact-zero hidden padding
        dw1 = dw1[:, :H_true]
        db1 = db1[:, :H_true]
        dw1t = dw1t[:, :H_true]
        dw2 = dw2[:H_true, :]
    d_params = {
        "layer_0": {
            "w": jnp.concatenate([dw1, dw1t], axis=0),
            "b": db1[0],
        },
        "layer_1": {
            "w": jnp.concatenate([dw2, dw2t], axis=0),
            "b": db2[0],
        },
    }
    zero_t = jnp.zeros((), jnp.float32)
    return d_params, du, zero_t, zero_t, dk1
