"""Hand-fused Pallas backward for the fused conv Tsit5 step.

The CIFAR train step is backward-dominated (~112 of ~144 ms,
``scripts/cifar_phase_probe.py``): transposing the XLA twin pays ~20 HBM
round trips per conv eval in both the recompute and the transpose. This
kernel runs ONE WHOLE step backward in VMEM:

1. forward-recompute the 6 dynamics evals (channels-first shifted-matmul
   convs + training-mode BN statistics — identical math to the forward
   kernel, ``fused_conv.py``),
2. reverse through the Tsit5 stage chain (same cotangent bookkeeping as
   ``fused_mlp_bwd.py``): per eval transpose conv3ᵀ → BN2/gelu′ →
   conv2ᵀ → BN1/gelu′ → conv1ᵀ, accumulating the conv spatial-weight,
   time-channel and BN affine gradients across evals.

Per-eval intermediates (x̂, post-activation) are recomputed immediately
before that eval's transpose and discarded after — peak VMEM stays
~90 MB at the CIFAR shapes (B=32, 32², 8/64 ch) inside the 128 MB core.

Transpose identities (per tap, from the forward's masked-roll form):

    y = Σ_tap W_tap @ (m_tap ⊙ roll(x, -Δ_tap))
    ⇒ dx      += roll(m_tap ⊙ (W_tapᵀ @ dy_ct), +Δ_tap)
      dW_tap  += dy_ct ·_N (m_tap ⊙ roll(x, -Δ_tap))       (contract N)
      dw_t[tap] = s · (m_tap ·_N dy_ct)                    (time channel)

BatchNorm backward uses the batch statistics (training mode):
    dz = (γ/σ)·(dĝ − mean(dĝ) − x̂·mean(dĝ·x̂)),  dγ = Σ dĝ·x̂, dβ = Σ dĝ
with dĝ = da · gelu′(g) and the tanh-approximate gelu derivative
matching ``jax.nn.gelu`` (approximate=True).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp_bwd import _BTILDE
from .fused_conv import (
    ConvFamilySpec, _from_cf, _layer_names, _prep_conv, _to_cf,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll(x, shift, axis=1):
    """Circular shift with jnp.roll semantics (rolled[i] = x[i-shift]).
    Uses the native TPU roll on hardware (lane rotates lower to the
    cross-lane shuffle unit; the generic concat-of-slices lowering of
    jnp.roll was measured ~10x slower at these shapes)."""
    if _interpret():
        return jnp.roll(x, shift, axis=axis)
    # pltpu.roll requires a non-negative shift (traced negatives are NOT
    # statically rejected — normalize explicitly)
    return pltpu.roll(x, jnp.mod(shift, x.shape[axis]), axis)



_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _gelu(x):
    inner = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _gelu_grad(x):
    inner = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    th = jnp.tanh(inner)
    d_inner = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
    return 0.5 * (1.0 + th) + 0.5 * x * (1.0 - th * th) * d_inner


def _make_bwd_kernel(spec: ConvFamilySpec, precision, grad_precision):
    B, H, W, Cs, Ch = spec.B, spec.H, spec.W, spec.Cs, spec.Ch
    N = B * H * W
    eps = spec.eps
    inv_n = 1.0 / float(N)

    def positions():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        return lane % W, (lane // W) % H

    def tap_mask(wpos, hpos, tap):
        dy = tap // 3
        dx = tap % 3
        ws = wpos + (dx - 1)
        hs = hpos + (dy - 1)
        return (
            (ws >= 0) & (ws <= W - 1) & (hs >= 0) & (hs <= H - 1)
        ).astype(jnp.float32)

    def conv_fwd(x, wtap_ref, tmap_ref, s, cout, wpos, hpos):
        def tap_body(tap, y):
            dy = tap // 3
            dx = tap % 3
            delta = (dy - 1) * W + (dx - 1)
            m = tap_mask(wpos, hpos, tap)
            xs = _roll(x, -delta, axis=1) * m
            wt = wtap_ref[pl.ds(tap * cout, cout), :]
            return y + jnp.dot(
                wt, xs, preferred_element_type=jnp.float32,
                precision=precision,
            )

        y = lax.fori_loop(0, 9, tap_body, jnp.zeros((cout, N), jnp.float32))
        return y + s * tmap_ref[:]

    def conv_bwd(dy_ct, src, wtap_ref, dw_ref, dwt_ref, s, cout, cin,
                 wpos, hpos):
        """Transpose one conv: returns dsrc; accumulates the spatial
        weight grads into ``dw_ref`` (9·cout, cin) and the time-channel
        taps into ``dwt_ref`` (9, cout) — one (roll, mask, matmul,
        contraction) group per tap inside a fori."""
        def tap_body(tap, dsrc):
            dy = tap // 3
            dx = tap % 3
            delta = (dy - 1) * W + (dx - 1)
            m = tap_mask(wpos, hpos, tap)
            wt = wtap_ref[pl.ds(tap * cout, cout), :]
            # dsrc += roll(m·(wtᵀ @ dy_ct), +delta)
            contrib = jnp.dot(
                wt.T, dy_ct, preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            dsrc = dsrc + _roll(contrib * m, delta, axis=1)
            # dW_tap += dy_ct ·_N (m·roll(src, -delta))
            xs = _roll(src, -delta, axis=1) * m
            off = pl.multiple_of(tap * cout, cout)
            dw_ref[pl.ds(off, cout), :] += lax.dot_general(
                dy_ct, xs, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            # time-channel tap: (1, cout) = s · (m ·_N dy_ct)
            dwt_ref[pl.ds(tap, 1), :] += s * lax.dot_general(
                m, dy_ct, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            return dsrc

        return lax.fori_loop(
            0, 9, tap_body, jnp.zeros((cin, N), jnp.float32)
        )

    def bn_fwd(y, scale_ref, bias_ref):
        """Returns (x̂, 1/σ) — g/a are recomputed on demand (g = x̂·γ+β is
        one FMA; keeping them resident would blow the VMEM peak)."""
        mean = jnp.mean(y, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=1, keepdims=True)
        inv = lax.rsqrt(var + eps)
        xhat = (y - mean) * inv
        return xhat, inv

    def bn_bwd(da, xhat, inv, scale_ref, bias_ref):
        g = xhat * scale_ref[:] + bias_ref[:]
        dg = da * _gelu_grad(g)
        dgamma = jnp.sum(dg * xhat, axis=1, keepdims=True)
        dbeta = jnp.sum(dg, axis=1, keepdims=True)
        dxh = dg * scale_ref[:]
        dz = inv * (
            dxh
            - inv_n * jnp.sum(dxh, axis=1, keepdims=True)
            - xhat * (inv_n * jnp.sum(dxh * xhat, axis=1, keepdims=True))
        )
        return dz, dgamma, dbeta

    def kernel(sc_ref, ab_ref, u_ref, k1_ref, w1_ref, w2_ref, w3_ref,
               t1_ref, t2_ref, t3_ref, s1_ref, b1_ref, s2_ref, b2_ref,
               dunew_ref, dutilde_ref, dk2_ref, dk3_ref, dk4_ref,
               dk5_ref, dk6_ref, dk7_ref, dg6_ref,
               du_ref, dk1_ref, dw1_ref, dw2_ref, dw3_ref,
               dwt1_ref, dwt2_ref, dwt3_ref,
               ds1_ref, db1_ref, ds2_ref, db2_ref,
               ks_ref, dks_ref):
        t = sc_ref[0]
        dt = sc_ref[1]
        wpos, hpos = positions()

        # ---- phase 1: forward recompute of the stage chain (k values)
        ks_ref[pl.ds(0, Cs), :] = k1_ref[:]
        # zero uncomputed blocks (0·garbage can be NaN in the stage sums)
        ks_ref[pl.ds(Cs, 6 * Cs), :] = jnp.zeros((6 * Cs, N), jnp.float32)

        def fwd_body(e, _):
            x = u_ref[:]
            for j in range(7):
                x = x + (dt * ab_ref[e, j]) * ks_ref[pl.ds(j * Cs, Cs), :]
            s = t + ab_ref[e, 7] * dt
            z1 = conv_fwd(x, w1_ref, t1_ref, s, Ch, wpos, hpos)
            xh1, _ = bn_fwd(z1, s1_ref, b1_ref)
            a1 = _gelu(xh1 * s1_ref[:] + b1_ref[:])
            z2 = conv_fwd(a1, w2_ref, t2_ref, s, Ch, wpos, hpos)
            xh2, _ = bn_fwd(z2, s2_ref, b2_ref)
            a2 = _gelu(xh2 * s2_ref[:] + b2_ref[:])
            ks_ref[pl.ds((e + 1) * Cs, Cs), :] = conv_fwd(
                a2, w3_ref, t3_ref, s, Cs, wpos, hpos
            )
            return 0

        lax.fori_loop(0, 6, fwd_body, 0)

        # ---- stage cotangent buffer: dks[j] = dt·btilde_j·dũ + ct_j
        d_utilde = dutilde_ref[:]
        d_ct = (dk2_ref, dk3_ref, dk4_ref, dk5_ref, dk6_ref, dk7_ref)
        dks_ref[pl.ds(0, Cs), :] = (dt * _BTILDE[0]) * d_utilde
        for i in range(6):
            dks_ref[pl.ds((i + 1) * Cs, Cs), :] = (
                (dt * _BTILDE[i + 1]) * d_utilde + d_ct[i][:]
            )

        # ---- init grad accumulators
        du_ref[:] = jnp.zeros_like(du_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        dwt1_ref[:] = jnp.zeros_like(dwt1_ref)
        dwt2_ref[:] = jnp.zeros_like(dwt2_ref)
        dwt3_ref[:] = jnp.zeros_like(dwt3_ref)
        ds1_ref[:] = jnp.zeros_like(ds1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        ds2_ref[:] = jnp.zeros_like(ds2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

        # ---- phase 2: reverse through the evals (e = 5 .. 0)
        def bwd_body(i, _):
            e = 5 - i
            x = u_ref[:]
            for j in range(7):
                x = x + (dt * ab_ref[e, j]) * ks_ref[pl.ds(j * Cs, Cs), :]
            s = t + ab_ref[e, 7] * dt
            # recompute THIS eval's lean residuals (x̂ per BN site only)
            z1 = conv_fwd(x, w1_ref, t1_ref, s, Ch, wpos, hpos)
            xh1, inv1 = bn_fwd(z1, s1_ref, b1_ref)
            a1 = _gelu(xh1 * s1_ref[:] + b1_ref[:])
            z2 = conv_fwd(a1, w2_ref, t2_ref, s, Ch, wpos, hpos)
            xh2, inv2 = bn_fwd(z2, s2_ref, b2_ref)

            dk = dks_ref[pl.ds((e + 1) * Cs, Cs), :]
            # transpose conv3 → BN2/gelu → conv2 → BN1/gelu → conv1
            a2 = _gelu(xh2 * s2_ref[:] + b2_ref[:])
            da2 = conv_bwd(
                dk, a2, w3_ref, dw3_ref, dwt3_ref, s, Cs, Ch, wpos, hpos
            )
            dz2, dg2, dbt2 = bn_bwd(da2, xh2, inv2, s2_ref, b2_ref)
            ds2_ref[:] += dg2
            db2_ref[:] += dbt2
            da1 = conv_bwd(
                dz2, a1, w2_ref, dw2_ref, dwt2_ref, s, Ch, Ch, wpos, hpos
            )
            dz1, dg1, dbt1 = bn_bwd(da1, xh1, inv1, s1_ref, b1_ref)
            ds1_ref[:] += dg1
            db1_ref[:] += dbt1
            dx = conv_bwd(
                dz1, x, w1_ref, dw1_ref, dwt1_ref, s, Ch, Cs, wpos, hpos
            )

            # stage-input cotangent seeds: u_new (eval 5) and g6 (eval 4)
            dx_total = dx
            dx_total = dx_total + jnp.where(e == 5, 1.0, 0.0) * dunew_ref[:]
            dx_total = dx_total + jnp.where(e == 4, 1.0, 0.0) * dg6_ref[:]
            du_ref[:] += dx_total
            for j in range(7):
                dks_ref[pl.ds(j * Cs, Cs), :] = (
                    dks_ref[pl.ds(j * Cs, Cs), :]
                    + (dt * ab_ref[e, j]) * dx_total
                )
            return 0

        lax.fori_loop(0, 6, bwd_body, 0)
        dk1_ref[:] = dks_ref[pl.ds(0, Cs), :]

    return kernel


@functools.lru_cache(maxsize=None)
def _build_bwd_call(spec: ConvFamilySpec, precision, grad_precision,
                    interpret: bool):
    B, H, W, Cs, Ch = spec.B, spec.H, spec.W, spec.Cs, spec.Ch
    N = B * H * W
    kernel = _make_bwd_kernel(spec, precision, grad_precision)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    out_shape = (
        jax.ShapeDtypeStruct((Cs, N), jnp.float32),       # du
        jax.ShapeDtypeStruct((Cs, N), jnp.float32),       # dk1
        jax.ShapeDtypeStruct((9 * Ch, Cs), jnp.float32),
        jax.ShapeDtypeStruct((9 * Ch, Ch), jnp.float32),
        jax.ShapeDtypeStruct((9 * Cs, Ch), jnp.float32),
        jax.ShapeDtypeStruct((9, Ch), jnp.float32),       # dwt1 taps
        jax.ShapeDtypeStruct((9, Ch), jnp.float32),
        jax.ShapeDtypeStruct((9, Cs), jnp.float32),
        jax.ShapeDtypeStruct((Ch, 1), jnp.float32),       # dγ1
        jax.ShapeDtypeStruct((Ch, 1), jnp.float32),       # dβ1
        jax.ShapeDtypeStruct((Ch, 1), jnp.float32),
        jax.ShapeDtypeStruct((Ch, 1), jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        in_specs=[smem(), smem()] + [vmem()] * 21,
        out_specs=tuple(vmem() for _ in out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((7 * Cs, N), jnp.float32),   # recomputed k1..k7
            pltpu.VMEM((7 * Cs, N), jnp.float32),   # stage cotangents
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def fused_conv_step_bwd(spec0: ConvFamilySpec, params, u, t, dt, k1, cts,
                        precision=None, grad_precision=None):
    """Backward of the fused conv step. ``cts`` = (d_unew, d_utilde,
    d_k2..d_k7, d_g6) in NHWC. Returns ``(d_params, d_u, d_k1)``."""
    B, H, W, Cs = u.shape
    spec = spec0._replace(B=B, H=H, W=W)
    Ch = spec.Ch
    names = _layer_names(params)
    p0, p1, p2 = params[names[0]], params[names[1]], params[names[2]]
    w1s, t1m = _prep_conv(p0["layer_0"]["w"], B, H, W)
    w2s, t2m = _prep_conv(p1["layer_0"]["w"], B, H, W)
    w3s, t3m = _prep_conv(p2["w"], B, H, W)
    col = lambda v: v.reshape(-1, 1)  # noqa: E731

    from .fused_conv import _stage_tab

    call = _build_bwd_call(spec, precision, grad_precision, _interpret())
    args = [
        jnp.stack([jnp.asarray(t, jnp.float32),
                   jnp.asarray(dt, jnp.float32)]),
        _stage_tab(),
        _to_cf(u), _to_cf(k1), w1s, w2s, w3s, t1m, t2m, t3m,
        col(p0["layer_1"]["scale"]), col(p0["layer_1"]["bias"]),
        col(p1["layer_1"]["scale"]), col(p1["layer_1"]["bias"]),
    ] + [_to_cf(c) for c in cts]
    out = call(*args)
    (du_cf, dk1_cf, dw1s, dw2s, dw3s, dwt1, dwt2, dwt3,
     dg1, dbt1, dg2, dbt2) = out

    def unprep(dws, dwt, cin, cout):
        """(9cout,cin) tap-blocks + (9,cout) time taps → (3,3,cin+1,cout)."""
        spatial = jnp.transpose(
            dws.reshape(3, 3, cout, cin), (0, 1, 3, 2)
        )  # (dy, dx, cin, cout)
        taps = dwt.reshape(3, 3, 1, cout)
        return jnp.concatenate([spatial, taps], axis=2)

    d_params = {
        names[0]: {
            "layer_0": {"w": unprep(dw1s, dwt1, Cs, Ch)},
            "layer_1": {"scale": dg1[:, 0], "bias": dbt1[:, 0]},
        },
        names[1]: {
            "layer_0": {"w": unprep(dw2s, dwt2, Ch, Ch)},
            "layer_1": {"scale": dg2[:, 0], "bias": dbt2[:, 0]},
        },
        names[2]: {"w": unprep(dw3s, dwt3, Ch, Cs)},
    }
    return d_params, _from_cf(du_cf, B, H, W), _from_cf(dk1_cf, B, H, W)
