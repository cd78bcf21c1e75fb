"""Persistent-loop Pallas kernel: the stored-adjoint SDE BACKWARD sweep.

The XLA SDE backward (``sde/stored_adjoint.py::core_bwd``) transposes one
SRI step per iteration of a ``while_loop``: each iteration slices the
``(u, dW, dZ)`` knot triple out of HBM, runs ``jax.vjp`` of the 8-eval SRI
step (~30 small ops at the MNIST-SDE state width of 32), and ravels the
parameter cotangents — every one of those is dispatch/latency-bound, which
is why the persistent FORWARD alone bought only 1.11x on the train step
(RESULTS round 3: "the shared XLA backward bounds the gain"). This kernel
runs the WHOLE sweep in one program:

- the adjoint carry ``a_u`` lives in VMEM (the kernel's output ref); SRI
  has no FSAL chain, so it is the only carry (the ODE sweep's ``a_k`` has
  no analog here);
- knot triples ``(u_j, dW_j, dZ_j)`` stream in via double-buffered async
  DMA; the Brownian increments are the RECORDED values, so the transpose
  is exact for the realized trajectory no matter which program generated
  the noise (fused_sde_solve.py module docstring) — no replay machinery;
- each step hand-transposes the four-stage SRI step
  (``sde/step.py:35-96``, reference ``src/perform_step.jl:49-106``):
  forward recompute of k1..k4/g1..g4 keeping stage inputs and hiddens,
  reverse through the H0i/H1i structure, then STAGE-BATCHED weight-grad
  contractions (one K = 4B matmul per weight instead of four K = B ones —
  the fused_mlp_bwd trick);
- saveat cotangents use the linear interpolation split
  ``y_s = u + theta (u_new - u)`` — identical math to the XLA sweep.

The error-estimate branch of the step is NOT recomputed: eest feeds only
the fenced controller, so it has no cotangent (framework-wide fencing).

Weight-gradient precision policy matches ``fused_mlp_bwd``: recompute dots
at ``precision``, cotangent/weight-grad dots at ``grad_precision``.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...sde.tableaus import get_sri_tableau


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_BUDGET = 88 * 1024 * 1024
_MAX_NSAVE = 4


def _plan(B: int, F: int, H_pad: int, n_save: int):
    """Whole-batch residency check. Live (B, F) values: a_u + ct_y +
    ct_ys + 2x3 knot staging + ~14 stage/cotangent temporaries + 6
    concat buffers of 4 stages each (24 rows-of-B). Returns the byte
    estimate when servable (also threaded into Mosaic's
    vmem_limit_bytes), else None."""
    need = (2 + n_save + 6 + 14 + 24) * B * F * 4
    need += (8 + n_save) * B * H_pad * 4          # hiddens + dz concat
    need += (2 * F * H_pad + F * F + 2 * H_pad + 4 * F) * 4  # w + grads
    return need if need <= _VMEM_BUDGET else None


def _make_kernel(precision, grad_precision, B, F, n_save, n_knot, delta,
                 tab_name):
    T = get_sri_tableau(tab_name)
    sqrt3 = math.sqrt(3.0)
    # stage-input coefficient rows (drift/diffusion), eval e = 1..3:
    # H0e = u + dt*sum_j A0[e][j] k_j + chi2*sum_j B0[e][j] g_j
    # H1e = u + dt*sum_j A1[e][j] k_j + sqdt*sum_j B1[e][j] g_j
    A0 = ((T.a021,), (T.a031, T.a032), (T.a041, T.a042, T.a043))
    B0 = ((T.b021,), (T.b031, T.b032), (T.b041, T.b042, T.b043))
    A1 = ((T.a121,), (T.a131, T.a132), (T.a141, T.a142, T.a143))
    B1 = ((T.b121,), (T.b131, T.b132), (T.b141, T.b142, T.b143))
    ALPHA = (T.alpha1, T.alpha2, T.alpha3, T.alpha4)
    BETA1 = (T.beta11, T.beta12, T.beta13, T.beta14)
    BETA2 = (T.beta21, T.beta22, T.beta23, T.beta24)
    BETA3 = (T.beta31, T.beta32, T.beta33, T.beta34)
    BETA4 = (T.beta41, T.beta42, T.beta43, T.beta44)

    def kernel(sc_ref, knot_ts_ref, saveat_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, wd_ref, bd_ref,
               ctys_ref, cty_ref,
               knot_us_ref, knot_dws_ref, knot_dzs_ref,
               au_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dwd_ref,
               dbd_ref,
               stage_ref, sems):
        naccept = sc_ref[0]

        au_ref[:] = cty_ref[:]
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dwd_ref[:] = jnp.zeros_like(dwd_ref)
        dbd_ref[:] = jnp.zeros_like(dbd_ref)

        def knot_dma(j, slot):
            """Stage the (u, dW, dZ) triple of step j into slot rows
            [slot*3B, (slot+1)*3B)."""
            base = slot * 3 * B
            return (
                pltpu.make_async_copy(
                    knot_us_ref.at[pl.ds(j * B, B), :],
                    stage_ref.at[pl.ds(base, B), :],
                    sems.at[slot * 3],
                ),
                pltpu.make_async_copy(
                    knot_dws_ref.at[pl.ds(j * B, B), :],
                    stage_ref.at[pl.ds(base + B, B), :],
                    sems.at[slot * 3 + 1],
                ),
                pltpu.make_async_copy(
                    knot_dzs_ref.at[pl.ds(j * B, B), :],
                    stage_ref.at[pl.ds(base + 2 * B, B), :],
                    sems.at[slot * 3 + 2],
                ),
            )

        def sweep_step(t, tn, slot):
            dt = tn - t
            base = slot * 3 * B
            u = stage_ref[pl.ds(base, B), :]
            dW = stage_ref[pl.ds(base + B, B), :]
            dZ = stage_ref[pl.ds(base + 2 * B, B), :]

            w1, b1 = w1_ref[:], b1_ref[:]
            w2, b2 = w2_ref[:], b2_ref[:]
            wd, bd = wd_ref[:], bd_ref[:]

            sqdt = jnp.sqrt(dt)
            chi1 = (dW * dW - dt) / (2.0 * sqdt)
            chi2 = (dW + dZ / sqrt3) * 0.5
            chi3 = (dW * dW * dW - 3.0 * dW * dt) / (6.0 * dt)

            def f_drift(x):
                h = jnp.tanh(
                    jnp.dot(x, w1, preferred_element_type=jnp.float32,
                            precision=precision) + b1
                )
                return jnp.dot(
                    h, w2, preferred_element_type=jnp.float32,
                    precision=precision,
                ) + b2, h

            def g_diff(x):
                return jnp.dot(
                    x, wd, preferred_element_type=jnp.float32,
                    precision=precision,
                ) + bd

            # ---- forward recompute (keep stage inputs and hiddens)
            ks, gs, hs, xfs, xgs = [], [], [], [], []
            for e in range(4):
                if e == 0:
                    xf = xg = u
                else:
                    xf = u
                    for j, a in enumerate(A0[e - 1]):
                        xf = xf + (dt * a) * ks[j]
                    for j, b in enumerate(B0[e - 1]):
                        xf = xf + (chi2 * b) * gs[j]
                    xg = u
                    for j, a in enumerate(A1[e - 1]):
                        xg = xg + (dt * a) * ks[j]
                    for j, b in enumerate(B1[e - 1]):
                        xg = xg + (sqdt * b) * gs[j]
                k, h = f_drift(xf)
                g = g_diff(xg)
                ks.append(k)
                gs.append(g)
                hs.append(h)
                xfs.append(xf)
                xgs.append(xg)

            # ---- saveat linear-interp cotangent split (rare: cond-gated)
            a_u = au_ref[:]
            zero = jnp.zeros_like(a_u)
            hit_f = []
            theta_f = []
            for s_idx in range(n_save):
                s_t = saveat_ref[s_idx]
                hit_f.append(((s_t > t) & (s_t <= tn)).astype(jnp.float32))
                theta_f.append(jnp.clip((s_t - t) / dt, 0.0, 1.0))
            any_hit = sum(hit_f) > 0.0

            def with_hits(_):
                d_unew = zero
                d_u_i = zero
                for s_idx in range(n_save):
                    ct = ctys_ref[pl.ds(s_idx * B, B), :]
                    d_unew = d_unew + (hit_f[s_idx] * theta_f[s_idx]) * ct
                    d_u_i = d_u_i + (
                        hit_f[s_idx] * (1.0 - theta_f[s_idx])
                    ) * ct
                return d_unew, d_u_i

            def no_hits(_):
                return zero, zero

            d_unew_interp, d_u_interp = lax.cond(
                any_hit, with_hits, no_hits, 0
            )
            A = a_u + d_unew_interp

            # ---- seed stage cotangents from the u_new expression
            d_k = [(dt * ALPHA[e]) * A for e in range(4)]
            d_g = [
                (dW * BETA1[e] + chi1 * BETA2[e] + chi2 * BETA3[e]
                 + chi3 * BETA4[e]) * A
                for e in range(4)
            ]
            d_u = A  # the leading 'u +' term

            # ---- reverse through the stage chain
            dzs = [None] * 4
            dks = [None] * 4
            dgs = [None] * 4
            for e in reversed(range(4)):
                dk = d_k[e]
                dh = jnp.dot(dk, w2.T, preferred_element_type=jnp.float32,
                             precision=grad_precision)
                dz = dh * (1.0 - hs[e] * hs[e])
                dxf = jnp.dot(dz, w1.T, preferred_element_type=jnp.float32,
                              precision=grad_precision)
                dg = d_g[e]
                dxg = jnp.dot(dg, wd.T, preferred_element_type=jnp.float32,
                              precision=grad_precision)
                dzs[e] = dz
                dks[e] = dk
                dgs[e] = dg
                d_u = d_u + dxf + dxg
                if e > 0:
                    for j, a in enumerate(A0[e - 1]):
                        d_k[j] = d_k[j] + (dt * a) * dxf
                    for j, b in enumerate(B0[e - 1]):
                        d_g[j] = d_g[j] + (chi2 * b) * dxf
                    for j, a in enumerate(A1[e - 1]):
                        d_k[j] = d_k[j] + (dt * a) * dxg
                    for j, b in enumerate(B1[e - 1]):
                        d_g[j] = d_g[j] + (sqdt * b) * dxg

            au_ref[:] = d_u + d_u_interp

            # ---- weight grads, stage-batched (K = 4B per contraction)
            xfcat = jnp.concatenate(xfs, axis=0)
            dzcat = jnp.concatenate(dzs, axis=0)
            hcat = jnp.concatenate(hs, axis=0)
            dkcat = jnp.concatenate(dks, axis=0)
            xgcat = jnp.concatenate(xgs, axis=0)
            dgcat = jnp.concatenate(dgs, axis=0)
            dw1_ref[:] += jnp.dot(
                xfcat.T, dzcat, preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            db1_ref[:] += jnp.sum(dzcat, axis=0, keepdims=True)
            dw2_ref[:] += jnp.dot(
                hcat.T, dkcat, preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            db2_ref[:] += jnp.sum(dkcat, axis=0, keepdims=True)
            dwd_ref[:] += jnp.dot(
                xgcat.T, dgcat, preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            dbd_ref[:] += jnp.sum(dgcat, axis=0, keepdims=True)

        # ---- reverse loop over accepted steps, double-buffered streaming
        j0 = naccept - 1

        @pl.when(j0 >= 0)
        def _():
            for c in knot_dma(j0, j0 % 2):
                c.start()

        def body(i, _):
            j = naccept - 1 - i
            slot = j % 2
            for c in knot_dma(j, slot):
                c.wait()

            @pl.when(j - 1 >= 0)
            def _():
                for c in knot_dma(j - 1, 1 - slot):
                    c.start()

            sweep_step(knot_ts_ref[j], knot_ts_ref[j + 1], slot)
            return 0

        lax.fori_loop(0, naccept, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(precision, grad_precision, B, F, H_pad, n_save, n_knot,
                delta, tab_name, interpret,
                vmem_limit=64 * 1024 * 1024):
    kernel = _make_kernel(
        precision, grad_precision, B, F, n_save, n_knot, delta, tab_name,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)  # noqa: E731

    return pl.pallas_call(
        kernel,
        in_specs=[smem(), smem(), smem()]
        + [vmem()] * 6            # weights
        + [vmem(), vmem()]        # ct_ys, ct_y
        + [any_(), any_(), any_()],  # knot_us / dws / dzs (HBM)
        out_specs=(
            vmem(),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, F), jnp.float32),       # a_u
            jax.ShapeDtypeStruct((F, H_pad), jnp.float32),   # dw1
            jax.ShapeDtypeStruct((1, H_pad), jnp.float32),   # db1
            jax.ShapeDtypeStruct((H_pad, F), jnp.float32),   # dw2
            jax.ShapeDtypeStruct((1, F), jnp.float32),       # db2
            jax.ShapeDtypeStruct((F, F), jnp.float32),       # dwd
            jax.ShapeDtypeStruct((1, F), jnp.float32),       # dbd
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * 3 * B, F), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit),
            has_side_effects=True,
        ),
        interpret=interpret,
    )


def persistent_sde_sweep(params, knot_ts, knot_us, knot_dws, knot_dzs,
                         naccept, saveat_arr, ct_ys, ct_y, *,
                         solver: str, delta: float, precision=None,
                         grad_precision=None):
    """Run the whole diagonal-SRI stored-adjoint sweep in one Pallas
    program. ``knot_*`` are the forward's recorded buffers (PADDED to the
    128 lane by the persistent forward). Returns ``(a_u, d_params)`` with
    ``d_params`` in the ``{drift: {layer_0, layer_1}, diffusion: {w, b}}``
    structure, or ``None`` when the configuration isn't servable (caller
    falls back to the XLA sweep).
    """
    from .fused_sde_solve import _split_sde_params

    if solver not in ("sri", "sosri"):
        return None
    split = _split_sde_params(params)
    if split is None:
        return None
    w1, b1, w2, b2, wd, bd = split
    B, F = ct_y.shape
    n_save = int(saveat_arr.shape[0])
    if n_save > _MAX_NSAVE:
        return None
    F_pad = knot_us.shape[-1]
    # non-lane-aligned knots (XLA-loop forward) can't be DMA-sliced on
    # real TPUs; interpret mode is exempt (CPU tests use logical widths)
    if F_pad % 128 != 0 and not _interpret():
        return None
    H = w1.shape[1]
    H_pad = -(-H // 128) * 128
    vmem_need = _plan(B, F_pad, H_pad, n_save)
    if vmem_need is None:
        return None
    n_knot = knot_us.shape[0]

    def fpad(a, rows, cols):
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    w1_in = fpad(w1, F_pad, H_pad)
    b1_in = jnp.pad(b1, (0, H_pad - H)).reshape(1, H_pad)
    w2_in = fpad(w2, H_pad, F_pad)
    b2_in = jnp.pad(b2, (0, F_pad - F)).reshape(1, F_pad)
    wd_in = fpad(wd, F_pad, F_pad)
    bd_in = jnp.pad(bd, (0, F_pad - F)).reshape(1, F_pad)
    if F_pad != F:
        ct_y_in = jnp.pad(ct_y, ((0, 0), (0, F_pad - F)))
        ct_ys_in = jnp.pad(ct_ys, ((0, 0), (0, 0), (0, F_pad - F)))
    else:
        ct_y_in, ct_ys_in = ct_y, ct_ys

    call = _build_call(
        precision, grad_precision, B, F_pad, H_pad, n_save, n_knot,
        float(delta), solver, _interpret(),
        vmem_limit=vmem_need + 6 * 1024 * 1024,
    )
    sc = jnp.asarray(naccept, jnp.int32)[None]
    out = call(
        sc, jnp.asarray(knot_ts, jnp.float32),
        jnp.asarray(saveat_arr, jnp.float32),
        w1_in, b1_in, w2_in, b2_in, wd_in, bd_in,
        ct_ys_in.reshape(n_save * B, F_pad), ct_y_in,
        knot_us.reshape(n_knot * B, F_pad),
        knot_dws.reshape(-1, F_pad),
        knot_dzs.reshape(-1, F_pad),
    )
    a_u, dw1, db1, dw2, db2, dwd, dbd = out
    d_params = {
        "drift": {
            "layer_0": {"w": dw1[:F, :H], "b": db1[0, :H]},
            "layer_1": {"w": dw2[:H, :F], "b": db2[0, :F]},
        },
        "diffusion": {"w": dwd[:F, :F], "b": dbd[0, :F]},
    }
    return a_u[:, :F], d_params
