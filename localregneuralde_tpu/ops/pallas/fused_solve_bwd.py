"""Persistent-loop Pallas kernel for the stored-adjoint BACKWARD sweep.

The stored adjoint's dense backward (``ode/stored_adjoint.py``) transposes
one accepted step per iteration of an XLA ``while_loop``: each iteration
slices a (B, F) knot pair out of HBM, launches the fused per-step backward
kernel, and accumulates flattened parameter cotangents — ~10 MB of XLA
carrier traffic per step around a ~45–75 µs kernel. This kernel runs the
WHOLE sweep in one program:

- the adjoint carries ``a_u`` (state cotangent) and ``a_k`` (FSAL-chain
  cotangent on the incoming k1) live in VMEM — they are the kernel's
  output refs, updated in place tile-by-tile;
- knot states stream in via double-buffered async DMA (one (B, F) block
  per step); the FSAL derivative ``k1_j`` is RECOMPUTED in-kernel from
  ``(u_j, t_j)`` instead of staged — same math as the forward's stored
  value (ulp-level differences only, well inside gradient tolerance),
  halving the DMA traffic and VMEM staging;
- weight gradients accumulate in VMEM across all steps and tiles;
- saveat cotangents are injected at the steps whose interval contains each
  output time, with the Tsit5 free-interpolant weights — identical math to
  the XLA sweep (``stored_adjoint.make_sweep_body``). ``ct_ys`` rides in
  VMEM, so the kernel is gated on the VMEM plan.

**Dynamics families**: the Tsit5 stage-chain transpose (stage-input
reconstruction, ``d_x_pending`` flow, FSAL carry) is family-agnostic; the
per-eval forward-keep / vjp / weight-grad-flush hooks are provided per
family (``fused_solve`` family specs): the TDChain TD-MLP (flagship) and
the autonomous Dense chain (latent-ODE gen dynamics,
``construct.jl:241-245``).

**Two-level mode**: for the reference's ``maxiters = 10_000`` capacity
(``construct.jl:196``), the forward records dense knots only up to
``dense_cap`` accepted steps plus every-W-th replayable checkpoint
(``fused_solve.py``). The kernel then branches per-solve IN-KERNEL:

- ``naccept <= dense_cap`` (the common case): the dense sweep above;
- longer solves: one W-step window at a time, REPLAYED in-kernel from its
  checkpoint via ``fused_solve.run_attempt_tiles`` — the forward kernel's
  own stage/error-norm code at the forward's own tile size, so the
  replayed accept/reject/dt sequence is arithmetically identical to the
  forward's (an XLA replay cannot guarantee that against a persistent
  forward: different error-norm reduction order). Replayed window states
  stage through an HBM scratch buffer and are swept like dense knots.

What stays in XLA (once per solve, not per step): the FSAL-chain closure
``vjp(f(u0, t0))`` applied to the final ``a_k``, and the pre-t0 saveat
cotangent passthrough — see ``stored_adjoint.core_bwd``.

Precision policy: cotangent/weight-grad dots run at ``grad_precision``;
the per-step stage recompute runs at ``recompute_precision`` ('match' =
``precision``, or a lower setting via ``solver.grad_precision='default'``
— the recompute serves gradients only, so one-pass noise ~1e-3 relative
is ordinary bf16-training noise and buys the 6x MXU rate back at tight
tolerances). The window REPLAY always runs at ``precision``: it re-runs
the adaptive loop from checkpoints and must reproduce the forward's
accept/reject decisions bitwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ode.controller import PIController
from ...ode.tableaus import Tsit5Tableau as T
from ...ode.tableaus import tsit5_interp_weights
from .fused_mlp import _split_params
from .fused_mlp_bwd import _stage_coeffs
from .fused_solve import _chain_plan
from .fused_solve import _plan as _fwd_plan
from .fused_solve import (
    _propose,
    family_make_f,
    family_n_weights,
    family_weight_bytes,
    pack_chain_weights,
    run_attempt_tiles,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_BUDGET = 88 * 1024 * 1024
_MAX_NSAVE = 2
_MAX_NSAVE_CHAIN = 64


# ---------------------------------------------------------------------------
# family hooks for the stage transpose


def _family_grad_shapes(family, F, H_pad):
    """Shapes of the weight-gradient output refs, in operand order."""
    if family[0] == "tdmlp":
        return [(F, H_pad), (1, H_pad), (1, H_pad), (H_pad, F), (1, F),
                (1, F)]
    _, pads, _, _ = family
    shapes = []
    for i in range(len(pads) - 1):
        shapes += [(pads[i], pads[i + 1]), (1, pads[i + 1])]
    return shapes


def _family_hooks(family, precision, grad_precision, tb):
    """(read, eval_keep, make_stash, vjp, flush) for the stage transpose.

    ``eval_keep(wvals, x, s) -> (k, aux)`` — one dynamics eval keeping the
    intermediates the vjp needs. ``vjp(wvals, dk, aux, stash, i_s) -> dx``
    — transpose one eval, stashing per-stage weight-grad operands.
    ``flush(wvals, grefs, stash)`` — stage-batched weight-grad
    contractions RMW'd into the grad refs (K = 6·tb instead of six K = tb
    contractions per weight — fills the MXU K pipeline; the fused_mlp_bwd
    trick)."""
    if family[0] == "tdmlp":
        def read(wrefs):
            return tuple(r[:] for r in wrefs)

        def eval_keep(wv, x, s):
            w1, b1, w1t, w2, b2, w2t = wv
            h = jnp.tanh(
                jnp.dot(x, w1, preferred_element_type=jnp.float32,
                        precision=precision) + b1 + s * w1t
            )
            k = jnp.dot(
                h, w2, preferred_element_type=jnp.float32,
                precision=precision,
            ) + b2 + s * w2t
            return k, (x, h, s)

        def make_stash():
            return {"aux": [None] * 6, "dz": [None] * 6, "dk": [None] * 6}

        def vjp(wv, dk, aux, stash, i_s):
            w1 = wv[0]
            w2 = wv[3]
            x, h, s = aux
            dh = jnp.dot(dk, w2.T, preferred_element_type=jnp.float32,
                         precision=grad_precision)
            dz = dh * (1.0 - h * h)
            dx = jnp.dot(dz, w1.T, preferred_element_type=jnp.float32,
                         precision=grad_precision)
            stash["aux"][i_s] = aux
            stash["dz"][i_s] = dz
            stash["dk"][i_s] = dk
            return dx

        def flush(wv, grefs, stash):
            dw1_ref, db1_ref, dw1t_ref, dw2_ref, db2_ref, dw2t_ref = grefs
            xcat = jnp.concatenate(
                [stash["aux"][m][0] for m in range(6)], axis=0
            )
            hcat = jnp.concatenate(
                [stash["aux"][m][1] for m in range(6)], axis=0
            )
            dzcat = jnp.concatenate(stash["dz"], axis=0)
            dkcat = jnp.concatenate(stash["dk"], axis=0)
            srow = jnp.concatenate(
                [jnp.full((tb, 1), 1.0, jnp.float32) * stash["aux"][m][2]
                 for m in range(6)], axis=0
            )
            dw1_ref[:] += jnp.dot(
                xcat.T, dzcat, preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            db1_ref[:] += jnp.sum(dzcat, axis=0, keepdims=True)
            dw1t_ref[:] += jnp.sum(srow * dzcat, axis=0, keepdims=True)
            dw2_ref[:] += jnp.dot(
                hcat.T, dkcat, preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            db2_ref[:] += jnp.sum(dkcat, axis=0, keepdims=True)
            dw2t_ref[:] += jnp.sum(srow * dkcat, axis=0, keepdims=True)

        return read, eval_keep, make_stash, vjp, flush

    # autonomous Dense chain
    _, pads, acts, lead = family
    L = len(pads) - 1

    def read(wrefs):
        return tuple(r[:] for r in wrefs)

    def eval_keep(wv, x, s):
        a = jnp.tanh(x) if lead else x
        alist = [a]
        for i in range(L):
            z = jnp.dot(
                a, wv[2 * i], preferred_element_type=jnp.float32,
                precision=precision,
            ) + wv[2 * i + 1]
            a = jnp.tanh(z) if acts[i] else z
            alist.append(a)
        return a, (x, tuple(alist))

    def make_stash():
        return {
            "a": [[None] * 6 for _ in range(L)],
            "dz": [[None] * 6 for _ in range(L)],
        }

    def vjp(wv, dk, aux, stash, i_s):
        x, alist = aux
        da = dk
        for l in reversed(range(L)):
            dz = da * (1.0 - alist[l + 1] * alist[l + 1]) if acts[l] else da
            stash["a"][l][i_s] = alist[l]
            stash["dz"][l][i_s] = dz
            da = jnp.dot(
                dz, wv[2 * l].T, preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
        return da * (1.0 - alist[0] * alist[0]) if lead else da

    def flush(wv, grefs, stash):
        for l in range(L):
            acat = jnp.concatenate(stash["a"][l], axis=0)
            dzcat = jnp.concatenate(stash["dz"][l], axis=0)
            grefs[2 * l][:] += jnp.dot(
                acat.T, dzcat, preferred_element_type=jnp.float32,
                precision=grad_precision,
            )
            grefs[2 * l + 1][:] += jnp.sum(dzcat, axis=0, keepdims=True)

    return read, eval_keep, make_stash, vjp, flush


# ---------------------------------------------------------------------------
# VMEM plans / feasibility


def _plan(B: int, F: int, H_pad: int, n_save: int, replay_tile: int = 0):
    """Sweep tile size under the VMEM budget (or None) — TD-MLP family.
    ``replay_tile > 0`` (two-level mode) additionally budgets the
    window-replay working set: 4 batch-sized state buffers + the forward-
    tile stage temporaries."""
    # residents: ct_y input, a_u, a_k outs, 2-slot knot stage, ct_ys input
    resident = (3 + 2 + n_save) * B * F * 4
    resident += (2 * F * H_pad + 2 * H_pad + 4 * F) * 4  # weights
    resident += (F * H_pad + 2 * H_pad + H_pad * F + 2 * F) * 4  # wgrads
    if replay_tile > 0:
        resident += 4 * B * F * 4  # u_work, k1_work, cand_u, cand_k7
        resident += 11 * replay_tile * F * 4 + 3 * replay_tile * H_pad * 4
    for tb in (128, 64, 32, 16, 8):
        if tb > B or B % tb:
            continue
        # +12 F-tiles / +12 H-tiles for the stage-batched weight-grad
        # concatenations (xcat/dkcat and dzcat/hcat)
        temps = 32 * tb * F * 4 + 20 * tb * H_pad * 4
        if resident + temps <= _VMEM_BUDGET:
            return tb, resident + temps
    return None, None


def _chain_sweep_plan(B: int, F_pad: int, family, n_save: int,
                      replay_tile: int = 0):
    """Sweep tile size under the VMEM budget — Dense-chain family."""
    _, pads, _, _ = family
    L = len(pads) - 1
    maxp = max(pads)
    wbytes = sum(
        pads[i] * pads[i + 1] + pads[i + 1] for i in range(L)
    ) * 4
    resident = (3 + 2 + n_save) * B * F_pad * 4 + 2 * wbytes
    if replay_tile > 0:
        resident += 4 * B * F_pad * 4
        resident += 11 * replay_tile * F_pad * 4 \
            + 3 * replay_tile * maxp * 4
    # whole-batch first — see fused_solve._chain_plan (narrow state ⇒
    # serial-latency-bound; tiling multiplies the serial matmul count)
    for tb in (B, 128, 64, 32, 16, 8):
        if tb > B or B % tb:
            continue
        # auxs: 7 evals × (L+1) activations; stash: 6 stages × L × 2
        temps = (20 * tb * F_pad
                 + (7 * (L + 1) + 12 * L) * tb * maxp) * 4
        if resident + temps <= _VMEM_BUDGET:
            return tb, resident + temps
    return None, None


def _forward_tile(params, B: int, F: int, n_save: int,
                  use_reservoir: bool):
    """The tile size the persistent FORWARD kernel uses for this config —
    the window replay must run at exactly this tile for bitwise accept
    parity (fused_solve.run_attempt_tiles contract)."""
    H = params["layer_0"]["b"].shape[0]
    H_pad = -(-H // 128) * 128
    F_pad = -(-F // 128) * 128
    return _fwd_plan(B, F_pad, H_pad, n_save, use_reservoir, True)[0]


def sweep_feasible(params, B: int, F: int, n_save: int,
                   two_level: bool = False,
                   use_reservoir: bool = False) -> bool:
    """Whether the persistent sweep kernel can run this configuration —
    the forward gates its PADDED knot recording on this (the XLA fallback
    sweep expects unpadded knots)."""
    if n_save > _MAX_NSAVE:
        return False
    H = params["layer_0"]["b"].shape[0]
    H_pad = -(-H // 128) * 128
    F_pad = -(-F // 128) * 128
    replay_tile = 0
    if two_level:
        replay_tile = _forward_tile(params, B, F, n_save, use_reservoir)
        if replay_tile is None:
            return False
    return _plan(B, F_pad, H_pad, n_save, replay_tile or 0)[0] is not None


def _chain_forward_tile(chain_info, B, n_save, use_reservoir):
    spec, _, _ = chain_info
    F_pad = spec[1][0]
    max_pad = max(spec[1])
    return _chain_plan(
        B, F_pad, max_pad, family_weight_bytes(spec), n_save, use_reservoir
    )[0]


def chain_sweep_feasible(chain_info, B: int, n_save: int,
                         two_level: bool = False,
                         use_reservoir: bool = False) -> bool:
    """Dense-chain analog of ``sweep_feasible``."""
    if n_save > _MAX_NSAVE_CHAIN:
        return False
    spec = chain_info[0]
    F_pad = spec[1][0]
    replay_tile = 0
    if two_level:
        replay_tile = _chain_forward_tile(
            chain_info, B, n_save, use_reservoir
        )
        if replay_tile is None:
            return False
    return _chain_sweep_plan(
        B, F_pad, spec, n_save, replay_tile or 0
    )[0] is not None


# ---------------------------------------------------------------------------
# kernel


def _make_kernel(precision, grad_precision, B, F, F_logical, tb, n_save,
                 n_dense, two_level, rtol, atol, max_steps, stride,
                 dense_cap, tb_f, family, recompute_precision="match"):
    n_tiles = B // tb
    coeffs = _stage_coeffs()
    ctrl = PIController()
    inv_n = 1.0 / float(B * F_logical) if two_level else 0.0
    n_tiles_f = B // tb_f if two_level else 0
    n_w = family_n_weights(family)
    # the sweep's per-step stage recompute serves GRADIENTS only (the step
    # was accepted in the forward), so it may run below the forward
    # precision; the window REPLAY (family_make_f below) always keeps
    # `precision` — it re-runs the adaptive loop and must reproduce the
    # forward's accept decisions bitwise.
    if recompute_precision == "match":
        recompute_precision = precision
    read_w, eval_keep, make_stash, eval_vjp, flush = _family_hooks(
        family, recompute_precision, grad_precision, tb
    )

    def kernel(*refs):
        it = iter(refs)
        sc_ref = next(it)            # SMEM (1,) i32: naccept
        knot_ts_ref = next(it)       # SMEM (n_dense,)
        saveat_ref = next(it)        # SMEM (n_save,)
        if two_level:
            scf_ref = next(it)       # SMEM (1,) f32: t_end
            ckpt_ts_ref = next(it)   # SMEM (n_ckpt,)
            ckpt_dts_ref = next(it)
            ckpt_qolds_ref = next(it)
        wrefs = [next(it) for _ in range(n_w)]
        ctys_ref = next(it)          # VMEM (n_save·B, F)
        cty_ref = next(it)           # VMEM (B, F)
        knot_us_ref = next(it)       # ANY (n_dense·B, F)
        if two_level:
            ckpt_us_ref = next(it)   # ANY (n_ckpt·B, F)
            ckpt_ks_ref = next(it)   # ANY (n_ckpt·B, F)
        au_ref = next(it)
        ak_ref = next(it)
        grefs = [next(it) for _ in range(n_w)]
        if two_level:
            local_us_ref = next(it)  # ANY ((W+1)·B, F): replayed window
        stage_ref = next(it)         # VMEM (2B, F)
        if two_level:
            u_work_ref = next(it)    # VMEM (B, F)
            k1_work_ref = next(it)   # VMEM (B, F)
            cand_u_ref = next(it)    # VMEM (B, F)
            cand_k7_ref = next(it)   # VMEM (B, F)
            local_ts_ref = next(it)  # SMEM (W+1,)
        sems = next(it)              # DMA (4,)

        naccept = sc_ref[0]

        # ---- init carries and accumulators
        au_ref[:] = cty_ref[:]
        ak_ref[:] = jnp.zeros_like(ak_ref)
        for g in grefs:
            g[:] = jnp.zeros_like(g)

        def knot_dma(src_ref, j, slot):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(j * B, B), :],
                stage_ref.at[pl.ds(slot * B, B), :],
                sems.at[slot],
            )

        def sweep_step(t, tn, slot):
            """Transpose ONE accepted step whose start state sits in
            ``stage_ref`` slot ``slot``; carries a_u/a_k and accumulates
            weight grads in place."""
            dt = tn - t

            # saveat-hit interpolation weights (scalars per (stage, save))
            wt = []  # wt[m][s] = dt·b_m(θ_s)·hit_s
            hit_f = []
            for s_idx in range(n_save):
                s_t = saveat_ref[s_idx]
                hit = ((s_t > t) & (s_t <= tn)).astype(jnp.float32)
                theta = jnp.clip((s_t - t) / dt, 0.0, 1.0)
                bs = tsit5_interp_weights(theta)
                hit_f.append(hit)
                wt.append([dt * b * hit for b in bs])
            any_hit = sum(hit_f) > 0.0

            def tile_pass(i, _):
                off = i * tb
                u = stage_ref[pl.ds(slot * B + off, tb), :]
                # weight refs are read per tile iteration (hoisting big
                # vector values across loop levels is a Mosaic hazard)
                wv = read_w(wrefs)

                # ---- forward recompute (k1 from scratch — FSAL value)
                k1, aux1 = eval_keep(wv, u, t)
                ks = [k1]
                auxs = [aux1]
                for (a_row, c) in coeffs:
                    x = u
                    for a, k in zip(a_row, ks):
                        x = x + (dt * a) * k
                    s = t + c * dt
                    k_new, aux = eval_keep(wv, x, s)
                    ks.append(k_new)
                    auxs.append(aux)

                # ---- stage cotangents. saveat hits are rare (≤ n_save
                # per SOLVE): the cond skips the ct_ys reads and 8×(tb,F)
                # weighted sums on the common no-hit step.
                a_u = au_ref[pl.ds(off, tb), :]
                a_k = ak_ref[pl.ds(off, tb), :]
                zero = jnp.zeros_like(a_u)

                def with_hits(_):
                    cts = [
                        ctys_ref[pl.ds(s_idx * B + off, tb), :]
                        for s_idx in range(n_save)
                    ]

                    def k_ct(m):
                        acc = jnp.zeros_like(a_u)
                        for s_idx in range(n_save):
                            acc = acc + wt[s_idx][m] * cts[s_idx]
                        return acc

                    d_u_i = jnp.zeros_like(a_u)
                    for s_idx in range(n_save):
                        d_u_i = d_u_i + hit_f[s_idx] * cts[s_idx]
                    return tuple(k_ct(m) for m in range(7)) + (d_u_i,)

                def no_hits(_):
                    return (zero,) * 8

                hit_vals = lax.cond(any_hit, with_hits, no_hits, 0)
                d_ks = list(hit_vals[:7])
                d_u_interp = hit_vals[7]
                d_ks[6] = d_ks[6] + a_k  # FSAL: k7 feeds next step's k1

                d_u = jnp.zeros_like(a_u)
                d_x_pending = [zero] * 6
                d_x_pending[5] = d_x_pending[5] + a_u  # x7 = u_new

                stash = make_stash()
                for i_s in reversed(range(6)):  # evals producing k2..k7
                    dx = eval_vjp(
                        wv, d_ks[i_s + 1], auxs[i_s + 1], stash, i_s
                    )
                    dx_total = dx + d_x_pending[i_s]
                    d_u = d_u + dx_total
                    a_row = coeffs[i_s][0]
                    for j_s, a in enumerate(a_row):
                        d_ks[j_s] = d_ks[j_s] + (dt * a) * dx_total

                flush(wv, grefs, stash)

                # carries: a_u ← d_u + Σ_hit ct ; a_k ← d_k1 + dt·b1(θ)·ct
                au_ref[pl.ds(off, tb), :] = d_u + d_u_interp
                ak_ref[pl.ds(off, tb), :] = d_ks[0]
                return 0

            lax.fori_loop(0, n_tiles, tile_pass, 0)

        def sweep_range(n_hi, read_ts, us_ref):
            """Reverse-transpose steps j = n_hi-1 .. 0 whose start states
            sit in rows [j·B, (j+1)·B) of ``us_ref`` (double-buffered)."""
            j0 = n_hi - 1

            @pl.when(j0 >= 0)
            def _():
                knot_dma(us_ref, j0, j0 % 2).start()

            def body(i, _):
                j = n_hi - 1 - i
                slot = j % 2
                knot_dma(us_ref, j, slot).wait()

                @pl.when(j - 1 >= 0)
                def _():
                    knot_dma(us_ref, j - 1, 1 - slot).start()

                sweep_step(read_ts(j), read_ts(j + 1), slot)
                return 0

            lax.fori_loop(0, n_hi, body, 0)

        if not two_level:
            sweep_range(naccept, lambda j: knot_ts_ref[j], knot_us_ref)
            return

        # ---------------- two-level: branch per solve ----------------
        t_end = scf_ref[0]
        W = stride

        @pl.when(naccept <= dense_cap)
        def _():
            sweep_range(naccept, lambda j: knot_ts_ref[j], knot_us_ref)

        @pl.when(naccept > dense_cap)
        def _():
            f_fwd = family_make_f(family, wrefs, precision)

            def state_dma(hbm_ref, slot_i, vm_ref, sem_i):
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(slot_i * B, B), :], vm_ref,
                    sems.at[sem_i],
                )

            def local_write(slot_i):
                return pltpu.make_async_copy(
                    u_work_ref, local_us_ref.at[pl.ds(slot_i * B, B), :],
                    sems.at[2],
                )

            w_start = (naccept - 1) // W

            def win_body(wi, _):
                w = w_start - wi
                base = w * W
                n_steps = jnp.clip(naccept - base, 0, W)

                # load checkpoint w (synchronous, once per window)
                state_dma(ckpt_us_ref, w, u_work_ref, 2).start()
                state_dma(ckpt_ks_ref, w, k1_work_ref, 3).start()
                state_dma(ckpt_us_ref, w, u_work_ref, 2).wait()
                state_dma(ckpt_ks_ref, w, k1_work_ref, 3).wait()
                local_ts_ref[0] = ckpt_ts_ref[w]
                local_write(0).start()
                local_write(0).wait()

                # ---- replay ≤W accepted steps (bitwise: forward's own
                # tile code at the forward's tile size)
                def rcond(c):
                    i, att = c[0], c[1]
                    return (i < n_steps) & (att < max_steps)

                def rbody(c):
                    i, att, t, dt, qold = c
                    t_rem = t_end - t
                    dt_c = jnp.minimum(dt, t_rem)
                    is_last = dt >= t_rem
                    t_new = jnp.where(is_last, t_end, t + dt_c)
                    err_sq = run_attempt_tiles(
                        f_fwd, u_work_ref, k1_work_ref, cand_u_ref,
                        cand_k7_ref, t, dt_c, tb_f, n_tiles_f, atol, rtol,
                    )
                    eest = jnp.sqrt(err_sq * inv_n)
                    accept = eest <= 1.0
                    dt_acc, dt_rej, qold_acc = _propose(
                        ctrl, eest, dt_c, qold
                    )

                    @pl.when(accept)
                    def _():
                        u_work_ref[:] = cand_u_ref[:]
                        k1_work_ref[:] = cand_k7_ref[:]
                        local_ts_ref[i + 1] = t_new
                        local_write(i + 1).start()
                        local_write(i + 1).wait()

                    return (
                        i + accept.astype(jnp.int32),
                        att + 1,
                        jnp.where(accept, t_new, t),
                        jnp.where(accept, dt_acc, dt_rej),
                        jnp.where(accept, qold_acc, qold),
                    )

                fin = lax.while_loop(
                    rcond, rbody,
                    (
                        jnp.int32(0), jnp.int32(0), ckpt_ts_ref[w],
                        ckpt_dts_ref[w], ckpt_qolds_ref[w],
                    ),
                )

                # ---- sweep the replayed window. Sweep the count the
                # replay ACTUALLY accepted (== n_steps when the replay is
                # exact; an ulp-level accept flip must not sweep stale
                # buffer slots).
                sweep_range(
                    jnp.minimum(fin[0], n_steps),
                    lambda j: local_ts_ref[j], local_us_ref,
                )
                return 0

            lax.fori_loop(0, w_start + 1, win_body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(precision, grad_precision, B, F, F_logical, H_pad, tb,
                n_save, n_dense, two_level, rtol, atol, max_steps, stride,
                dense_cap, tb_f, n_ckpt, vmem_limit, interpret,
                family=("tdmlp",), recompute_precision="match"):
    kernel = _make_kernel(
        precision, grad_precision, B, F, F_logical, tb, n_save, n_dense,
        two_level, rtol, atol, max_steps, stride, dense_cap, tb_f, family,
        recompute_precision=recompute_precision,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)  # noqa: E731

    n_w = family_n_weights(family)
    in_specs = [smem(), smem(), smem()]
    if two_level:
        in_specs += [smem(), smem(), smem(), smem()]
    in_specs += [vmem()] * n_w    # weights
    in_specs += [vmem(), vmem()]  # ct_ys (n_save·B, F), ct_y
    in_specs += [any_()]          # knot_us (n_dense·B, F)
    if two_level:
        in_specs += [any_(), any_()]  # ckpt_us, ckpt_ks

    out_specs = [vmem(), vmem()] + [vmem()] * n_w
    out_shape = [
        jax.ShapeDtypeStruct((B, F), jnp.float32),      # a_u
        jax.ShapeDtypeStruct((B, F), jnp.float32),      # a_k
    ] + [
        jax.ShapeDtypeStruct(s, jnp.float32)
        for s in _family_grad_shapes(family, F, H_pad)
    ]
    if two_level:
        # HBM scratch for the replayed window (outputs are the only way
        # to get an HBM-resident buffer; the caller discards it)
        out_specs.append(any_())
        out_shape.append(
            jax.ShapeDtypeStruct(((stride + 1) * B, F), jnp.float32)
        )
    scratch = [
        pltpu.VMEM((2 * B, F), jnp.float32),
    ]
    if two_level:
        scratch += [
            pltpu.VMEM((B, F), jnp.float32),
            pltpu.VMEM((B, F), jnp.float32),
            pltpu.VMEM((B, F), jnp.float32),
            pltpu.VMEM((B, F), jnp.float32),
            pltpu.SMEM((stride + 1,), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    return pl.pallas_call(
        kernel,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # sized to the plan estimate — see fused_solve on why not the
            # full physical VMEM
            vmem_limit_bytes=vmem_limit,
            has_side_effects=True,
        ),
        interpret=interpret,
    )


def _pad_inputs(params, ct_ys, ct_y, F, F_pad):
    w1, b1, w1t, w2, b2, w2t = _split_params(params, pad_hidden=True)
    if F_pad != F:
        fpad = lambda a: jnp.pad(a, ((0, 0), (0, F_pad - F)))  # noqa: E731
        ct_y_in = fpad(ct_y)
        ct_ys_in = jnp.pad(ct_ys, ((0, 0), (0, 0), (0, F_pad - F)))
        w1_in = jnp.pad(w1, ((0, F_pad - F), (0, 0)))
        w2_in, b2_in, w2t_in = fpad(w2), fpad(b2), fpad(w2t)
    else:
        ct_y_in, ct_ys_in = ct_y, ct_ys
        w1_in, w2_in, b2_in, w2t_in = w1, w2, b2, w2t
    return (w1_in, b1, w1t, w2_in, b2_in, w2t_in), ct_ys_in, ct_y_in


def _unpack_out(out, params, F, H_pad):
    a_u, a_k, dw1, db1, dw1t, dw2, db2, dw2t = out[:8]
    H = params["layer_0"]["b"].shape[0]  # unpadded hidden dim
    d_params = {
        "layer_0": {
            "w": jnp.concatenate([dw1[:F, :H], dw1t[:, :H]], axis=0),
            "b": db1[0, :H],
        },
        "layer_1": {
            "w": jnp.concatenate([dw2[:H, :F], dw2t[:, :F]], axis=0),
            "b": db2[0, :F],
        },
    }
    return a_u[:, :F], a_k[:, :F], d_params


def persistent_stored_sweep(params, knot_ts, knot_us, naccept, saveat_arr,
                            ct_ys, ct_y, precision=None,
                            grad_precision=None,
                            recompute_precision="match"):
    """Run the whole dense stored-adjoint sweep in one Pallas program.

    Returns ``(a_u, a_k, d_params)`` — the state cotangent at t0+, the
    FSAL-chain cotangent on k1_0 (the caller closes it through
    ``vjp(f(u0, t0))``), and the parameter cotangents in the TDChain
    structure — or ``None`` when the configuration doesn't fit the VMEM
    plan (caller falls back to the XLA sweep).
    """
    B, F = ct_y.shape
    n_save = int(saveat_arr.shape[0])
    if n_save > _MAX_NSAVE:
        return None
    H_pad = -(-params["layer_0"]["b"].shape[0] // 128) * 128
    # knots arrive PADDED from the persistent forward (lane-aligned DMA);
    # unpadded, non-lane-aligned knots (XLA-loop forward) can't be DMA'd
    # on real TPUs — decline to the XLA sweep (interpret mode is exempt)
    F_pad = knot_us.shape[-1]
    if F_pad % 128 != 0 and not _interpret():
        return None
    tb, vmem_est = _plan(B, F_pad, H_pad, n_save)
    if tb is None:
        return None
    n_dense = knot_us.shape[0]

    weights, ct_ys_in, ct_y_in = _pad_inputs(params, ct_ys, ct_y, F, F_pad)

    call = _build_call(
        precision, grad_precision, B, F_pad, F, H_pad, tb, n_save, n_dense,
        False, 0.0, 0.0, 0, 1, 0, 0, 0,
        int(vmem_est) + 6 * 1024 * 1024, _interpret(),
        recompute_precision=recompute_precision,
    )
    sc = jnp.asarray(naccept, jnp.int32)[None]
    out = call(
        sc, jnp.asarray(knot_ts, jnp.float32),
        jnp.asarray(saveat_arr, jnp.float32),
        *weights,
        ct_ys_in.reshape(n_save * B, F_pad), ct_y_in,
        knot_us.reshape(n_dense * B, F_pad),
    )
    return _unpack_out(out, params, F, H_pad)


def persistent_two_level_sweep(params, knot_ts, knot_us, naccept,
                               saveat_arr, ct_ys, ct_y,
                               ckpt_ts, ckpt_us, ckpt_ks, ckpt_dts,
                               ckpt_qolds, *, t_end, rtol, atol, max_steps,
                               stride, dense_cap, use_reservoir=False,
                               precision=None, grad_precision=None,
                               recompute_precision="match",
                               _return_locals=False):
    """Two-level stored-adjoint sweep: dense when the solve fits, windowed
    in-kernel replay from the forward's checkpoints otherwise (branch
    taken per solve, in-kernel). Same return contract / decline behavior
    as ``persistent_stored_sweep``.

    ONLY valid when the forward was the persistent kernel — the replay
    reproduces ITS arithmetic (``fused_solve.run_attempt_tiles`` at the
    forward's tile size), not the XLA loop's.
    """
    B, F = ct_y.shape
    n_save = int(saveat_arr.shape[0])
    if n_save > _MAX_NSAVE:
        return None
    H_pad = -(-params["layer_0"]["b"].shape[0] // 128) * 128
    F_pad = knot_us.shape[-1]
    if F_pad % 128 != 0 and not _interpret():
        return None
    tb_f = _forward_tile(params, B, F, n_save, use_reservoir)
    if tb_f is None:
        return None
    tb, vmem_est = _plan(B, F_pad, H_pad, n_save, replay_tile=tb_f)
    if tb is None:
        return None
    n_dense = knot_us.shape[0]
    n_ckpt = ckpt_us.shape[0]

    weights, ct_ys_in, ct_y_in = _pad_inputs(params, ct_ys, ct_y, F, F_pad)

    call = _build_call(
        precision, grad_precision, B, F_pad, F, H_pad, tb, n_save, n_dense,
        True, float(rtol), float(atol), int(max_steps), int(stride),
        int(dense_cap), tb_f, n_ckpt,
        int(vmem_est) + 6 * 1024 * 1024, _interpret(),
        recompute_precision=recompute_precision,
    )
    sc = jnp.asarray(naccept, jnp.int32)[None]
    scf = jnp.asarray(t_end, jnp.float32)[None]
    out = call(
        sc, jnp.asarray(knot_ts, jnp.float32),
        jnp.asarray(saveat_arr, jnp.float32),
        scf,
        jnp.asarray(ckpt_ts, jnp.float32),
        jnp.asarray(ckpt_dts, jnp.float32),
        jnp.asarray(ckpt_qolds, jnp.float32),
        *weights,
        ct_ys_in.reshape(n_save * B, F_pad), ct_y_in,
        knot_us.reshape(n_dense * B, F_pad),
        ckpt_us.reshape(n_ckpt * B, F_pad),
        ckpt_ks.reshape(n_ckpt * B, F_pad),
    )
    if _return_locals:
        # debug/test hook: the HBM window-replay buffer after the LAST
        # (w=0) window — lets tests assert replay fidelity directly
        return _unpack_out(out, params, F, H_pad), out[8].reshape(
            stride + 1, B, F_pad
        )
    return _unpack_out(out, params, F, H_pad)


def persistent_chain_sweep(params, chain_info, knot_ts, knot_us, naccept,
                           saveat_arr, ct_ys, ct_y, *, two_level_ctx=None,
                           precision=None, grad_precision=None,
                           recompute_precision="match"):
    """Dense-chain (latent gen-dynamics) stored-adjoint sweep — dense and
    two-level modes in one entry point. Returns ``(a_u, a_k, d_params)``
    with ``d_params`` in the chain's param-tree structure (zeros for
    parameterless layers), or ``None`` on decline."""
    spec, keys, dims = chain_info
    B, F = ct_y.shape
    n_save = int(saveat_arr.shape[0])
    if n_save > _MAX_NSAVE_CHAIN:
        return None
    F_pad = knot_us.shape[-1]
    if F_pad % 128 != 0 and not _interpret():
        return None
    if F_pad != spec[1][0]:
        return None
    two_level = two_level_ctx is not None
    tb_f = 0
    if two_level:
        tb_f = _chain_forward_tile(
            chain_info, B, n_save, two_level_ctx["use_reservoir"]
        )
        if tb_f is None:
            return None
    tb, vmem_est = _chain_sweep_plan(
        B, F_pad, spec, n_save, replay_tile=tb_f
    )
    if tb is None:
        return None
    n_dense = knot_us.shape[0]

    weights = pack_chain_weights(params, spec, keys, dims)
    if F_pad != F:
        ct_y_in = jnp.pad(ct_y, ((0, 0), (0, F_pad - F)))
        ct_ys_in = jnp.pad(ct_ys, ((0, 0), (0, 0), (0, F_pad - F)))
    else:
        ct_y_in, ct_ys_in = ct_y, ct_ys

    if two_level:
        c = two_level_ctx
        n_ckpt = c["ckpt_us"].shape[0]
        call = _build_call(
            precision, grad_precision, B, F_pad, F, 0, tb, n_save,
            n_dense, True, float(c["rtol"]), float(c["atol"]),
            int(c["max_steps"]), int(c["stride"]), int(c["dense_cap"]),
            tb_f, n_ckpt, int(vmem_est) + 6 * 1024 * 1024, _interpret(),
            spec, recompute_precision=recompute_precision,
        )
        sc = jnp.asarray(naccept, jnp.int32)[None]
        scf = jnp.asarray(c["t_end"], jnp.float32)[None]
        out = call(
            sc, jnp.asarray(knot_ts, jnp.float32),
            jnp.asarray(saveat_arr, jnp.float32),
            scf,
            jnp.asarray(c["ckpt_ts"], jnp.float32),
            jnp.asarray(c["ckpt_dts"], jnp.float32),
            jnp.asarray(c["ckpt_qolds"], jnp.float32),
            *weights,
            ct_ys_in.reshape(n_save * B, F_pad), ct_y_in,
            knot_us.reshape(n_dense * B, F_pad),
            c["ckpt_us"].reshape(n_ckpt * B, F_pad),
            c["ckpt_ks"].reshape(n_ckpt * B, F_pad),
        )
    else:
        call = _build_call(
            precision, grad_precision, B, F_pad, F, 0, tb, n_save,
            n_dense, False, 0.0, 0.0, 0, 1, 0, 0, 0,
            int(vmem_est) + 6 * 1024 * 1024, _interpret(), spec,
            recompute_precision=recompute_precision,
        )
        sc = jnp.asarray(naccept, jnp.int32)[None]
        out = call(
            sc, jnp.asarray(knot_ts, jnp.float32),
            jnp.asarray(saveat_arr, jnp.float32),
            *weights,
            ct_ys_in.reshape(n_save * B, F_pad), ct_y_in,
            knot_us.reshape(n_dense * B, F_pad),
        )

    a_u, a_k = out[0], out[1]
    grads = out[2:2 + len(weights)]
    # structure-exact param cotangents (zeros for parameterless layers)
    d_params = jax.tree_util.tree_map(jnp.zeros_like, params)
    for i, key in enumerate(keys):
        dw = grads[2 * i][:dims[i], :dims[i + 1]]
        db = grads[2 * i + 1][0, :dims[i + 1]]
        d_params = {**d_params, key: {"w": dw, "b": db}}
    return a_u[:, :F], a_k[:, :F], d_params
