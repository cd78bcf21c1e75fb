"""Persistent-loop Pallas kernel: the ENTIRE adaptive Tsit5 solve in one
TPU program.

The per-step fused kernel (``fused_mlp.fused_tsit5_step``) already keeps one
step's 12 matmuls in VMEM, but the surrounding XLA loop still round-trips
~20 batch-sized tensors through HBM per attempt (stage outputs, commit
selects, error-norm reads) plus the loop-machinery dispatch — measured at
~60% of per-attempt cost on the flagship MLP (RESULTS.md round-2 gap). This
kernel eliminates the carrier traffic entirely:

- **State lives in VMEM across the whole solve**: ``u`` (the ``y_final``
  output ref doubles as the working buffer), the FSAL derivative ``k1``,
  and the step candidates ``(u_cand, k7_cand)`` — 4 batch-sized buffers
  (~6.4 MB at B=512, F=784) resident for the full adaptive loop.
- **The accept/reject loop is an in-kernel ``lax.while_loop``** carrying
  only scalars (t, dt, qold, counters); each attempt runs the 6 stages
  tile-by-tile over the batch and accumulates the shared-batch error norm
  (one dt, one RMS norm over the whole tensor — the reference semantics,
  ``src/perform_step.jl:36-37``) without leaving the chip.
- **Controller math runs in-kernel** (the same ``PIController`` formulas —
  pure scalar jnp ops compile fine under Mosaic).
- **Dense output is written speculatively**: the saveat-hit test
  ``s ∈ (t, t+dt]`` only depends on pre-step scalars, so interpolated
  outputs are written during the stage pass; a rejected attempt's write is
  always overwritten later by the accepted step that crosses ``s``
  (last-write-wins on a mutable ref — the functional XLA loop can't do
  this). A post-loop fixup reverts entries beyond the final accepted time
  to ``u0``, so FAILED solves (max_steps exhausted) match the XLA loop's
  accept-only commits too.
- **Knot recording for the stored adjoint streams to HBM via async DMA**:
  on accept, the committed ``(u, k1)`` are DMA'd to the knot buffers while
  the next attempt computes; the copy is awaited at the *next* accept
  before the buffers are overwritten (single-slot pipelining).
- **Two-level checkpointing** (``knot_stride = W > 1``): every W-th
  accepted state is ADDITIONALLY recorded together with the controller
  state ``(dt_next, qold)`` — the persistent backward sweep
  (``fused_solve_bwd``) replays one W-step window at a time from these
  checkpoints using ``run_attempt_tiles`` below with the SAME tile size,
  so the replayed accept/reject sequence is arithmetically identical to
  this forward's (the XLA replay cannot guarantee that against a
  persistent forward — different error-norm reduction order). This makes
  the reference's ``maxiters = 10_000`` configs (``construct.jl:196``)
  run entirely on the persistent kernels.
- **Reservoir sampling** for the biased mode consumes pre-generated
  uniforms (one per attempt, SMEM) — O(1) memory, distributionally
  identical to the XLA loop's per-iteration key splits.

Numerical parity with the XLA loop: stage math is identical (same per-row
matmuls — batch tile size does not change row values), but the error-norm
REDUCTION ORDER differs (per-tile partial sums vs XLA's tree reduction), so
accept sequences can diverge by an ulp-level coin flip on rare steps.
Trajectories agree to solver accuracy; NFE counts agree up to that
boundary effect.

Reference parity: this module replaces OrdinaryDiffEq's integrator loop
(SURVEY.md §2d: ``solve(...)`` at ``src/layers/neural_ode.jl:51``) for the
fused TD-MLP dynamics family; semantics (controller constants, FSAL, NFE
accounting, saveat handling) match ``ode/solve.py``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ode.controller import PIController, initial_step_size
from ...ode.tableaus import Tsit5Tableau as T
from ...ode.tableaus import tsit5_interp_weights
from .fused_mlp import _eval_mlp, _split_params


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# v5e physical VMEM is 128 MB (measured: 120 MB scratch compiles AND runs;
# the widely-quoted ~16 MB is only Mosaic's default soft limit)
_VMEM_BUDGET = 88 * 1024 * 1024


# ---------------------------------------------------------------------------
# dynamics families. A family spec is a HASHABLE tuple (feeds the
# _build_call lru_cache) describing how the in-kernel dynamics read their
# weight operand refs:
#   ("tdmlp",)                      — the flagship TDChain TD-MLP
#                                     (6 operands: w1 b1 w1t w2 b2 w2t)
#   ("chain", dims, acts, lead)     — autonomous Dense chain (the latent
#                                     gen-dynamics family,
#                                     construct.jl:241-245): ``dims`` the
#                                     PADDED per-layer widths (P0..PL),
#                                     ``acts`` per-layer tanh flags,
#                                     ``lead`` a leading elementwise tanh
#                                     (2L operands: w_i (P_{i-1}, P_i),
#                                     b_i (1, P_i))
#   ("pfode", pads, acts, beta_min, beta_max, t1)
#                                   — the probability-flow VP-SDE sampler
#                                     (models/score_sde.py) in the
#                                     τ = t1 − t clock: with t = t1 − τ
#                                     and β(t) = βmin + t·Δβ,
#                                     f(x, τ) = ½β(t)·(x + s_θ(x, t)).
#                                     s_θ = TDChain-of-Dense score net
#                                     (fused_sde_solve.match_td_score_chain):
#                                     per layer wx_i (P_{i-1},P_i),
#                                     wt_i (1,P_i) — the time row of the
#                                     reference's (d+1)->h TD weight —
#                                     and b_i (1,P_i); 3L operands.


def family_n_weights(spec) -> int:
    if spec[0] == "tdmlp":
        return 6
    if spec[0] == "chain":
        return 2 * (len(spec[1]) - 1)
    if spec[0] == "pfode":
        return 3 * (len(spec[1]) - 1)
    raise ValueError(f"unknown dynamics family {spec[0]!r}")


def family_make_f(spec, wrefs, precision):
    """Build the in-kernel dynamics eval ``f(x, s) -> k`` from the weight
    operand refs."""
    if spec[0] == "tdmlp":
        w1, b1, w1t, w2, b2, w2t = wrefs

        def f(x, s):
            return _eval_mlp(
                x, s, w1[:], b1[:], w1t[:], w2[:], b2[:], w2t[:],
                precision,
            )

        return f
    if spec[0] == "chain":
        _, dims, acts, lead = spec

        def f(x, s):
            a = jnp.tanh(x) if lead else x
            for i in range(len(dims) - 1):
                z = jnp.dot(
                    a, wrefs[2 * i][:],
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ) + wrefs[2 * i + 1][:]
                a = jnp.tanh(z) if acts[i] else z
            return a

        return f
    if spec[0] == "pfode":
        _, pads, acts, beta_min, beta_max, t1 = spec
        d_beta = beta_max - beta_min

        def f(x, s):
            t = t1 - s
            b = beta_min + t * d_beta
            a = x
            for i in range(len(pads) - 1):
                z = jnp.dot(
                    a, wrefs[3 * i][:],
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ) + t * wrefs[3 * i + 1][:] + wrefs[3 * i + 2][:]
                a = jnp.tanh(z) if acts[i] else z
            # padded lanes of x and a are exact zeros, so f's are too
            return (0.5 * b) * (x + a)

        return f
    raise ValueError(f"unknown dynamics family {spec[0]!r}")


def _plan(B: int, F: int, H_pad: int, n_save: int, use_reservoir: bool,
          record_knots: bool):
    """Pick a batch tile size under the VMEM budget, or None if infeasible.

    Resident buffers: the u0/k1_0 INPUTS, u (=y_final out), k1, u_cand,
    k7_cand, ys (n_save), res_u (reservoir) — each B×F f32 — plus the
    weights. Per-tile temporaries: ~11 tile×F values (stages, update,
    utilde) + hidden.
    """
    resident = (6 + n_save + (1 if use_reservoir else 0)) * B * F * 4
    resident += (2 * F * H_pad + 2 * H_pad + 2 * F + 2 * F) * 4
    # whole-batch (512-row) tiles measured ~2× slower; 256 and 128 are
    # the contenders — the large budget is for feasibility only
    for tb in (256, 128, 64, 32, 16, 8):
        if tb > B or B % tb:
            continue
        temps = 11 * tb * F * 4 + 3 * tb * H_pad * 4
        if resident + temps <= _VMEM_BUDGET:
            return tb, resident + temps
    return None, None


def _pow(x, c):
    """Scalar x**c via exp/log — Mosaic has no powf legalization.
    Exact semantics for x ≥ 0 incl. x = 0 (log→-inf, exp→0)."""
    return jnp.where(
        x > 0.0, jnp.exp(c * jnp.log(jnp.maximum(x, 1e-38))), 0.0
    )


def _propose(ctrl: PIController, eest, dt, qold):
    """PIController.propose with pow replaced by exp/log (in-kernel).
    Same formulas as ode/controller.py:36-58."""
    finite = jnp.isfinite(eest)
    eest_safe = jnp.where(finite, jnp.maximum(eest, 0.0), 1.0)
    q11 = _pow(eest_safe, ctrl.beta1)
    q = q11 / _pow(qold, ctrl.beta2)
    q = jnp.maximum(
        1.0 / ctrl.qmax, jnp.minimum(1.0 / ctrl.qmin, q / ctrl.gamma)
    )
    dt_accept = jnp.where(finite, dt / q, dt * 0.5)
    dt_reject = jnp.where(
        finite,
        dt / jnp.minimum(1.0 / ctrl.qmin, q11 / ctrl.gamma),
        dt * 0.5,
    )
    qold_accept = jnp.maximum(eest_safe, jnp.float32(ctrl.qoldinit))
    return dt_accept, dt_reject, qold_accept


def run_attempt_tiles(f, u_ref, k1_ref, cand_u_ref, cand_k7_ref, t, dt_c,
                      tb, n_tiles, atol, rtol, on_stages=None):
    """One adaptive attempt's stage math, tile-by-tile over the batch:
    writes the step candidates ``(u_new, k7)`` into the cand refs and
    returns the accumulated squared scaled residual.

    BITWISE CONTRACT: the backward window replay (``fused_solve_bwd``)
    calls this with the same ``tb`` as the forward kernel, so the replayed
    error norm — and therefore the accept/reject and dt sequence — is
    arithmetically identical to the forward's. Any math change here is
    automatically shared by both.

    ``on_stages(off, ks, u)``: optional callback for the forward's
    speculative dense-output writes (pure stores — does not affect the
    computed values).
    """
    def tile_pass(i, err_acc):
        off = i * tb
        u = u_ref[pl.ds(off, tb), :]
        k1 = k1_ref[pl.ds(off, tb), :]
        k2 = f(u + dt_c * (T.a21 * k1), t + T.c1 * dt_c)
        k3 = f(u + dt_c * (T.a31 * k1 + T.a32 * k2), t + T.c2 * dt_c)
        k4 = f(
            u + dt_c * (T.a41 * k1 + T.a42 * k2 + T.a43 * k3),
            t + T.c3 * dt_c,
        )
        k5 = f(
            u + dt_c * (
                T.a51 * k1 + T.a52 * k2 + T.a53 * k3 + T.a54 * k4
            ),
            t + T.c4 * dt_c,
        )
        g6 = u + dt_c * (
            T.a61 * k1 + T.a62 * k2 + T.a63 * k3 + T.a64 * k4
            + T.a65 * k5
        )
        k6 = f(g6, t + dt_c)
        u_new = u + dt_c * (
            T.a71 * k1 + T.a72 * k2 + T.a73 * k3 + T.a74 * k4
            + T.a75 * k5 + T.a76 * k6
        )
        k7 = f(u_new, t + dt_c)
        utilde = dt_c * (
            T.btilde1 * k1 + T.btilde2 * k2 + T.btilde3 * k3
            + T.btilde4 * k4 + T.btilde5 * k5 + T.btilde6 * k6
            + T.btilde7 * k7
        )
        cand_u_ref[pl.ds(off, tb), :] = u_new
        cand_k7_ref[pl.ds(off, tb), :] = k7

        if on_stages is not None:
            on_stages(off, (k1, k2, k3, k4, k5, k6, k7), u)

        res = utilde / (
            atol + jnp.maximum(jnp.abs(u), jnp.abs(u_new)) * rtol
        )
        return err_acc + jnp.sum(res * res)

    return lax.fori_loop(0, n_tiles, tile_pass, jnp.float32(0.0))


def _make_kernel(precision, rtol, atol, B, F, F_logical, tb, n_save,
                 max_steps, n_dense, use_reservoir, stride, n_ckpt,
                 record_ks, family=("tdmlp",)):
    """Build the persistent-solve kernel body for a static configuration.

    ``F`` is the PADDED feature width (multiple of 128 — Mosaic DMA slices
    must be lane-aligned); all padding is exact zeros (zero weight rows/
    cols ⇒ zero stage values ⇒ zero residuals), so the math is bitwise
    identical to the unpadded program. ``F_logical`` only normalizes the
    shared-batch error norm.
    """
    record_knots = n_dense > 0
    record_ckpts = n_ckpt > 0
    n_tiles = B // tb
    ctrl = PIController()
    inv_n = 1.0 / float(B * F_logical)

    def kernel(*refs):
        it = iter(refs)
        sc_ref = next(it)            # SMEM (3,): t0, t_end, dt0
        saveat_ref = next(it)        # SMEM (n_save,)
        rand_ref = next(it) if use_reservoir else None  # SMEM (max_steps,)
        u0_ref = next(it)            # VMEM (B, F)
        k10_ref = next(it)           # VMEM (B, F)
        wrefs = [next(it) for _ in range(family_n_weights(family))]
        # outputs. NOTE: input→output aliasing is deliberately NOT used —
        # on the real-TPU execution path the aliased output buffer does
        # not observe the input values (measured: a fully-rejected solve
        # returned y_final ≠ u0), so the working state is explicit-copied.
        u_ref = next(it)             # VMEM (B, F): working u == y_final
        ys_ref = next(it)            # VMEM (n_save, B, F)
        stats_i_ref = next(it)       # SMEM (4,) i32: naccept nreject done natt
        stats_f_ref = next(it)       # SMEM (2,) f32: t_final, res_t
        res_u_ref = next(it) if use_reservoir else None
        if record_knots:
            # knot buffers are 2-D (n_dense·B, F) — Mosaic requires DMA
            # slices to be tile-aligned in the last two dims, so slot i is
            # the row block [i·B, (i+1)·B) (B is sublane-aligned; F rides
            # whole). The wrapper reshapes to (n_dense, B, F).
            knot_ts_ref = next(it)   # SMEM (n_dense,)
            knot_us_ref = next(it)   # ANY/HBM (n_dense·B, F)
            knot_ks_ref = next(it) if record_ks else None
        if record_ckpts:
            ckpt_ts_ref = next(it)     # SMEM (n_ckpt,)
            ckpt_dts_ref = next(it)    # SMEM (n_ckpt,)
            ckpt_qolds_ref = next(it)  # SMEM (n_ckpt,)
            ckpt_us_ref = next(it)     # ANY/HBM (n_ckpt·B, F)
            ckpt_ks_ref = next(it)     # ANY/HBM (n_ckpt·B, F)
        # scratch
        k1_ref = next(it)            # VMEM (B, F): working k1 (FSAL)
        cand_u_ref = next(it)        # VMEM (B, F)
        cand_k7_ref = next(it)       # VMEM (B, F)
        sems = next(it) if (record_knots or record_ckpts) else None

        t0 = sc_ref[0]
        t_end = sc_ref[1]
        dt0 = sc_ref[2]

        f = family_make_f(family, wrefs, precision)

        def dma_to(vm_ref, hbm_ref, slot, sem):
            off = pl.multiple_of(slot * B, B)
            return pltpu.make_async_copy(
                vm_ref, hbm_ref.at[pl.ds(off, B), :], sem
            )

        # ---- init
        u_ref[:] = u0_ref[:]
        k1_ref[:] = k10_ref[:]
        for s_idx in range(n_save):
            ys_ref[s_idx] = u0_ref[:]
        if use_reservoir:
            res_u_ref[:] = u0_ref[:]
        if record_knots:
            def init_ts(i, c):
                knot_ts_ref[i] = t_end
                return c

            lax.fori_loop(1, n_dense, init_ts, 0)
            knot_ts_ref[0] = t0

            # knot slot 0 = (t0, u0, k1_0); left in flight — first accept
            # (or kernel end) waits on it before overwriting u/k1.
            dma_to(u_ref, knot_us_ref, 0, sems.at[0]).start()
            if record_ks:
                dma_to(k1_ref, knot_ks_ref, 0, sems.at[1]).start()
        if record_ckpts:
            def init_ckpt(i, c):
                ckpt_ts_ref[i] = t_end
                ckpt_dts_ref[i] = 0.0
                ckpt_qolds_ref[i] = jnp.float32(ctrl.qoldinit)
                return c

            lax.fori_loop(1, n_ckpt, init_ckpt, 0)
            ckpt_ts_ref[0] = t0
            ckpt_dts_ref[0] = dt0
            ckpt_qolds_ref[0] = jnp.float32(ctrl.qoldinit)
            # synchronous copies (once per solve): slot 0 = (u0, k1_0)
            dma_to(u_ref, ckpt_us_ref, 0, sems.at[2]).start()
            dma_to(k1_ref, ckpt_ks_ref, 0, sems.at[3]).start()
            dma_to(u_ref, ckpt_us_ref, 0, sems.at[2]).wait()
            dma_to(k1_ref, ckpt_ks_ref, 0, sems.at[3]).wait()

        def attempt(carry):
            t, dt, qold, done, natt, nacc, nrej, res_t = carry
            t_rem = t_end - t
            dt_c = jnp.minimum(dt, t_rem)
            is_last = dt >= t_rem
            t_new = jnp.where(is_last, t_end, t + dt_c)

            # saveat hits are knowable pre-step (scalars only)
            hits = [
                (saveat_ref[i] > t) & (saveat_ref[i] <= t_new)
                for i in range(n_save)
            ]

            def on_stages(off, ks, u):
                # speculative dense output (see module docstring for why
                # last-write-wins makes this exact)
                for s_idx in range(n_save):
                    @pl.when(hits[s_idx])
                    def _(s_idx=s_idx, ks=ks, u=u):
                        theta = jnp.clip(
                            (saveat_ref[s_idx] - t) / dt_c, 0.0, 1.0
                        )
                        bs = tsit5_interp_weights(theta)
                        acc = bs[0] * ks[0]
                        for b_w, k_v in zip(bs[1:], ks[1:]):
                            acc = acc + b_w * k_v
                        ys_ref[s_idx, pl.ds(off, tb), :] = u + dt_c * acc

            err_sq = run_attempt_tiles(
                f, u_ref, k1_ref, cand_u_ref, cand_k7_ref, t, dt_c, tb,
                n_tiles, atol, rtol, on_stages,
            )
            eest = jnp.sqrt(err_sq * inv_n)
            accept = eest <= 1.0
            dt_acc, dt_rej, qold_acc = _propose(ctrl, eest, dt_c, qold)

            if use_reservoir:
                cnt = (nacc + 1).astype(jnp.float32)
                take = accept & (rand_ref[natt] * cnt < 1.0)
                res_t = jnp.where(take, t, res_t)

                @pl.when(take)
                def _():
                    # step-START state: read u before the commit below
                    res_u_ref[:] = u_ref[:]

            @pl.when(accept)
            def _():
                if record_knots:
                    # previous knot DMA must land before u/k1 change
                    dma_to(u_ref, knot_us_ref, 0, sems.at[0]).wait()
                    if record_ks:
                        dma_to(k1_ref, knot_ks_ref, 0, sems.at[1]).wait()
                u_ref[:] = cand_u_ref[:]
                k1_ref[:] = cand_k7_ref[:]
                if record_knots:
                    # writes beyond the dense capacity clamp to the LAST
                    # slot (keeps the DMA start/wait pairing balanced).
                    # Equivalent to the XLA loop's mode='drop' for every
                    # consumer: dense knots are only read when
                    # naccept <= dense_cap (no overflow) — the stored
                    # adjoint switches to windowed replay otherwise.
                    cnt_i = jnp.minimum(nacc + 1, n_dense - 1)
                    knot_ts_ref[cnt_i] = t_new
                    dma_to(u_ref, knot_us_ref, cnt_i, sems.at[0]).start()
                    if record_ks:
                        dma_to(k1_ref, knot_ks_ref, cnt_i, sems.at[1]).start()
                if record_ckpts:
                    cnt_raw = nacc + 1
                    ci = cnt_raw // stride

                    @pl.when(cnt_raw % stride == 0)
                    def _():
                        # checkpoint = state after this accept + the
                        # controller state (dt of the NEXT attempt, qold)
                        # a window replay needs (ode/solve.py parity).
                        # Synchronous: once per `stride` accepts.
                        ckpt_ts_ref[ci] = t_new
                        ckpt_dts_ref[ci] = dt_acc
                        ckpt_qolds_ref[ci] = qold_acc
                        dma_to(u_ref, ckpt_us_ref, ci, sems.at[2]).start()
                        dma_to(k1_ref, ckpt_ks_ref, ci, sems.at[3]).start()
                        dma_to(u_ref, ckpt_us_ref, ci, sems.at[2]).wait()
                        dma_to(k1_ref, ckpt_ks_ref, ci, sems.at[3]).wait()

            t = jnp.where(accept, t_new, t)
            dt = jnp.where(accept, dt_acc, dt_rej)
            qold = jnp.where(accept, qold_acc, qold)
            done = accept & is_last
            nacc = nacc + accept.astype(jnp.int32)
            nrej = nrej + (~accept).astype(jnp.int32)
            return (t, dt, qold, done, natt + 1, nacc, nrej, res_t)

        def cond(carry):
            _, _, _, done, natt, _, _, _ = carry
            return jnp.logical_not(done) & (natt < max_steps)

        init = (
            t0,
            dt0,
            jnp.float32(ctrl.qoldinit),
            t0 >= t_end,
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            t0,
        )
        t_f, _, _, done, natt, nacc, nrej, res_t = lax.while_loop(
            cond, attempt, init
        )

        # entries never covered by an ACCEPTED step revert to u0: the
        # speculative stage-pass writes can leave a REJECTED attempt's
        # interpolant behind when the solve fails/truncates (the XLA loop
        # only commits on accept — solve.py's hit & upd); on success this
        # is a no-op since accepted coverage reaches t_end.
        for s_idx in range(n_save):
            @pl.when(saveat_ref[s_idx] > t_f)
            def _(s_idx=s_idx):
                ys_ref[s_idx] = u0_ref[:]

        if record_knots:
            # the last accept's DMA (or the init DMA) is still in flight
            dma_to(u_ref, knot_us_ref, 0, sems.at[0]).wait()
            if record_ks:
                dma_to(k1_ref, knot_ks_ref, 0, sems.at[1]).wait()

        stats_i_ref[0] = nacc
        stats_i_ref[1] = nrej
        stats_i_ref[2] = done.astype(jnp.int32)
        stats_i_ref[3] = natt
        stats_f_ref[0] = t_f
        stats_f_ref[1] = res_t

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(precision, rtol, atol, B, F, F_logical, H_pad, tb, n_save,
                max_steps, n_dense, use_reservoir, stride, n_ckpt,
                record_ks, vmem_limit, interpret, family=("tdmlp",)):
    record_knots = n_dense > 0
    record_ckpts = n_ckpt > 0
    kernel = _make_kernel(
        precision, rtol, atol, B, F, F_logical, tb, n_save, max_steps,
        n_dense, use_reservoir, stride, n_ckpt, record_ks, family,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)  # noqa: E731

    in_specs = [smem(), smem()]
    if use_reservoir:
        in_specs.append(smem())
    # u0, k1_0, then the family's weight operands
    in_specs += [vmem()] * (2 + family_n_weights(family))

    out_specs = [vmem(), vmem(), smem(), smem()]
    out_shape = [
        jax.ShapeDtypeStruct((B, F), jnp.float32),
        jax.ShapeDtypeStruct((n_save, B, F), jnp.float32),
        jax.ShapeDtypeStruct((4,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.float32),
    ]
    if use_reservoir:
        out_specs.append(vmem())
        out_shape.append(jax.ShapeDtypeStruct((B, F), jnp.float32))
    if record_knots:
        out_specs += [smem(), any_()]
        out_shape += [
            jax.ShapeDtypeStruct((n_dense,), jnp.float32),
            jax.ShapeDtypeStruct((n_dense * B, F), jnp.float32),
        ]
        if record_ks:
            out_specs.append(any_())
            out_shape.append(
                jax.ShapeDtypeStruct((n_dense * B, F), jnp.float32)
            )
    if record_ckpts:
        out_specs += [smem(), smem(), smem(), any_(), any_()]
        out_shape += [
            jax.ShapeDtypeStruct((n_ckpt,), jnp.float32),
            jax.ShapeDtypeStruct((n_ckpt,), jnp.float32),
            jax.ShapeDtypeStruct((n_ckpt,), jnp.float32),
            jax.ShapeDtypeStruct((n_ckpt * B, F), jnp.float32),
            jax.ShapeDtypeStruct((n_ckpt * B, F), jnp.float32),
        ]
    scratch = [
        pltpu.VMEM((B, F), jnp.float32),
        pltpu.VMEM((B, F), jnp.float32),
        pltpu.VMEM((B, F), jnp.float32),
    ]
    if record_knots or record_ckpts:
        scratch.append(pltpu.SemaphoreType.DMA((4,)))

    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # sized to the plan estimate + margin: the limit value feeds
            # Mosaic's buffering decisions, and an over-large limit
            # measured ~10% slower end-to-end
            vmem_limit_bytes=vmem_limit,
            has_side_effects=True,
        ),
        interpret=interpret,
    )


def persistent_tsit5_solve(
    params,
    u0: jnp.ndarray,
    tspan,
    *,
    rtol: float,
    atol: float,
    saveat_arr: jnp.ndarray,
    max_steps: int,
    record_knots: bool = False,
    knot_dense_cap: Optional[int] = None,
    knot_stride: int = 1,
    record_ks: bool = True,
    reservoir_key: Optional[jnp.ndarray] = None,
    precision=None,
    dt0=None,
    plan_only: bool = False,
):
    """Run the whole adaptive solve in one Pallas program.

    Returns a dict of raw outputs, or ``None`` when the configuration does
    not fit the VMEM plan (caller falls back to the XLA loop). The initial
    derivative and HNW initial-dt heuristic run outside the kernel (2 NFE,
    once per solve — identical formulas to ``ode/solve.py``).

    ``knot_stride = W > 1`` additionally records every W-th accepted state
    as a replayable checkpoint (two-level scheme — see module docstring).
    ``record_ks=False`` skips the dense ``knot_ks`` stream (the persistent
    backward sweep recomputes k1 in-kernel and never reads it — halves the
    per-accept DMA traffic). ``plan_only=True`` answers feasibility
    without building or running anything.
    """
    if u0.ndim != 2 or u0.dtype != jnp.float32:
        return None
    B, F = u0.shape
    w1, b1, w1t, w2, b2, w2t = _split_params(params, pad_hidden=True)
    H_pad = w1.shape[1]
    n_save = int(saveat_arr.shape[0])
    use_reservoir = reservoir_key is not None
    # pad the feature width to the 128 lane (exact zeros — see kernel
    # docstring); knot buffers are returned PADDED (the persistent sweep
    # consumes them as-is; slicing a ~100 MB HBM buffer would be a copy)
    F_pad = -(-F // 128) * 128
    tb, _ = _plan(B, F_pad, H_pad, n_save, use_reservoir, record_knots)
    if tb is None:
        return None
    if plan_only:
        return True

    t0 = jnp.asarray(tspan[0], jnp.float32)
    t_end = jnp.asarray(tspan[1], jnp.float32)

    from .fused_mlp import get_fused_tdmlp

    fused = get_fused_tdmlp(precision)

    def fn(u, t, p, st):
        return fused(p, u, t), st

    k1_0 = fused(params, u0, t0)
    nfe0 = jnp.asarray(1, jnp.int32)
    if dt0 is None:
        dt_init, extra = initial_step_size(
            fn, u0, t0, params, None, order=5, rtol=rtol, atol=atol, f0=k1_0
        )
        nfe0 = nfe0 + extra
    else:
        dt_init = jnp.asarray(dt0, jnp.float32)
    dt_init = lax.stop_gradient(jnp.minimum(dt_init, t_end - t0))

    n_dense = 0
    if record_knots:
        cap = max_steps if knot_dense_cap is None else min(
            max_steps, int(knot_dense_cap)
        )
        n_dense = cap + 1
    stride = max(1, int(knot_stride))
    n_ckpt = (int(max_steps) // stride + 1) if (
        record_knots and stride > 1
    ) else 0
    use_ks = bool(record_ks) and record_knots

    _, vmem_est = _plan(B, F_pad, H_pad, n_save, use_reservoir, record_knots)
    call = _build_call(
        precision, float(rtol), float(atol), B, F_pad, F, H_pad, tb,
        n_save, int(max_steps), n_dense, use_reservoir, stride, n_ckpt,
        use_ks, int(vmem_est) + 6 * 1024 * 1024, _interpret(),
    )

    if F_pad != F:
        fpad = lambda a: jnp.pad(a, ((0, 0), (0, F_pad - F)))  # noqa: E731
        u0_in, k1_in = fpad(u0), fpad(k1_0)
        w1_in = jnp.pad(w1, ((0, F_pad - F), (0, 0)))
        w2_in, b2_in, w2t_in = fpad(w2), fpad(b2), fpad(w2t)
    else:
        u0_in, k1_in = u0, k1_0
        w1_in, w2_in, b2_in, w2t_in = w1, w2, b2, w2t

    sc = jnp.stack([t0, t_end, dt_init.astype(jnp.float32)])
    args = [sc, jnp.asarray(saveat_arr, jnp.float32)]
    if use_reservoir:
        args.append(
            jax.random.uniform(reservoir_key, (int(max_steps),), jnp.float32)
        )
    args += [u0_in, k1_in, w1_in, b1, w1t, w2_in, b2_in, w2t_in]

    outs = call(*args)
    i = 0
    y_final = outs[i][:, :F]; i += 1
    ys = outs[i][:, :, :F]; i += 1
    stats_i = outs[i]; i += 1
    stats_f = outs[i]; i += 1
    res_u = None
    if use_reservoir:
        res_u = outs[i][:, :F]; i += 1
    knot_ts = knot_us = knot_ks = None
    ckpt_ts = ckpt_us = ckpt_ks = None
    ckpt_dts = ckpt_qolds = None
    if record_knots:
        # knots stay PADDED (n_dense, B, F_pad) — consumed by the
        # persistent sweep, never by the XLA fallback (the caller gates
        # record_knots on sweep feasibility)
        knot_ts = outs[i]; i += 1
        knot_us = outs[i].reshape(n_dense, B, F_pad); i += 1
        if use_ks:
            knot_ks = outs[i].reshape(n_dense, B, F_pad); i += 1
    if n_ckpt > 0:
        ckpt_ts = outs[i]; i += 1
        ckpt_dts = outs[i]; i += 1
        ckpt_qolds = outs[i]; i += 1
        ckpt_us = outs[i].reshape(n_ckpt, B, F_pad); i += 1
        ckpt_ks = outs[i].reshape(n_ckpt, B, F_pad); i += 1

    return dict(
        y_final=y_final,
        ys=ys,
        naccept=stats_i[0],
        nreject=stats_i[1],
        success=stats_i[2].astype(jnp.bool_),
        nfe=nfe0 + 6 * stats_i[3],
        t_final=stats_f[0],
        reservoir_t=stats_f[1] if use_reservoir else None,
        reservoir_u=res_u,
        knot_ts=knot_ts,
        knot_us=knot_us,
        knot_ks=knot_ks,
        ckpt_ts=ckpt_ts,
        ckpt_us=ckpt_us,
        ckpt_ks=ckpt_ks,
        ckpt_dts=ckpt_dts,
        ckpt_qolds=ckpt_qolds,
        forward_tile=tb,
    )


# ---------------------------------------------------------------------------
# the autonomous Dense-chain family (latent-ODE gen dynamics,
# construct.jl:241-245: Chain(x->tanh, Dense...tanh x8))


def match_dense_chain(model):
    """Match ``Chain([Lambda(tanh)], Dense(tanh|identity)...)`` with
    state-preserving width (d0 == dL). Returns ``(spec, layer_keys)`` —
    the hashable kernel family spec and the chain's Dense param keys in
    order — or ``None``."""
    from ...nn.basic import _ACTIVATIONS, Chain, Dense, Lambda

    if not isinstance(model, Chain):
        return None
    items = list(model.layers.items())
    lead = False
    if items and isinstance(items[0][1], Lambda):
        if items[0][1].fn is not jnp.tanh:
            return None
        lead = True
        items = items[1:]
    if not items or not all(isinstance(l, Dense) for _, l in items):
        return None
    ident = (_ACTIVATIONS[None], _ACTIVATIONS["identity"])
    dims = [items[0][1].in_dim]
    acts = []
    keys = []
    for key, l in items:
        if not l.use_bias or l.in_dim != dims[-1]:
            return None
        if l.activation is jnp.tanh:
            acts.append(True)
        elif any(l.activation is fn for fn in ident):
            acts.append(False)
        else:
            return None
        dims.append(l.out_dim)
        keys.append(key)
    if dims[0] != dims[-1]:
        return None
    pads = tuple(-(-d // 128) * 128 for d in dims)
    spec = ("chain", pads, tuple(acts), lead)
    return spec, tuple(keys), tuple(dims)


def family_weight_bytes(spec) -> int:
    """Exact VMEM bytes of the padded weight operands ((1, P) rows
    rounded up to 8 sublanes) — ``_chain_plan``'s resident-weight term.
    Computed from the spec's per-layer pads rather than a
    count-of-operands estimate: the pfode family has 3 operands/layer
    (wx, wt, b) and an n_weights//2 · max_pad² estimate would bill its
    two rows as a half matrix (~1.5× overcount), declining servable
    large score nets."""
    kind, pads = spec[0], spec[1]
    n_rows = {"chain": 1, "pfode": 2}[kind]  # (1, P) operands per layer
    total = 0
    for i in range(len(pads) - 1):
        total += pads[i] * pads[i + 1] + n_rows * 8 * pads[i + 1]
    return 4 * total


def _chain_plan(B: int, F_pad: int, max_pad: int, weight_bytes: int,
                n_save: int, use_reservoir: bool):
    """Batch tile under the VMEM budget for the chain family.

    Whole-batch FIRST: the chain state is narrow (F_pad typically 128),
    so each matmul is tiny and serial-latency-bound — tiling multiplies
    the serial matmul count for no VMEM benefit (measured 0.62× vs the
    XLA loop at tb=256 on the PhysioNet config; the TD-MLP's
    overlap-favoring small tiles don't transfer)."""
    resident = (6 + n_save + (1 if use_reservoir else 0)) * B * F_pad * 4
    resident += weight_bytes
    for tb in (B, 256, 128, 64, 32, 16, 8):
        if tb > B or B % tb:
            continue
        temps = 11 * tb * F_pad * 4 + 3 * tb * max_pad * 4
        if resident + temps <= _VMEM_BUDGET:
            return tb, resident + temps
    return None, None


def chain_eval_pure(params, keys, acts, lead, x, precision=None):
    """Unpadded pure-JAX twin of the in-kernel chain eval (used for k1_0,
    the HNW dt heuristic, and tests)."""
    a = jnp.tanh(x) if lead else x
    for key, act in zip(keys, acts):
        z = jnp.dot(
            a, params[key]["w"], preferred_element_type=jnp.float32,
            precision=precision,
        ) + params[key]["b"]
        a = jnp.tanh(z) if act else z
    return a


def pack_chain_weights(params, spec, keys, dims):
    """Pad the chain's Dense weights to the spec's lane-aligned widths."""
    _, pads, _, _ = spec
    ops = []
    for i, key in enumerate(keys):
        w = params[key]["w"]
        b = params[key]["b"]
        ops.append(jnp.pad(
            w, ((0, pads[i] - dims[i]), (0, pads[i + 1] - dims[i + 1]))
        ))
        ops.append(
            jnp.pad(b, (0, pads[i + 1] - dims[i + 1])).reshape(1, -1)
        )
    return ops


def persistent_chain_solve(
    params,
    chain_info,
    u0: jnp.ndarray,
    tspan,
    *,
    rtol: float,
    atol: float,
    saveat_arr: jnp.ndarray,
    max_steps: int,
    record_knots: bool = False,
    knot_dense_cap: Optional[int] = None,
    knot_stride: int = 1,
    record_ks: bool = True,
    reservoir_key: Optional[jnp.ndarray] = None,
    precision=None,
    dt0=None,
    plan_only: bool = False,
):
    """``persistent_tsit5_solve`` for the autonomous Dense-chain family.
    ``chain_info = (spec, layer_keys, dims)`` from ``match_dense_chain``.
    Same return/decline contract as the TD-MLP wrapper."""
    if u0.ndim != 2 or u0.dtype != jnp.float32 or u0.shape[0] % 8:
        return None
    spec, keys, dims = chain_info
    B, F = u0.shape
    if F != dims[0]:
        return None
    n_save = int(saveat_arr.shape[0])
    use_reservoir = reservoir_key is not None
    F_pad = spec[1][0]
    max_pad = max(spec[1])
    tb, vmem_est = _chain_plan(
        B, F_pad, max_pad, family_weight_bytes(spec), n_save, use_reservoir
    )
    if tb is None:
        return None
    if plan_only:
        return True

    t0 = jnp.asarray(tspan[0], jnp.float32)
    t_end = jnp.asarray(tspan[1], jnp.float32)
    _, _, acts, lead = spec

    def fn(u, t, p, st):
        return chain_eval_pure(p, keys, acts, lead, u, precision), st

    k1_0 = chain_eval_pure(params, keys, acts, lead, u0, precision)
    nfe0 = jnp.asarray(1, jnp.int32)
    if dt0 is None:
        dt_init, extra = initial_step_size(
            fn, u0, t0, params, None, order=5, rtol=rtol, atol=atol,
            f0=k1_0,
        )
        nfe0 = nfe0 + extra
    else:
        dt_init = jnp.asarray(dt0, jnp.float32)
    dt_init = lax.stop_gradient(jnp.minimum(dt_init, t_end - t0))

    n_dense = 0
    if record_knots:
        cap = max_steps if knot_dense_cap is None else min(
            max_steps, int(knot_dense_cap)
        )
        n_dense = cap + 1
    stride = max(1, int(knot_stride))
    n_ckpt = (int(max_steps) // stride + 1) if (
        record_knots and stride > 1
    ) else 0
    use_ks = bool(record_ks) and record_knots

    call = _build_call(
        precision, float(rtol), float(atol), B, F_pad, F, 0, tb,
        n_save, int(max_steps), n_dense, use_reservoir, stride, n_ckpt,
        use_ks, int(vmem_est) + 6 * 1024 * 1024, _interpret(), spec,
    )

    if F_pad != F:
        fpad = lambda a: jnp.pad(a, ((0, 0), (0, F_pad - F)))  # noqa: E731
        u0_in, k1_in = fpad(u0), fpad(k1_0)
    else:
        u0_in, k1_in = u0, k1_0
    weights = pack_chain_weights(params, spec, keys, dims)

    sc = jnp.stack([t0, t_end, dt_init.astype(jnp.float32)])
    args = [sc, jnp.asarray(saveat_arr, jnp.float32)]
    if use_reservoir:
        args.append(
            jax.random.uniform(reservoir_key, (int(max_steps),), jnp.float32)
        )
    args += [u0_in, k1_in] + weights

    outs = call(*args)
    i = 0
    y_final = outs[i][:, :F]; i += 1
    ys = outs[i][:, :, :F]; i += 1
    stats_i = outs[i]; i += 1
    stats_f = outs[i]; i += 1
    res_u = None
    if use_reservoir:
        res_u = outs[i][:, :F]; i += 1
    knot_ts = knot_us = knot_ks = None
    ckpt_ts = ckpt_us = ckpt_ks = None
    ckpt_dts = ckpt_qolds = None
    if record_knots:
        knot_ts = outs[i]; i += 1
        knot_us = outs[i].reshape(n_dense, B, F_pad); i += 1
        if use_ks:
            knot_ks = outs[i].reshape(n_dense, B, F_pad); i += 1
    if n_ckpt > 0:
        ckpt_ts = outs[i]; i += 1
        ckpt_dts = outs[i]; i += 1
        ckpt_qolds = outs[i]; i += 1
        ckpt_us = outs[i].reshape(n_ckpt, B, F_pad); i += 1
        ckpt_ks = outs[i].reshape(n_ckpt, B, F_pad); i += 1

    return dict(
        y_final=y_final,
        ys=ys,
        naccept=stats_i[0],
        nreject=stats_i[1],
        success=stats_i[2].astype(jnp.bool_),
        nfe=nfe0 + 6 * stats_i[3],
        t_final=stats_f[0],
        reservoir_t=stats_f[1] if use_reservoir else None,
        reservoir_u=res_u,
        knot_ts=knot_ts,
        knot_us=knot_us,
        knot_ks=knot_ks,
        ckpt_ts=ckpt_ts,
        ckpt_us=ckpt_us,
        ckpt_ks=ckpt_ks,
        ckpt_dts=ckpt_dts,
        ckpt_qolds=ckpt_qolds,
        forward_tile=tb,
    )


# ---------------------------------------------------------------------------
# the probability-flow VP-SDE sampling family (models/score_sde.py::
# sample_probability_flow — the deterministic counterpart of the 'vpsde'
# SDE kernel family; BASELINE config 5)


def persistent_pf_solve(
    params,
    chain_info,
    u0: jnp.ndarray,
    tspan,
    *,
    rtol: float,
    atol: float,
    saveat_arr: jnp.ndarray,
    max_steps: int,
    beta_min: float,
    beta_max: float,
    t1: float,
    precision=None,
    dt0=None,
    plan_only: bool = False,
):
    """``persistent_tsit5_solve`` for the probability-flow VP-SDE sampling
    family: the whole adaptive Tsit5 solve of
    du/dτ = ½β(t)·(u + s_θ(u, t)), t = t1 − τ, in one TPU program.
    ``chain_info = (dims, acts, keys)`` from
    ``fused_sde_solve.match_td_score_chain`` (the score net is the SAME
    TDChain-of-Dense family the SDE sampler kernel serves). Sampling is
    never differentiated nor reservoir-sampled, so there is no knot or
    reservoir machinery. Returns the output dict or None when the
    configuration isn't servable."""
    from .fused_sde_solve import td_score_eval_pure

    if u0.ndim != 2 or u0.dtype != jnp.float32 or u0.shape[0] % 8:
        return None
    dims, acts, keys = chain_info
    B, F = u0.shape
    if F != dims[0]:
        return None
    n_save = int(saveat_arr.shape[0])
    pads = tuple(-(-d // 128) * 128 for d in dims)
    spec = ("pfode", pads, tuple(acts), float(beta_min), float(beta_max),
            float(t1))
    F_pad = pads[0]
    max_pad = max(pads)
    tb, vmem_est = _chain_plan(
        B, F_pad, max_pad, family_weight_bytes(spec), n_save, False
    )
    if tb is None:
        return None
    if plan_only:
        return True

    t0 = jnp.asarray(tspan[0], jnp.float32)
    t_end = jnp.asarray(tspan[1], jnp.float32)
    d_beta = float(beta_max) - float(beta_min)

    def pf_eval(u, tau):
        t = float(t1) - tau
        b = float(beta_min) + t * d_beta
        s = td_score_eval_pure(params, keys, acts, u, t, precision)
        return 0.5 * b * (u + s)

    def fn(u, tau, p, st):
        return pf_eval(u, tau), st

    k1_0 = pf_eval(u0, t0)
    nfe0 = jnp.asarray(1, jnp.int32)
    if dt0 is None:
        dt_init, extra = initial_step_size(
            fn, u0, t0, params, None, order=5, rtol=rtol, atol=atol,
            f0=k1_0,
        )
        nfe0 = nfe0 + extra
    else:
        dt_init = jnp.asarray(dt0, jnp.float32)
    dt_init = lax.stop_gradient(jnp.minimum(dt_init, t_end - t0))

    call = _build_call(
        precision, float(rtol), float(atol), B, F_pad, F, 0, tb,
        n_save, int(max_steps), 0, False, 1, 0, False,
        int(vmem_est) + 6 * 1024 * 1024, _interpret(), spec,
    )

    if F_pad != F:
        fpad = lambda a: jnp.pad(a, ((0, 0), (0, F_pad - F)))  # noqa: E731
        u0_in, k1_in = fpad(u0), fpad(k1_0)
    else:
        u0_in, k1_in = u0, k1_0
    from .fused_sde_solve import pack_td_score_weights

    weights = pack_td_score_weights(params, keys, dims, pads)

    sc = jnp.stack([t0, t_end, dt_init.astype(jnp.float32)])
    args = [sc, jnp.asarray(saveat_arr, jnp.float32), u0_in, k1_in]
    args += weights

    y_final, ys, stats_i, stats_f = call(*args)
    return dict(
        y_final=y_final[:, :F],
        ys=ys[:, :, :F],
        naccept=stats_i[0],
        nreject=stats_i[1],
        success=stats_i[2].astype(jnp.bool_),
        nfe=nfe0 + 6 * stats_i[3],
        t_final=stats_f[0],
        reservoir_t=None,
        reservoir_u=None,
        knot_ts=None,
        knot_us=None,
        knot_ks=None,
        ckpt_ts=None,
        ckpt_us=None,
        ckpt_ks=None,
        ckpt_dts=None,
        ckpt_qolds=None,
        forward_tile=tb,
    )
