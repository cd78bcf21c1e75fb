"""Persistent-loop Pallas kernel: the ENTIRE adaptive SRI/SOSRI SDE solve
in one TPU program — including the Brownian noise.

The XLA SDE loop (``sde/solve.py``) pays, per attempt: a 24-level virtual
Brownian tree descent (each level a separate threefry + normal dispatch),
8 tiny NN evaluations (4 drift MLP + 4 diffusion), the shared-batch error
norm, and the while-loop carrier traffic — at the MNIST-SDE state width
(32) every one of those is dispatch/HBM-latency-bound, not compute-bound.
This kernel keeps the whole solve on-chip:

- **In-kernel virtual Brownian tree** via the TPU hardware PRNG
  (``pltpu.prng_seed`` / ``prng_random_bits``), mirroring
  ``sde/brownian.py``'s bridge descent: per-node standard normals come
  from an inverse-CDF transform (Acklam's rational approximation — only
  mul/add/log/sqrt, all Mosaic-legal) of counter-seeded uniform bits.
  Same dyadic-bridge law and rejection-consistency property (a node's
  noise is a pure function of (seed, node)); a DIFFERENT realization than
  the XLA path's threefry draws — statistical tests assert equivalence
  (tests/test_fused_sde.py).
- **Recorded noise ⇒ exact gradients with no bitwise machinery**: on
  accept, the step's ``(u, dW, dZ)`` stream to HBM knot buffers; the
  stored adjoint (``sde/stored_adjoint.py``) transposes steps using the
  RECORDED increments, so gradients are exact for the realized trajectory
  regardless of which program generated the noise. (This is why the SDE
  family needs none of the ODE path's replay-bitwise machinery.)
- Whole-batch stages (B×128 padded tiles fit VMEM many times over at the
  reference's 32-wide SDE state), in-kernel I-controller (same constants
  as ``sde/solve.py``: gamma 0.9, qmin 0.2, qmax 1.2, beta1 = 1/(order+1)),
  speculative linear dense output, SMEM reservoir sampling — all as in
  the ODE twin (``fused_solve.py``).

Reference parity: replaces StochasticDiffEq's integrator loop for the
``NeuralDSDE`` MLP family (SURVEY.md §2d; ``src/layers/neural_sde.jl``,
``experiments/src/construct.jl:202-210``); solver semantics match
``sde/solve.py`` / ``sde/step.py:35-96``.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ode.controller import PIController
from ...ops.residuals import internal_norm
from ...sde.tableaus import get_sri_tableau
from .fused_solve import _propose


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_BUDGET = 88 * 1024 * 1024
_MAX_NSAVE = 4


def _plan(B: int, F: int, n_save: int, w_bytes: int, h_pad: int):
    """Whole-batch residency check (no tiling: the SDE family's state is
    narrow). ~14 (B,F) values + 4 (2B,F) noise buffers + stage temps.
    Returns the byte estimate when servable (it is also threaded into
    Mosaic's vmem_limit_bytes — a hardcoded limit below the budget made
    plan-approved configs fail at compile instead of declining), else
    None."""
    need = (14 + n_save) * B * F * 4 + 4 * 2 * B * F * 4
    need += 6 * B * h_pad * 4                       # hidden temporaries
    need += w_bytes
    return need if need <= _VMEM_BUDGET else None


def _hnw_dt_init(u0, f0, rtol, atol, t0, t_end, dt0):
    """Shared initial-dt heuristic (identical formulas to
    ``sde/solve.py``) — ONE copy so every kernel entry point stays in
    lockstep with the XLA loop."""
    if dt0 is None:
        sc = atol + jnp.abs(u0) * rtol
        d0 = internal_norm(u0 / sc)
        d1 = internal_norm(f0 / sc)
        dt_init = jnp.where(
            (d0 < 1e-5) | (d1 < 1e-5), 1e-6,
            0.01 * d0 / jnp.where(d1 == 0, 1.0, d1),
        )
        dt_init = jnp.minimum(dt_init, (t_end - t0) / 2)
    else:
        dt_init = jnp.asarray(dt0, jnp.float32)
    return lax.stop_gradient(jnp.minimum(dt_init, t_end - t0))


def _derive_seed(noise_key):
    """Kernel PRNG seed from the solve's ``noise_key``. The
    ``fold_in(…, 7)`` and golden-ratio mix are part of the
    rejection-consistent noise CONTRACT shared by every persistent-SDE
    entry point — edit here only."""
    kd = jax.random.key_data(jax.random.fold_in(noise_key, 7))
    return (kd[0].astype(jnp.int32)
            ^ (kd[1].astype(jnp.int32) * jnp.int32(-1640531527)))


# ---------------------------------------------------------------------------
# dynamics families (hashable specs — they feed the _build_call lru_cache,
# mirroring ops/pallas/fused_solve.py's ODE family registry):
#   ("mlp", H_pad)
#       the NeuralDSDE construct.jl:202-210 family — AUTONOMOUS 2-layer
#       tanh drift MLP + affine diffusion. 6 weight operands:
#       w1 (F,H) b1 (1,H) w2 (H,F) b2 (1,F) wd (F,F) bd (1,F).
#   ("vpsde", pads, acts, beta_min, beta_max, t1)
#       the reverse-time VP-SDE sampling family (models/score_sde.py) in
#       the τ = t1 − t clock: with t = t1 − τ and β(t) = βmin + t·Δβ,
#         drift(x, τ)     = ½β(t)·x + β(t)·s_θ(x, t)
#         diffusion(x, τ) = √β(t) · lane-mask
#       s_θ = TDChain-of-Dense score net: per layer i the operands are
#       wx_i (P_{i-1},P_i), wt_i (1,P_i) — the time row of the reference's
#       (d+1)->h TD weight — and b_i (1,P_i); 3L weight operands total.
#       The lane mask keeps the state-independent diffusion out of the
#       padded lanes (otherwise the padded columns random-walk and corrupt
#       the shared-batch error norm).


def sde_family_n_weights(spec) -> int:
    if spec[0] == "mlp":
        return 6
    if spec[0] == "vpsde":
        return 3 * (len(spec[1]) - 1)
    raise ValueError(f"unknown SDE dynamics family {spec[0]!r}")


def _family_make_fg(spec, wrefs, precision, F_pad, F_logical):
    """Build the in-kernel ``f(x, tau) -> drift`` and ``g(x, tau) ->
    diffusion`` evaluations from the weight operand refs. ``tau`` is the
    solver clock (stage time); autonomous families ignore it."""
    if spec[0] == "mlp":
        w1, b1, w2, b2, wd, bd = wrefs

        def f(x, tau):
            h = jnp.tanh(
                jnp.dot(x, w1[:], preferred_element_type=jnp.float32,
                        precision=precision) + b1[:]
            )
            return jnp.dot(
                h, w2[:], preferred_element_type=jnp.float32,
                precision=precision,
            ) + b2[:]

        def g(x, tau):
            return jnp.dot(
                x, wd[:], preferred_element_type=jnp.float32,
                precision=precision,
            ) + bd[:]

        return f, g
    if spec[0] == "vpsde":
        _, pads, acts, beta_min, beta_max, t1 = spec
        L = len(pads) - 1
        d_beta = beta_max - beta_min
        mask = (
            lax.broadcasted_iota(jnp.int32, (1, F_pad), 1) < F_logical
        ).astype(jnp.float32)

        def beta(tau):
            return beta_min + (t1 - tau) * d_beta

        def f(x, tau):
            t = t1 - tau
            b = beta(tau)
            a = x
            for i in range(L):
                z = jnp.dot(
                    a, wrefs[3 * i][:],
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ) + t * wrefs[3 * i + 1][:] + wrefs[3 * i + 2][:]
                a = jnp.tanh(z) if acts[i] else z
            return (0.5 * b) * x + b * a

        def g(x, tau):
            return jnp.sqrt(beta(tau)) * mask

        return f, g
    raise ValueError(f"unknown SDE dynamics family {spec[0]!r}")


# Acklam's inverse normal CDF rational approximation (|eps| < 1.15e-9):
# only mul/add/div/log/sqrt — Mosaic-legal, branchless via selects.
_ICDF_A = (-3.969683028665376e+01, 2.209460984245205e+02,
           -2.759285104469687e+02, 1.383577518672690e+02,
           -3.066479806614716e+01, 2.506628277459239e+00)
_ICDF_B = (-5.447609879822406e+01, 1.615858368580409e+02,
           -1.556989798598866e+02, 6.680131188771972e+01,
           -1.328068155288572e+01)
_ICDF_C = (-7.784894002430293e-03, -3.223964580411365e-01,
           -2.400758277161838e+00, -2.549732539343734e+00,
           4.374664141464968e+00, 2.938163982698783e+00)
_ICDF_D = (7.784695709041462e-03, 3.224671290700398e-01,
           2.445134137142996e+00, 3.754408661907416e+00)
_P_LOW = 0.02425


def _norm_icdf(p):
    """Standard-normal quantile of p ∈ (0,1), elementwise."""
    a, b, c, d = _ICDF_A, _ICDF_B, _ICDF_C, _ICDF_D
    # central region
    q = p - 0.5
    r = q * q
    num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
    den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    x_c = num * q / den

    def tail(pt):
        # guard must be a NORMAL f32 (1e-38 is denormal — flushed to zero
        # on TPU, turning the guard into log(0))
        qt = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(pt, 1e-30)))
        nu = ((((c[0] * qt + c[1]) * qt + c[2]) * qt + c[3]) * qt + c[4]) \
            * qt + c[5]
        de = (((d[0] * qt + d[1]) * qt + d[2]) * qt + d[3]) * qt + 1.0
        return nu / de

    # one tail evaluation on min(p, 1-p), sign-flipped for the upper tail
    # — bit-identical to evaluating tail(p) and -tail(1-p) separately, at
    # half the (log+sqrt+rational, all-lanes) tail cost. The descent calls
    # this 24x per attempt on (2B, F_pad) lanes, so it is the SDE solve
    # kernel's hottest scalar code.
    pt = jnp.minimum(p, 1.0 - p)
    x_t = jnp.where(p < 0.5, 1.0, -1.0) * tail(pt)
    return jnp.where(pt < _P_LOW, x_t, x_c)


def _bits_to_uniform(bits):
    """i32 random bits → f32 uniform in (0,1): 24-bit mantissa, half-ulp
    centered. Mosaic has no u32→f32 cast, so bits arrive as int32: the
    arithmetic >> 8 then & 0xFFFFFF equals the logical shift's low 24
    bits (sign-extension lands only in bits 24..31, which the mask
    kills), and int32→f32 is supported.

    The result is CLAMPED to [1e-7, 1-1e-7]: the raw maximum 1 − 2⁻²⁵
    ROUNDS TO EXACTLY 1.0f (halfway, round-to-even), and the ICDF's tail
    guard (1e-38) is a denormal the TPU flushes to zero — one such draw
    produced log(0) → NaN and poisoned an entire dyadic subtree of the
    Brownian tree (measured round 3: the flagship SDE solve froze at
    τ = 15/64). The clamp truncates the normal at ~5.2σ (P ≈ 1e-7 per
    draw — immaterial against solver tolerances)."""
    u = ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (2.0 ** -24) \
        + 2.0 ** -25
    return jnp.clip(u, 1e-7, 1.0 - 1e-7)


def _make_kernel(precision, rtol, atol, delta, B, F, F_logical, family,
                 n_save, max_steps, n_knot, depth, use_reservoir, tab_name,
                 order, interpret):
    T = get_sri_tableau(tab_name)
    ctrl = PIController(
        gamma=0.9, qmin=0.2, qmax=1.2, beta1=1.0 / (order + 1.0), beta2=0.0,
    )
    record = n_knot > 0
    inv_n = 1.0 / float(B * F_logical)
    sqrt3 = math.sqrt(3.0)

    def kernel(*refs):
        it = iter(refs)
        sc_f = next(it)       # SMEM (4,): t0, t_end, dt0, T_span
        sc_i = next(it)       # SMEM (2,) i32: [seed, reserved=0] — W and
        #                       Z share one seed (independence comes from
        #                       the stacked (2B, F) draw tile); slot 1 is
        #                       an unused spare kept for layout stability
        saveat_ref = next(it)  # SMEM (n_save,)
        rand_ref = next(it) if use_reservoir else None
        u0_ref = next(it)
        wrefs = [next(it) for _ in range(sde_family_n_weights(family))]
        # outputs
        u_ref = next(it)              # (B, F) = y_final / working state
        ys_ref = next(it)             # (n_save, B, F)
        stats_i_ref = next(it)        # SMEM (4,) i32
        stats_f_ref = next(it)        # SMEM (2,) f32
        res_u_ref = next(it) if use_reservoir else None
        if record:
            knot_ts_ref = next(it)    # SMEM (n_knot,)
            knot_us_ref = next(it)    # ANY (n_knot·B, F)
            knot_dws_ref = next(it)   # ANY ((n_knot-1)·B, F)
            knot_dzs_ref = next(it)   # ANY ((n_knot-1)·B, F)
        # scratch
        wz0_ref = next(it)            # VMEM (2B, F): W/Z at current t
        wz1_ref = next(it)            # VMEM (2B, F): W/Z at t + dt
        wa_ref = next(it)             # VMEM (2B, F): bridge lower endpoint
        wb_ref = next(it)             # VMEM (2B, F): bridge upper endpoint
        tmp2_ref = next(it)           # VMEM (2B, F): bridge midpoint / dWZ
        sems = next(it) if record else None

        t0 = sc_f[0]
        t_end = sc_f[1]
        dt0 = sc_f[2]
        t_span = sc_f[3]
        seed = sc_i[0]

        f_drift, g_diff = _family_make_fg(
            family, wrefs, precision, F, F_logical
        )

        def draw_eps(node):
            """(2B, F) standard normals, a pure function of (seed, node) —
            the rejection-consistency property of the Brownian tree.
            Interpret mode (CPU tests) uses threefry with the same
            (seed, node) counter contract — the TPU hardware PRNG has no
            CPU lowering; the noise LAW and determinism are identical,
            only the realization differs (as it already does vs the XLA
            path's tree)."""
            s = seed ^ (node * jnp.int32(-1640531527))
            if interpret:
                k = jax.random.key(s.astype(jnp.uint32))
                return jax.random.normal(k, (2 * B, F), jnp.float32)
            pltpu.prng_seed(s)
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((2 * B, F)), jnp.int32
            )
            return _norm_icdf(_bits_to_uniform(bits))

        def wz_eval(tau, out_ref):
            """Bridge descent: W/Z at normalized time τ → out_ref.
            Mirrors sde/brownian.py::_eval (stacked W/Z channels)."""
            wa_ref[:] = jnp.zeros_like(wa_ref)
            wb_ref[:] = draw_eps(jnp.int32(1)) * jnp.sqrt(t_span)

            def lvl(_, carry):
                a, b, node = carry
                m = (a + b) * 0.5
                node2 = node * 2
                eps = draw_eps(node2 + 2)
                tmp2_ref[:] = (wa_ref[:] + wb_ref[:]) * 0.5 + eps * jnp.sqrt(
                    (b - a) * 0.25 * t_span
                )
                go_right = tau >= m

                @pl.when(go_right)
                def _():
                    wa_ref[:] = tmp2_ref[:]

                @pl.when(jnp.logical_not(go_right))
                def _():
                    wb_ref[:] = tmp2_ref[:]

                return (
                    jnp.where(go_right, m, a),
                    jnp.where(go_right, b, m),
                    node2 + go_right.astype(jnp.int32),
                )

            a, b, _ = lax.fori_loop(
                0, depth, lvl,
                (jnp.float32(0.0), jnp.float32(1.0), jnp.int32(1)),
            )
            frac = jnp.where(b > a, (tau - a) / (b - a), 0.0)
            out_ref[:] = wa_ref[:] + (wb_ref[:] - wa_ref[:]) * frac

        def dma_to(vm_ref, hbm_ref, row_off, rows, sem):
            return pltpu.make_async_copy(
                vm_ref, hbm_ref.at[pl.ds(row_off, rows), :], sem
            )

        # ---- init
        u_ref[:] = u0_ref[:]
        wz0_ref[:] = jnp.zeros_like(wz0_ref)  # W(t0) = 0
        for s_idx in range(n_save):
            ys_ref[s_idx] = u0_ref[:]
        if use_reservoir:
            res_u_ref[:] = u0_ref[:]
        if record:
            def init_ts(i, c):
                knot_ts_ref[i] = t_end
                return c

            lax.fori_loop(1, n_knot, init_ts, 0)
            knot_ts_ref[0] = t0
            # left in flight — the first accept (or kernel end) waits on it
            # before overwriting u_ref (single-slot pipelining, as in the
            # ODE twin)
            dma_to(u_ref, knot_us_ref, 0, B, sems.at[0]).start()

        def attempt(carry):
            t, dt, qold, done, natt, nacc, nrej, res_t = carry
            t_rem = t_end - t
            dt_c = jnp.minimum(dt, t_rem)
            is_last = dt >= t_rem
            t_new = jnp.where(is_last, t_end, t + dt_c)

            hits = [
                (saveat_ref[i] > t) & (saveat_ref[i] <= t_new)
                for i in range(n_save)
            ]

            # ---- noise over [t, t+dt_c] (consistent under rejection)
            tau = jnp.clip((t + dt_c - t0) / t_span, 0.0, 1.0)
            wz_eval(tau, wz1_ref)
            dW = wz1_ref[pl.ds(0, B), :] - wz0_ref[pl.ds(0, B), :]
            dZ = wz1_ref[pl.ds(B, B), :] - wz0_ref[pl.ds(B, B), :]

            sqdt = jnp.sqrt(dt_c)
            chi1 = (dW * dW - dt_c) / (2.0 * sqdt)
            chi2 = (dW + dZ / sqrt3) * 0.5
            chi3 = (dW * dW * dW - 3.0 * dW * dt_c) / (6.0 * dt_c)

            # stage times match sde/step.py::sri_step exactly (autonomous
            # families ignore them; the vpsde family's β(t)/score-net time
            # conditioning depends on them)
            u = u_ref[:]
            k1 = f_drift(u, t)
            g1 = g_diff(u, t + T.c11 * dt_c)
            H01 = u + dt_c * T.a021 * k1 + T.b021 * chi2 * g1
            H11 = u + dt_c * T.a121 * k1 + sqdt * T.b121 * g1
            k2 = f_drift(H01, t + T.c02 * dt_c)
            g2 = g_diff(H11, t + T.c12 * dt_c)
            H02 = u + dt_c * (T.a031 * k1 + T.a032 * k2) + chi2 * (
                T.b031 * g1 + T.b032 * g2
            )
            H12 = u + dt_c * (T.a131 * k1 + T.a132 * k2) + sqdt * (
                T.b131 * g1 + T.b132 * g2
            )
            k3 = f_drift(H02, t + T.c03 * dt_c)
            g3 = g_diff(H12, t + T.c13 * dt_c)
            H03 = u + dt_c * (T.a041 * k1 + T.a042 * k2 + T.a043 * k3) \
                + chi2 * (T.b041 * g1 + T.b042 * g2 + T.b043 * g3)
            H13 = u + dt_c * (T.a141 * k1 + T.a142 * k2 + T.a143 * k3) \
                + sqdt * (T.b141 * g1 + T.b142 * g2 + T.b143 * g3)
            k4 = f_drift(H03, t + T.c04 * dt_c)
            g4 = g_diff(H13, t + T.c14 * dt_c)

            E2 = chi2 * (
                T.beta31 * g1 + T.beta32 * g2 + T.beta33 * g3
                + T.beta34 * g4
            ) + chi3 * (
                T.beta41 * g1 + T.beta42 * g2 + T.beta43 * g3
                + T.beta44 * g4
            )
            u_new = (
                u
                + dt_c * (
                    T.alpha1 * k1 + T.alpha2 * k2 + T.alpha3 * k3
                    + T.alpha4 * k4
                )
                + E2
                + dW * (
                    T.beta11 * g1 + T.beta12 * g2 + T.beta13 * g3
                    + T.beta14 * g4
                )
                + chi1 * (
                    T.beta21 * g1 + T.beta22 * g2 + T.beta23 * g3
                    + T.beta24 * g4
                )
            )
            E1 = dt_c * (k1 + k2 + k3 + k4)
            res = (delta * E1 + E2) / (
                atol + jnp.maximum(jnp.abs(u), jnp.abs(u_new)) * rtol
            )
            eest = jnp.sqrt(jnp.sum(res * res) * inv_n)
            accept = eest <= 1.0
            dt_acc, dt_rej, qold_acc = _propose(ctrl, eest, dt_c, qold)

            # linear dense output, accept-gated like the XLA loop's
            # hit & upd (a rejected attempt's interpolant must never
            # leak into ys — visible on truncated/failed solves)
            for s_idx in range(n_save):
                @pl.when(hits[s_idx] & accept)
                def _(s_idx=s_idx):
                    theta = jnp.clip(
                        (saveat_ref[s_idx] - t) / dt_c, 0.0, 1.0
                    )
                    ys_ref[s_idx] = u + theta * (u_new - u)

            if use_reservoir:
                cnt = (nacc + 1).astype(jnp.float32)
                take = accept & (rand_ref[natt] * cnt < 1.0)
                res_t = jnp.where(take, t, res_t)

                @pl.when(take)
                def _():
                    res_u_ref[:] = u_ref[:]

            @pl.when(accept)
            def _():
                if record:
                    # previous slot's u DMA must land before u_ref changes
                    dma_to(u_ref, knot_us_ref, 0, B, sems.at[0]).wait()
                    # the step's increments — captured into tmp2 and
                    # copied SYNCHRONOUSLY (tmp2 is reused as the bridge
                    # midpoint buffer by the next attempt's descent)
                    step_i = jnp.minimum(nacc, n_knot - 2)
                    tmp2_ref[pl.ds(0, B), :] = dW
                    tmp2_ref[pl.ds(B, B), :] = dZ
                    dw_src = tmp2_ref.at[pl.ds(0, B), :]
                    dz_src = tmp2_ref.at[pl.ds(B, B), :]
                    dma_to(dw_src, knot_dws_ref, step_i * B, B,
                           sems.at[1]).start()
                    dma_to(dw_src, knot_dws_ref, step_i * B, B,
                           sems.at[1]).wait()
                    dma_to(dz_src, knot_dzs_ref, step_i * B, B,
                           sems.at[1]).start()
                    dma_to(dz_src, knot_dzs_ref, step_i * B, B,
                           sems.at[1]).wait()
                u_ref[:] = u_new
                wz0_ref[:] = wz1_ref[:]
                if record:
                    cnt_i = jnp.minimum(nacc + 1, n_knot - 1)
                    knot_ts_ref[cnt_i] = t_new
                    dma_to(
                        u_ref, knot_us_ref, cnt_i * B, B, sems.at[0]
                    ).start()

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
            t0, dt0, jnp.float32(ctrl.qoldinit), t0 >= t_end,
            jnp.int32(0), jnp.int32(0), jnp.int32(0), t0,
        )
        t_f, _, _, done, natt, nacc, nrej, res_t = lax.while_loop(
            cond, attempt, init
        )

        if record:
            # the last accept's u DMA (or the init DMA) is still in flight
            dma_to(u_ref, knot_us_ref, 0, B, sems.at[0]).wait()

        stats_i_ref[0] = nacc
        stats_i_ref[1] = nrej
        stats_i_ref[2] = done.astype(jnp.int32)
        stats_i_ref[3] = natt
        stats_f_ref[0] = t_f
        stats_f_ref[1] = res_t

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(precision, rtol, atol, delta, B, F, F_logical, family,
                n_save, max_steps, n_knot, depth, use_reservoir, tab_name,
                order, interpret, vmem_limit=64 * 1024 * 1024):
    record = n_knot > 0
    kernel = _make_kernel(
        precision, rtol, atol, delta, B, F, F_logical, family, n_save,
        max_steps, n_knot, depth, use_reservoir, tab_name, order,
        interpret,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    any_ = lambda: pl.BlockSpec(memory_space=pl.ANY)  # noqa: E731

    in_specs = [smem(), smem(), smem()]
    if use_reservoir:
        in_specs.append(smem())
    in_specs += [vmem()] * (1 + sde_family_n_weights(family))

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
    if record:
        out_specs += [smem(), any_(), any_(), any_()]
        out_shape += [
            jax.ShapeDtypeStruct((n_knot,), jnp.float32),
            jax.ShapeDtypeStruct((n_knot * B, F), jnp.float32),
            jax.ShapeDtypeStruct(((n_knot - 1) * B, F), jnp.float32),
            jax.ShapeDtypeStruct(((n_knot - 1) * B, F), jnp.float32),
        ]
    scratch = [
        pltpu.VMEM((2 * B, F), jnp.float32),
        pltpu.VMEM((2 * B, F), jnp.float32),
        pltpu.VMEM((2 * B, F), jnp.float32),
        pltpu.VMEM((2 * B, F), jnp.float32),
        pltpu.VMEM((2 * B, F), jnp.float32),
    ]
    if record:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit),
            has_side_effects=True,
        ),
        interpret=interpret,
    )


def _split_sde_params(params):
    """(w1, b1, w2, b2, wd, bd) from {drift: {layer_0, layer_1},
    diffusion: {w, b}} — the construct.jl:202-210 family. Returns None if
    the structure doesn't match."""
    try:
        d = params["drift"]
        w1, b1 = d["layer_0"]["w"], d["layer_0"]["b"]
        w2, b2 = d["layer_1"]["w"], d["layer_1"]["b"]
        g = params["diffusion"]
        wd, bd = g["w"], g["b"]
    except (KeyError, TypeError):
        return None
    if w1.ndim != 2 or w2.ndim != 2 or wd.ndim != 2:
        return None
    F, H = w1.shape
    if w2.shape != (H, F) or wd.shape != (F, F):
        return None
    return w1, b1, w2, b2, wd, bd


def persistent_sde_solve(
    params,
    u0: jnp.ndarray,
    tspan,
    *,
    noise_key,
    rtol: float,
    atol: float,
    solver: str,
    delta: float,
    saveat_arr: jnp.ndarray,
    max_steps: int,
    record_knots: bool = False,
    reservoir_key: Optional[jnp.ndarray] = None,
    brownian_depth: int = 24,
    precision=None,
    dt0=None,
    plan_only: bool = False,
):
    """Run the whole adaptive diagonal SRI/SOSRI solve in one Pallas
    program. Returns a dict of raw outputs (knots PADDED to the 128 lane;
    the stored adjoint slices per step), or None when the configuration
    isn't servable (solver family, shapes, VMEM plan)."""
    if solver not in ("sri", "sosri"):
        return None
    if u0.ndim != 2 or u0.dtype != jnp.float32 or u0.shape[0] % 8:
        return None
    split = _split_sde_params(params)
    if split is None:
        return None
    w1, b1, w2, b2, wd, bd = split
    B, F = u0.shape
    if w1.shape[0] != F:
        return None
    n_save = int(saveat_arr.shape[0])
    if n_save > _MAX_NSAVE:
        return None
    H = w1.shape[1]
    F_pad = -(-F // 128) * 128
    H_pad = -(-H // 128) * 128
    family = ("mlp", H_pad)
    w_bytes = (
        F_pad * H_pad + H_pad + H_pad * F_pad + F_pad
        + F_pad * F_pad + F_pad
    ) * 4
    vmem_need = _plan(B, F_pad, n_save, w_bytes, H_pad)
    if vmem_need is None:
        return None
    if plan_only:
        return True

    t0 = jnp.asarray(tspan[0], jnp.float32)
    t_end = jnp.asarray(tspan[1], jnp.float32)
    order = 1.5

    # initial derivative + dt heuristic outside the kernel (1 drift NFE)
    def drift(x):
        h = jnp.tanh(
            jnp.dot(x, w1, precision=precision) + b1
        )
        return jnp.dot(h, w2, precision=precision) + b2

    dt_init = _hnw_dt_init(u0, drift(u0), rtol, atol, t0, t_end, dt0)

    n_knot = (int(max_steps) + 1) if record_knots else 0

    call = _build_call(
        precision, float(rtol), float(atol), float(delta), B, F_pad, F,
        family, n_save, int(max_steps), n_knot, int(brownian_depth),
        reservoir_key is not None, solver, order, _interpret(),
        vmem_limit=vmem_need + 6 * 1024 * 1024,
    )

    def fpad(a, rows, cols):
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    u0_in = jnp.pad(u0, ((0, 0), (0, F_pad - F)))
    w1_in = fpad(w1, F_pad, H_pad)
    b1_in = jnp.pad(b1, (0, H_pad - H)).reshape(1, H_pad)
    w2_in = fpad(w2, H_pad, F_pad)
    b2_in = jnp.pad(b2, (0, F_pad - F)).reshape(1, F_pad)
    wd_in = fpad(wd, F_pad, F_pad)
    bd_in = jnp.pad(bd, (0, F_pad - F)).reshape(1, F_pad)

    seed = _derive_seed(noise_key)
    sc_f = jnp.stack([
        t0, t_end, dt_init.astype(jnp.float32), (t_end - t0)
    ])
    sc_i = jnp.stack([seed, jnp.int32(0)])
    args = [sc_f, sc_i, jnp.asarray(saveat_arr, jnp.float32)]
    if reservoir_key is not None:
        args.append(
            jax.random.uniform(reservoir_key, (int(max_steps),), jnp.float32)
        )
    args += [u0_in, w1_in, b1_in, w2_in, b2_in, wd_in, bd_in]

    outs = call(*args)
    i = 0
    y_final = outs[i][:, :F]; i += 1
    ys = outs[i][:, :, :F]; i += 1
    stats_i = outs[i]; i += 1
    stats_f = outs[i]; i += 1
    res_u = None
    if reservoir_key is not None:
        res_u = outs[i][:, :F]; i += 1
    knot_ts = knot_us = knot_dws = knot_dzs = None
    if record_knots:
        knot_ts = outs[i]; i += 1
        # PADDED (the stored adjoint slices [..., :F] per step — no bulk
        # unpad copy)
        knot_us = outs[i].reshape(n_knot, B, F_pad); i += 1
        knot_dws = outs[i].reshape(n_knot - 1, B, F_pad); i += 1
        knot_dzs = outs[i].reshape(n_knot - 1, B, F_pad); i += 1

    natt = stats_i[3]
    return dict(
        y_final=y_final,
        ys=ys,
        naccept=stats_i[0],
        nreject=stats_i[1],
        success=stats_i[2].astype(jnp.bool_),
        nfe_drift=jnp.asarray(1, jnp.int32) + 4 * natt,
        nfe_diffusion=4 * natt,
        t_final=stats_f[0],
        reservoir_t=stats_f[1] if reservoir_key is not None else None,
        reservoir_u=res_u,
        knot_ts=knot_ts,
        knot_us=knot_us,
        knot_dws=knot_dws,
        knot_dzs=knot_dzs,
    )


# ---------------------------------------------------------------------------
# the reverse-time VP-SDE sampling family (models/score_sde.py::sample_vpsde
# — BASELINE config 5, the score-SDE adaptive sampler)


def match_td_score_chain(module):
    """Match a ``TDChain`` of ``Dense`` layers (the reference's
    time-appended-channel convention, ``src/layers/common.jl:1-45``: layer
    ``i`` maps ``d_{i-1}+1 -> d_i``) with tanh/identity activations and
    state-preserving width d0 == dL. Returns ``(dims, acts, keys)`` —
    the LOGICAL per-layer widths (d0..dL), per-layer tanh flags, and the
    param keys in order — or ``None``."""
    from ...models.common import TDChain
    from ...nn.basic import _ACTIVATIONS, Dense

    if not isinstance(module, TDChain):
        return None
    items = list(module.layers.items())
    if not items or not all(isinstance(l, Dense) for _, l in items):
        return None
    ident = (_ACTIVATIONS[None], _ACTIVATIONS["identity"])
    dims = [items[0][1].in_dim - 1]
    acts, keys = [], []
    for key, l in items:
        if not l.use_bias or l.in_dim != dims[-1] + 1:
            return None
        if l.activation is jnp.tanh:
            acts.append(True)
        elif any(l.activation is fn for fn in ident):
            acts.append(False)
        else:
            return None
        dims.append(l.out_dim)
        keys.append(key)
    if dims[0] != dims[-1] or dims[0] < 1:
        return None
    return tuple(dims), tuple(acts), tuple(keys)


def td_score_eval_pure(params, keys, acts, x, t, precision=None):
    """Unpadded pure-JAX twin of the in-kernel TD score-chain eval: layer
    weights are the reference (d+1, h) TD matrices whose LAST row is the
    time weight (the concatenated ones·t channel). Used for the HNW dt
    heuristic and kernel-parity tests."""
    a = x
    for key, act in zip(keys, acts):
        w = params[key]["w"]
        z = jnp.dot(
            a, w[:-1], preferred_element_type=jnp.float32,
            precision=precision,
        ) + t * w[-1] + params[key]["b"]
        a = jnp.tanh(z) if act else z
    return a


def pack_td_score_weights(params, keys, dims, pads):
    """Pad the score chain's TD weights to lane-aligned kernel operands:
    per layer ``wx`` (the (d, h) state rows), ``wt`` (the time row, the
    concatenated ones·t channel = LAST row of the reference's (d+1, h) TD
    matrix), and ``b`` — the operand order both the 'vpsde' SDE family
    and the 'pfode' Tsit5 family consume."""
    ops = []
    for i, key in enumerate(keys):
        w = params[key]["w"]
        b = params[key]["b"]
        ops.append(jnp.pad(
            w[:-1], ((0, pads[i] - dims[i]), (0, pads[i + 1] - dims[i + 1]))
        ))
        ops.append(jnp.pad(
            w[-1], (0, pads[i + 1] - dims[i + 1])
        ).reshape(1, -1))
        ops.append(jnp.pad(
            b, (0, pads[i + 1] - dims[i + 1])
        ).reshape(1, -1))
    return ops


def persistent_vpsde_solve(
    params,
    chain_info,
    u0: jnp.ndarray,
    tspan,
    *,
    noise_key,
    rtol: float,
    atol: float,
    solver: str,
    delta: float,
    saveat_arr: jnp.ndarray,
    max_steps: int,
    beta_min: float,
    beta_max: float,
    t1: float,
    brownian_depth: int = 24,
    precision=None,
    dt0=None,
    plan_only: bool = False,
):
    """``persistent_sde_solve`` for the reverse-time VP-SDE sampling family:
    the whole adaptive SRI/SOSRI reverse-SDE solve — score-net stage
    evaluations, β(t) drift/diffusion scaling, in-kernel Brownian tree —
    in one TPU program. ``chain_info = (dims, acts, keys)`` from
    ``match_td_score_chain``. Sampling is never differentiated, so there
    is no knot/reservoir machinery. Returns the output dict or None when
    the configuration isn't servable."""
    if solver not in ("sri", "sosri"):
        return None
    if u0.ndim != 2 or u0.dtype != jnp.float32 or u0.shape[0] % 8:
        return None
    dims, acts, keys = chain_info
    B, F = u0.shape
    if dims[0] != F:
        return None
    n_save = int(saveat_arr.shape[0])
    if n_save > _MAX_NSAVE:
        return None
    pads = tuple(-(-d // 128) * 128 for d in dims)
    family = ("vpsde", pads, acts, float(beta_min), float(beta_max),
              float(t1))
    w_bytes = sum(
        (pads[i] * pads[i + 1] + 2 * pads[i + 1]) * 4
        for i in range(len(dims) - 1)
    )
    F_pad = pads[0]
    vmem_need = _plan(B, F_pad, n_save, w_bytes, max(pads))
    if vmem_need is None:
        return None
    if plan_only:
        return True

    t0 = jnp.asarray(tspan[0], jnp.float32)
    t_end = jnp.asarray(tspan[1], jnp.float32)
    order = 1.5

    # initial drift + dt heuristic outside the kernel (1 drift NFE). At
    # τ = t0 the real time is t1 − t0 (the sampler starts at the noise
    # end of the schedule).
    t_real0 = float(t1) - t0
    b0 = float(beta_min) + t_real0 * (float(beta_max) - float(beta_min))
    s0 = td_score_eval_pure(params, keys, acts, u0, t_real0, precision)
    f0 = 0.5 * b0 * u0 + b0 * s0
    dt_init = _hnw_dt_init(u0, f0, rtol, atol, t0, t_end, dt0)

    call = _build_call(
        precision, float(rtol), float(atol), float(delta), B, F_pad, F,
        family, n_save, int(max_steps), 0, int(brownian_depth),
        False, solver, order, _interpret(),
        vmem_limit=vmem_need + 6 * 1024 * 1024,
    )

    seed = _derive_seed(noise_key)
    sc_f = jnp.stack([
        t0, t_end, dt_init.astype(jnp.float32), (t_end - t0)
    ])
    sc_i = jnp.stack([seed, jnp.int32(0)])
    args = [sc_f, sc_i, jnp.asarray(saveat_arr, jnp.float32)]
    args.append(jnp.pad(u0, ((0, 0), (0, F_pad - F))))
    args += pack_td_score_weights(params, keys, dims, pads)

    y_final, ys, stats_i, stats_f = call(*args)
    natt = stats_i[3]
    return dict(
        y_final=y_final[:, :F],
        ys=ys[:, :, :F],
        naccept=stats_i[0],
        nreject=stats_i[1],
        success=stats_i[2].astype(jnp.bool_),
        nfe_drift=jnp.asarray(1, jnp.int32) + 4 * natt,
        nfe_diffusion=4 * natt,
        t_final=stats_f[0],
        reservoir_t=None,
        reservoir_u=None,
        knot_ts=None,
        knot_us=None,
        knot_dws=None,
        knot_dzs=None,
    )
