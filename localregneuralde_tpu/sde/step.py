"""Differentiable single SDE steps: four-stage SRI, commutative Milstein,
Lamba–Euler–Heun.

Reference: ``src/perform_step.jl:49-206``. Each step returns the new state
plus the embedded error estimate ``EEst`` (tolerance-scaled RMS); the local
regularizer is ``EEst · dt``, exactly as the reference returns from its
``_perform_step`` overloads.

Dynamics/diffusion convention: ``f(u, t, p, st) -> (du, st)`` and
``g(u, t, p, st) -> (gu, st)``; diagonal noise (gu has the shape of u).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp

from ..ops.residuals import (
    difference_residuals,
    internal_norm,
    sde_error_residuals,
)
from .tableaus import SRIW1Tableau


class SDEStepResult(NamedTuple):
    u_new: Any
    eest: jnp.ndarray          # tolerance-scaled error norm (accept iff ≤ 1)
    f_state: Any
    g_state: Any
    nfe_drift: int
    nfe_diffusion: int


def sri_step(
    f: Callable, g: Callable, u, t, dt, dW, dZ, p, f_state, g_state,
    atol, rtol, delta: float = 1 / 6, tableau=None,
) -> SDEStepResult:
    """One four-stage SRI step (diagonal Itô noise), reference
    ``src/perform_step.jl:49-106``. 4 drift + 4 diffusion evaluations.
    ``tableau`` selects the coefficient set (SRIW1 default; SOSRITableau
    for the stability-optimized drift block)."""
    T = tableau if tableau is not None else SRIW1Tableau
    sqdt = jnp.sqrt(dt)
    sqrt3 = jnp.sqrt(jnp.asarray(3.0, dt.dtype if hasattr(dt, "dtype") else jnp.float32))

    chi1 = (dW ** 2 - jnp.abs(dt)) / (2 * sqdt)     # I_(1,1)/sqrt(h)
    chi2 = (dW + dZ / sqrt3) / 2                     # I_(1,0)/h
    chi3 = (dW ** 3 - 3 * dW * dt) / (6 * dt)        # I_(1,1,1)/h

    fst, gst = f_state, g_state
    k1, fst = f(u, t, p, fst)
    g1, gst = g(u, t + T.c11 * dt, p, gst)

    H01 = u + dt * T.a021 * k1 + T.b021 * chi2 * g1
    H11 = u + dt * T.a121 * k1 + sqdt * T.b121 * g1

    k2, fst = f(H01, t + T.c02 * dt, p, fst)
    g2, gst = g(H11, t + T.c12 * dt, p, gst)

    H02 = u + dt * (T.a031 * k1 + T.a032 * k2) + chi2 * (
        T.b031 * g1 + T.b032 * g2
    )
    H12 = u + dt * (T.a131 * k1 + T.a132 * k2) + sqdt * (
        T.b131 * g1 + T.b132 * g2
    )

    k3, fst = f(H02, t + T.c03 * dt, p, fst)
    g3, gst = g(H12, t + T.c13 * dt, p, gst)

    H03 = u + dt * (T.a041 * k1 + T.a042 * k2 + T.a043 * k3) + chi2 * (
        T.b041 * g1 + T.b042 * g2 + T.b043 * g3
    )
    H13 = u + dt * (T.a141 * k1 + T.a142 * k2 + T.a143 * k3) + sqdt * (
        T.b141 * g1 + T.b142 * g2 + T.b143 * g3
    )

    k4, fst = f(H03, t + T.c04 * dt, p, fst)
    g4, gst = g(H13, t + T.c14 * dt, p, gst)

    E2 = chi2 * (T.beta31 * g1 + T.beta32 * g2 + T.beta33 * g3 + T.beta34 * g4) \
        + chi3 * (T.beta41 * g1 + T.beta42 * g2 + T.beta43 * g3 + T.beta44 * g4)

    u_new = (
        u
        + dt * (T.alpha1 * k1 + T.alpha2 * k2 + T.alpha3 * k3 + T.alpha4 * k4)
        + E2
        + dW * (T.beta11 * g1 + T.beta12 * g2 + T.beta13 * g3 + T.beta14 * g4)
        + chi1 * (T.beta21 * g1 + T.beta22 * g2 + T.beta23 * g3 + T.beta24 * g4)
    )

    E1 = dt * (k1 + k2 + k3 + k4)
    eest = internal_norm(
        sde_error_residuals(E1, E2, u, u_new, atol, rtol, delta)
    )
    return SDEStepResult(u_new, eest, fst, gst, 4, 4)


def milstein_commute_step(
    f: Callable, g: Callable, u, t, dt, dW, p, f_state, g_state,
    atol, rtol, *, interpretation: str = "ito",
) -> SDEStepResult:
    """Diagonal-noise commutative Milstein step (reference
    ``src/perform_step.jl:108-170``, diagonal branch).

    As-is reference quirk preserved: the returned EEst is the
    tolerance-scaled RMS of ``u_new − u`` — the drift-error expression the
    reference computes first is overwritten before use
    (``perform_step.jl:164-167``).
    """
    sqdt = jnp.sqrt(jnp.abs(dt))
    # iterated integral I_(1,1); Itô correction subtracts dt/2
    J = (dW ** 2) / 2
    if interpretation == "ito":
        J = J - jnp.abs(dt) / 2

    du1, fst = f(u, t, p, f_state)
    L, gst = g(u, t, p, g_state)
    K = u + dt * du1

    base = K if interpretation == "ito" else u
    tmp = base + sqdt * L
    gtmp, gst = g(tmp, t, p, gst)
    Dgj = (gtmp - L) / sqdt
    u_new = K + L * dW + Dgj * J

    eest = internal_norm(difference_residuals(u, u_new, atol, rtol))
    return SDEStepResult(u_new, eest, fst, gst, 1, 2)


def milstein_commute_step_nondiag(
    f: Callable, g: Callable, u, t, dt, dW, p, f_state, g_state,
    atol, rtol, *, interpretation: str = "ito",
) -> SDEStepResult:
    """Non-diagonal (matrix) commutative-noise Milstein step (reference
    ``src/perform_step.jl:126-160``, non-diagonal branch).

    Shapes: ``u`` = (..., d); ``dW`` = (..., m); diffusion ``g`` returns the
    noise-rate matrix (..., d, m). The iterated integrals use the
    commutative-noise approximation ``J = dW dWᵀ / 2`` (the symmetric part is
    exact when the diffusion columns commute; ``get_iterated_I`` for
    RKMilCommute), with the Itô correction ``J -= (dt/2)·I``
    (``perform_step.jl:119-125``). The Milstein correction follows the
    reference's per-channel loop — ``Dg_j = (g(K + √dt·L[:,j]) − L)/√dt``,
    ``Σ_j Dg_j · J[:,j]`` — realized as a ``lax.scan`` over channels (m extra
    diffusion evaluations, threading diffusion state).

    As-is reference quirk preserved: EEst is the tolerance-scaled RMS of
    ``u_new − u`` (the drift/ggprime expression computed first is overwritten
    before use, ``perform_step.jl:162-167``).
    """
    from jax import lax

    sqdt = jnp.sqrt(jnp.abs(dt))
    m = dW.shape[-1]
    # commutative iterated integrals: J[j, k] ≈ I_(j,k)
    J = 0.5 * dW[..., :, None] * dW[..., None, :]  # (..., m, m)
    if interpretation == "ito":
        J = J - (jnp.abs(dt) / 2) * jnp.eye(m, dtype=J.dtype)

    du1, fst = f(u, t, p, f_state)
    L, gst = g(u, t, p, g_state)  # (..., d, m)
    K = u + dt * du1

    def channel(g_st, j):
        Kj = K + sqdt * jnp.take(L, j, axis=-1)
        gtmp, g_st = g(Kj, t, p, g_st)
        Dgj = (gtmp - L) / sqdt  # (..., d, m)
        contrib = jnp.einsum("...dm,...m->...d", Dgj, jnp.take(J, j, axis=-1))
        return g_st, contrib

    gst, contribs = lax.scan(channel, gst, jnp.arange(m))
    mil_correction = jnp.sum(contribs, axis=0)

    u_new = K + jnp.einsum("...dm,...m->...d", L, dW) + mil_correction

    eest = internal_norm(difference_residuals(u, u_new, atol, rtol))
    return SDEStepResult(u_new, eest, fst, gst, 1, 1 + m)


def lamba_euler_heun_step(
    f: Callable, g: Callable, u, t, dt, dW, p, f_state, g_state,
    atol, rtol, delta: float = 1 / 6,
) -> SDEStepResult:
    """Stratonovich predictor-corrector (Lamba) Euler–Heun step
    (reference ``src/perform_step.jl:172-206``, diagonal branch)."""
    sqdt = jnp.sqrt(jnp.abs(dt))
    du1, fst = f(u, t, p, f_state)
    K = u + dt * du1
    L, gst = g(u, t, p, g_state)

    noise = L * dW
    tmp = K + noise
    g_tmp, gst = g(tmp, t + dt, p, gst)
    gtmp2 = (L + g_tmp) / 2
    noise2 = gtmp2 * dW

    f_tmp, fst = f(tmp, t + dt, p, fst)
    u_new = u + (dt / 2) * (du1 + f_tmp) + noise2

    du2, fst = f(K, t + dt, p, fst)
    Ed = dt * (du2 - du1) / 2

    utilde = u + L * sqdt
    g_ut, gst = g(utilde, t, p, gst)
    ggprime = (g_ut - L) / sqdt
    En = ggprime * (dW ** 2) / 2

    eest = internal_norm(
        sde_error_residuals(Ed, En, u, u_new, atol, rtol, delta)
    )
    return SDEStepResult(u_new, eest, fst, gst, 3, 3)
