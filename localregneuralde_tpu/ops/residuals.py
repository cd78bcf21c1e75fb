"""Hairer-style mixed absolute/relative tolerance residuals and norms.

Mirrors the three residual arities + RMS norm of the reference
(``src/perform_step.jl:208-220``), shared between the ODE and SDE stacks.
All reductions are over the *entire* batch tensor — the framework integrates
a whole batch on one shared adaptive time grid (one dt, one error norm), a
deliberate reference semantic (SURVEY.md §2e).
"""
from __future__ import annotations

import jax.numpy as jnp


def internal_norm(x) -> jnp.ndarray:
    """RMS norm over all elements (reference: ``_internalnorm``)."""
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def error_residuals(utilde, u0, u1, atol, rtol):
    """ũ / (atol + max(|u0|, |u1|)·rtol) — embedded-estimate residual."""
    return utilde / (atol + jnp.maximum(jnp.abs(u0), jnp.abs(u1)) * rtol)


def sde_error_residuals(e1, e2, u0, u1, atol, rtol, delta):
    """(δ·E₁ + E₂) / (atol + max(|u0|, |u1|)·rtol) — two-component SDE residual."""
    return (delta * e1 + e2) / (
        atol + jnp.maximum(jnp.abs(u0), jnp.abs(u1)) * rtol
    )


def difference_residuals(u0, u1, atol, rtol):
    """(u1 − u0) / (atol + max(|u0|, |u1|)·rtol)."""
    return (u1 - u0) / (atol + jnp.maximum(jnp.abs(u0), jnp.abs(u1)) * rtol)


def scaled_error_norm(utilde, u0, u1, atol, rtol) -> jnp.ndarray:
    """RMS of the tolerance-scaled residuals: the solver's EEst."""
    return internal_norm(error_residuals(utilde, u0, u1, atol, rtol))
