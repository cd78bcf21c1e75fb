"""Trajectory-accuracy and solver-behavior tests for the native integrator.

These cover what the reference outsources to OrdinaryDiffEq (SURVEY.md §4):
golden trajectories vs an independent high-accuracy reference, saveat/dense
output, controller behavior, and maxiters bounding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from localregneuralde_tpu.ode import odesolve


def _vdp(u, t, p):
    return jnp.array([u[1], -u[0] - 0.1 * u[1] * (u[0] ** 2 - 1.0)])


def _vdp_np(t, u):
    return np.array([u[1], -u[0] - 0.1 * u[1] * (u[0] ** 2 - 1.0)])


@pytest.mark.parametrize("adjoint", ["none", "direct"])
def test_trajectory_matches_scipy(adjoint):
    u0 = jnp.array([1.0, 0.5])
    ts = jnp.linspace(0.0, 5.0, 6)
    sol = odesolve(
        _vdp, u0, (0.0, 5.0), None, rtol=1e-6, atol=1e-8,
        saveat=ts, max_steps=128, adjoint=adjoint,
    )
    ref = solve_ivp(
        _vdp_np, (0, 5), [1.0, 0.5], rtol=1e-10, atol=1e-12,
        t_eval=np.asarray(ts), method="RK45",
    )
    assert bool(sol.success)
    np.testing.assert_allclose(
        np.asarray(sol.ys), ref.y.T, rtol=1e-4, atol=5e-6
    )
    # both drivers agree with each other to tight tolerance
    sol2 = odesolve(
        _vdp, u0, (0.0, 5.0), None, rtol=1e-6, atol=1e-8,
        saveat=ts, max_steps=128,
        adjoint="direct" if adjoint == "none" else "none",
    )
    np.testing.assert_allclose(
        np.asarray(sol.ys), np.asarray(sol2.ys), rtol=1e-6, atol=1e-7
    )


def test_linear_system_exact():
    # u' = -u → e^{-t}: accuracy close to the requested tolerance
    sol = odesolve(
        lambda u, t, p: -u, jnp.ones(3), (0.0, 2.0), None,
        rtol=1e-7, atol=1e-9, max_steps=128, adjoint="none",
    )
    np.testing.assert_allclose(
        np.asarray(sol.y_final), np.exp(-2.0) * np.ones(3), rtol=2e-6
    )


def test_saveat_includes_t0_and_unsorted():
    ts = jnp.array([1.5, 0.0, 0.5, 1.0])
    sol = odesolve(
        lambda u, t, p: -u, jnp.ones(2), (0.0, 1.5), None,
        rtol=1e-6, atol=1e-9, saveat=ts, max_steps=64, adjoint="none",
    )
    expected = np.exp(-np.asarray(ts))[:, None] * np.ones(2)
    np.testing.assert_allclose(np.asarray(sol.ys), expected, rtol=1e-5)


def test_max_steps_exhaustion_reports_failure():
    sol = odesolve(
        lambda u, t, p: -u, jnp.ones(2), (0.0, 100.0), None,
        rtol=1e-10, atol=1e-12, max_steps=4, adjoint="none",
    )
    assert not bool(sol.success)


def test_nfe_accounting():
    sol = odesolve(
        lambda u, t, p: -u, jnp.ones(2), (0.0, 1.0), None,
        rtol=1e-4, atol=1e-6, max_steps=64, adjoint="none",
    )
    attempts = int(sol.naccept) + int(sol.nreject)
    assert int(sol.nfe) == 2 + 6 * attempts


def test_reservoir_point_is_an_accepted_step_start():
    key = jax.random.PRNGKey(3)
    sol = odesolve(
        _vdp, jnp.array([1.0, 0.5]), (0.0, 5.0), None,
        rtol=1e-5, atol=1e-7, max_steps=128, adjoint="none",
        reservoir_key=key,
    )
    t1 = float(sol.reservoir_t)
    assert 0.0 <= t1 < 5.0
    # the reservoir state must lie on the trajectory: re-integrate from it
    sol2 = odesolve(
        _vdp, sol.reservoir_u, (t1, 5.0), None,
        rtol=1e-7, atol=1e-9, max_steps=256, adjoint="none",
    )
    np.testing.assert_allclose(
        np.asarray(sol2.y_final), np.asarray(sol.y_final),
        rtol=1e-3, atol=1e-4,
    )


def test_jit_and_vmap_compatible():
    @jax.jit
    def run(u0):
        return odesolve(
            lambda u, t, p: -u, u0, (0.0, 1.0), None,
            rtol=1e-5, atol=1e-7, max_steps=32, adjoint="none",
        ).y_final

    u0s = jnp.stack([jnp.ones(2), 2 * jnp.ones(2)])
    out = jax.vmap(run)(u0s)
    np.testing.assert_allclose(
        np.asarray(out), np.exp(-1.0) * np.asarray(u0s), rtol=1e-4
    )


def test_reservoir_uniform_over_accepted_starts():
    """The biased-mode reservoir must sample ~uniformly over accepted
    step-start times (the analog of rand(sol.t[1:end-1]))."""
    u0 = jnp.array([1.0, 0.5])

    @jax.jit
    def draw(key):
        sol = odesolve(
            _vdp, u0, (0.0, 5.0), None, rtol=1e-4, atol=1e-6,
            max_steps=64, adjoint="none", reservoir_key=key,
        )
        return sol.reservoir_t, sol.naccept

    ts = np.array(
        [float(draw(jax.random.PRNGKey(i))[0]) for i in range(300)]
    )
    n_acc = int(draw(jax.random.PRNGKey(0))[1])
    assert n_acc >= 5
    # uniform over step starts in [0, 5): mean ≈ average accepted start.
    # crude but effective: samples span the interval and aren't clustered
    # at either end
    assert ts.min() < 1.0 and ts.max() > 3.0
    hist, _ = np.histogram(ts, bins=4, range=(0.0, 5.0))
    assert (hist > 10).all(), hist


def test_vmap_gives_per_sample_adaptive_grids():
    """vmapping the solver yields torchode-style PER-SAMPLE adaptive grids
    (each batch element gets its own dt sequence and NFE) — the reference
    only supports one shared grid per batch (SURVEY.md §2e); here both
    semantics are available: shared (batch inside u) or per-sample (vmap)."""
    def f(u, t, p):
        return -p * u  # stiffness varies per sample via p

    @jax.jit
    def solve_one(u0, p):
        sol = odesolve(
            f, u0, (0.0, 1.0), p, rtol=1e-5, atol=1e-7,
            max_steps=64, adjoint="none",
        )
        return sol.y_final, sol.naccept

    u0s = jnp.ones((3, 2))
    ps = jnp.array([0.5, 5.0, 50.0])  # increasingly fast decay
    ys, naccs = jax.vmap(solve_one)(u0s, ps)
    expected = np.exp(-np.asarray(ps))[:, None] * np.ones(2)
    np.testing.assert_allclose(np.asarray(ys), expected, rtol=1e-4, atol=1e-6)
    # stiffer samples take more steps: grids really are per-sample
    naccs = np.asarray(naccs)
    assert naccs[0] < naccs[1] < naccs[2], naccs
