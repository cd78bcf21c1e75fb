"""PI controller and initial-dt heuristic unit tests (SURVEY.md §4's
controller step-sequence coverage)."""
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.ode import PIController, initial_step_size


def test_accept_grows_within_qmax():
    c = PIController()
    dt = jnp.asarray(0.1)
    qold = jnp.asarray(c.qoldinit)
    # tiny error → maximal growth, capped at qmax
    dt_acc, _, _ = c.propose(jnp.asarray(1e-12), dt, qold)
    assert float(dt_acc) <= float(dt) * c.qmax * 1.0001
    assert float(dt_acc) > float(dt)


def test_reject_shrinks_within_qmin():
    c = PIController()
    dt = jnp.asarray(0.1)
    qold = jnp.asarray(c.qoldinit)
    # huge error → maximal shrink, capped at qmin
    _, dt_rej, _ = c.propose(jnp.asarray(1e12), dt, qold)
    assert float(dt_rej) >= float(dt) * c.qmin * 0.9999
    assert float(dt_rej) < float(dt)


def test_eest_near_one_keeps_dt_stable():
    c = PIController()
    dt = jnp.asarray(0.1)
    dt_acc, _, qold = c.propose(jnp.asarray(0.9), dt, jnp.asarray(0.9))
    # PI control near the boundary: modest adjustment only
    assert 0.5 * float(dt) < float(dt_acc) < 2.0 * float(dt)
    assert np.isclose(float(qold), 0.9)


def test_nonfinite_error_halves_dt():
    c = PIController()
    dt = jnp.asarray(0.1)
    dt_acc, dt_rej, _ = c.propose(jnp.asarray(jnp.nan), dt, jnp.asarray(1.0))
    np.testing.assert_allclose(float(dt_acc), 0.05)
    np.testing.assert_allclose(float(dt_rej), 0.05)


def test_pi_memory_damps_first_step_growth():
    """The PI term (qold^beta2) with qoldinit=1e-4 deliberately limits dt
    growth on the first accepted step relative to steady-state control —
    the standard predictive-controller behavior (OrdinaryDiffEq defaults)."""
    c = PIController()
    dt = jnp.asarray(0.1)
    grow_fresh, _, _ = c.propose(jnp.asarray(0.01), dt, jnp.asarray(c.qoldinit))
    grow_steady, _, _ = c.propose(jnp.asarray(0.01), dt, jnp.asarray(0.95))
    assert float(grow_fresh) < float(grow_steady)


def test_initial_step_size_scales_with_dynamics_speed():
    def slow(u, t, p, st):
        return 0.01 * u, st

    def fast(u, t, p, st):
        return 100.0 * u, st

    u0 = jnp.ones(4)
    dt_slow, nfe = initial_step_size(
        slow, u0, jnp.asarray(0.0), None, None, order=5, rtol=1e-3, atol=1e-6
    )
    dt_fast, _ = initial_step_size(
        fast, u0, jnp.asarray(0.0), None, None, order=5, rtol=1e-3, atol=1e-6
    )
    assert float(dt_slow) > float(dt_fast)
    assert nfe == 2


def test_step_counts_comparable_to_independent_adaptive_solver():
    """Cross-check accepted-step counts against scipy's RK45 — an
    INDEPENDENT adaptive implementation (Dormand–Prince 5(4), its own PI
    controller) — at matched tolerances. Both are 5th-order embedded pairs,
    so accepted-step counts should agree to within a small factor; this
    guards against a pathologically loose or tight controller (SURVEY §7
    hard-part 2: NFE comparability)."""
    import numpy as np
    from scipy.integrate import solve_ivp

    import jax
    import jax.numpy as jnp
    from localregneuralde_tpu.ode import odesolve

    problems = {
        # smooth nonlinear
        "tanh": (
            lambda u, t, p: jnp.tanh(p @ u) - 0.5 * u,
            lambda t, u, A: np.tanh(A @ u) - 0.5 * u,
        ),
        # mildly stiff linear
        "linear": (
            lambda u, t, p: p @ u,
            lambda t, u, A: A @ u,
        ),
    }
    rng = np.random.RandomState(0)
    A = (rng.randn(6, 6) * 0.8).astype(np.float32)
    A = A - 1.5 * np.eye(6, dtype=np.float32)
    u0 = rng.randn(6).astype(np.float32)

    for name, (f_jax, f_np) in problems.items():
        for rtol in (1e-4, 1e-6):
            sol = odesolve(
                f_jax, jnp.asarray(u0), (0.0, 2.0), jnp.asarray(A),
                rtol=rtol, atol=rtol * 1e-2, max_steps=4096, adjoint="none",
            )
            ours = int(sol.naccept)
            ref = solve_ivp(
                f_np, (0.0, 2.0), u0.astype(np.float64), args=(A,),
                method="RK45", rtol=rtol, atol=rtol * 1e-2,
            )
            theirs = len(ref.t) - 1
            ratio = ours / max(theirs, 1)
            assert 0.4 <= ratio <= 2.5, (name, rtol, ours, theirs)
            # and the trajectories agree at tolerance scale
            np.testing.assert_allclose(
                np.asarray(sol.y_final), ref.y[:, -1],
                rtol=max(50 * rtol, 1e-5), atol=1e-4,
            )
