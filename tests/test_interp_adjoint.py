"""Interpolating-adjoint tests: gradient parity with the discretize-through
adjoint, incl. saveat cotangents and NeuralODE use (the reference's default
sensealg, InterpolatingAdjoint(ZygoteVJP))."""
import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.models import NeuralODE, diffeqsol_to_array
from localregneuralde_tpu.nn import Chain, Dense
from localregneuralde_tpu.ode import odesolve


def _f(u, t, p):
    return jnp.tanh(p["w"] @ u + p["b"]) - 0.5 * u


def _setup():
    key = jax.random.PRNGKey(0)
    p = {"w": jax.random.normal(key, (4, 4)) * 0.5, "b": jnp.zeros(4)}
    u0 = jax.random.normal(jax.random.PRNGKey(1), (4,))
    return u0, p


def _make_loss(adjoint):
    def loss(u0, p):
        sol = odesolve(
            _f, u0, (0.0, 1.0), p, rtol=1e-7, atol=1e-9, max_steps=128,
            saveat=jnp.array([0.4, 1.0]), adjoint=adjoint,
        )
        return jnp.sum(sol.y_final ** 2) + jnp.sum(sol.ys[0] ** 2)

    return loss


def test_interpolating_matches_direct_adjoint():
    u0, p = _setup()
    gd = jax.jit(jax.grad(_make_loss("direct"), argnums=(0, 1)))(u0, p)
    gi = jax.jit(jax.grad(_make_loss("interpolating"), argnums=(0, 1)))(u0, p)
    np.testing.assert_allclose(
        np.asarray(gd[0]), np.asarray(gi[0]), rtol=1e-3, atol=1e-6
    )
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(gd[1][k]), np.asarray(gi[1][k]), rtol=1e-3, atol=1e-5
        )


def test_interpolating_primal_identical_to_forward():
    u0, p = _setup()
    a = _make_loss("none")(u0, p)
    b = _make_loss("interpolating")(u0, p)
    assert float(a) == float(b)


def test_neural_ode_with_interpolating_adjoint():
    node = NeuralODE(
        Chain(Dense(2, 4, "tanh"), Dense(4, 2)),
        regularize="unbiased", adjoint="interpolating",
        rtol=1e-3, atol=1e-5, max_steps=32,
    )
    ps, st = node.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))

    def loss(ps, x):
        sol, st_ = node(ps, st, x, training=True)
        return jnp.sum(diffeqsol_to_array(sol)) + st_["reg_val"]

    gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(ps, x)
    leaves = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(gp)]
    )
    assert np.isfinite(leaves).all() and (leaves != 0).any()
    assert np.isfinite(np.asarray(gx)).all()


def test_interp_dense_grid_matches_stored_49_points():
    """PhysioNet-like 49-point saveat grid: the scan-based segment backward
    must produce gradients matching the stored adjoint (reference default
    sensealg is InterpolatingAdjoint, neural_ode.jl:11)."""
    import time

    def f(u, t, p):
        return jnp.tanh(p["w"] @ u + p["b"]) - 0.4 * u

    p = {
        "w": jax.random.normal(jax.random.PRNGKey(0), (4, 4)) * 0.4,
        "b": jnp.full((4,), 0.1),
    }
    u0 = jax.random.normal(jax.random.PRNGKey(1), (4,))
    grid = jnp.linspace(0.0, 1.0, 49)

    def make_loss(adjoint):
        def loss(u0, p):
            sol = odesolve(
                f, u0, (0.0, 1.0), p, rtol=1e-6, atol=1e-8, max_steps=128,
                saveat=grid, adjoint=adjoint,
            )
            w = jnp.arange(1.0, 50.0)[:, None]
            return jnp.sum(w * sol.ys ** 2)

        return loss

    t0 = time.perf_counter()
    gs = jax.jit(jax.grad(make_loss("stored"), argnums=(0, 1)))(u0, p)
    jax.block_until_ready(gs)
    t_stored = time.perf_counter() - t0

    t0 = time.perf_counter()
    gi = jax.jit(jax.grad(make_loss("interpolating"), argnums=(0, 1)))(u0, p)
    jax.block_until_ready(gi)
    t_interp = time.perf_counter() - t0

    np.testing.assert_allclose(
        np.asarray(gi[0]), np.asarray(gs[0]), rtol=2e-3, atol=1e-5
    )
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(gi[1][k]), np.asarray(gs[1][k]), rtol=2e-3, atol=1e-5
        )
    # compile+run time comparable to stored (the old unrolled event loop was
    # ~50 sequential adaptive solves traced inline — pathological)
    assert t_interp < 10 * t_stored
