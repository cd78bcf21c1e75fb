"""VCAB3 / VCABM3 variable-coefficient Adams solver tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from localregneuralde_tpu.models import NeuralODE, diffeqsol_to_array
from localregneuralde_tpu.nn import Chain, Dense
from localregneuralde_tpu.ode.multistep import adams_solve


def _vdp(u, t, p):
    return jnp.array([u[1], -u[0] - 0.1 * u[1] * (u[0] ** 2 - 1.0)])


@pytest.mark.parametrize("moulton", [False, True])
def test_adams_accuracy_vs_scipy(moulton):
    ref = solve_ivp(
        lambda t, u: np.array([u[1], -u[0] - 0.1 * u[1] * (u[0] ** 2 - 1)]),
        (0, 5), [1.0, 0.5], rtol=1e-10, atol=1e-12, t_eval=[2.5, 5.0],
    )
    sol = adams_solve(
        _vdp, jnp.array([1.0, 0.5]), (0.0, 5.0), None,
        rtol=1e-6, atol=1e-8, moulton=moulton,
        saveat=jnp.array([2.5, 5.0]), max_steps=1024, adjoint="none",
    )
    assert bool(sol.success)
    np.testing.assert_allclose(
        np.asarray(sol.ys), ref.y.T, rtol=1e-4, atol=1e-5
    )


def test_adams_gradients():
    u0 = jnp.array([1.0, 0.5])

    def loss(u0):
        sol = adams_solve(
            _vdp, u0, (0.0, 2.0), None, rtol=1e-5, atol=1e-7,
            moulton=True, max_steps=256, adjoint="direct",
        )
        return jnp.sum(sol.y_final ** 2)

    g = jax.grad(loss)(u0)
    eps = 1e-3
    fd = (
        loss(u0 + jnp.array([eps, 0.0])) - loss(u0 - jnp.array([eps, 0.0]))
    ) / (2 * eps)
    assert abs(float(g[0]) - float(fd)) < 2e-3 * max(1.0, abs(float(fd)))


@pytest.mark.parametrize("solver", ["vcab3", "vcabm3"])
def test_neural_ode_with_adams_solver(solver):
    node = NeuralODE(
        Chain(Dense(2, 4, "tanh"), Dense(4, 2)),
        regularize="unbiased", solver=solver,
        rtol=1e-3, atol=1e-5, max_steps=64, checkpoint_every=8,
    )
    ps, st = node.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    sol, st_ = node(ps, st, x, training=True)
    assert diffeqsol_to_array(sol).shape == (4, 2)
    # regularization still active (reg step is always Tsit5)
    assert float(st_["reg_val"]) != 0.0

    def loss(ps):
        sol, _ = node(ps, st, x, training=True)
        return jnp.sum(diffeqsol_to_array(sol))

    g = jax.grad(loss)(ps)
    leaves = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(g)]
    )
    assert np.isfinite(leaves).all() and (leaves != 0).any()


def test_biased_with_adams_accepted():
    # biased + multistep is supported since reservoir sampling rides the
    # Adams loop (round 2); construction must NOT raise
    NeuralODE(Chain(Dense(2, 2)), regularize="biased", solver="vcab3")


def test_biased_regularization_with_multistep():
    """Reservoir sampling now rides the Adams loop too: biased mode works
    with vcab3/vcabm3 main solvers (the reg step stays Tsit5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
    from localregneuralde_tpu.nn import Dense

    F, H, B = 8, 6, 4
    dyn = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    for solver in ("vcab3", "vcabm3"):
        node = NeuralODE(
            dyn, regularize="biased", solver=solver,
            rtol=1e-3, atol=1e-5, max_steps=64, checkpoint_every=8,
        )
        ps, st = node.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, F))

        def loss(ps, x):
            sol, st_ = node(ps, st, x, training=True)
            return jnp.sum(diffeqsol_to_array(sol)) + st_["reg_val"], st_

        (val, st_), gp = jax.jit(
            jax.value_and_grad(loss, has_aux=True)
        )(ps, x)
        assert np.isfinite(float(val))
        assert float(st_["reg_val"]) > 0.0
        # reservoir t1 is a step-START point strictly inside [t0, t_end)
        leaves = np.concatenate(
            [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(gp)]
        )
        assert np.isfinite(leaves).all() and (leaves != 0).any()
