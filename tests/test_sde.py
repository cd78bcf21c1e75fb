"""SDE stack tests: virtual Brownian tree, adaptive SRI solver (strong
accuracy vs exact GBM), Milstein / Euler–Heun steps, NeuralDSDE property
matrix (reference ``test/runtests.jl:340-430``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localregneuralde_tpu.models.neural_sde import NeuralDSDE
from localregneuralde_tpu.nn import Chain, Dense
from localregneuralde_tpu.sde import VirtualBrownianTree, sdesolve


def test_vbt_deterministic_and_additive():
    tree = VirtualBrownianTree(jax.random.PRNGKey(0), 0.0, 1.0, (3,))
    np.testing.assert_array_equal(
        np.asarray(tree.w(0.5)), np.asarray(tree.w(0.5))
    )
    dw1, dz1 = tree.increments(0.0, 0.3)
    dw2, dz2 = tree.increments(0.3, 0.2)
    dwf, dzf = tree.increments(0.0, 0.5)
    np.testing.assert_allclose(
        np.asarray(dw1 + dw2), np.asarray(dwf), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dz1 + dz2), np.asarray(dzf), atol=1e-6
    )


def test_vbt_statistics():
    # W(1) over many keys ~ N(0, 1); W and Z independent
    ws, zs = [], []
    for i in range(100):
        t = VirtualBrownianTree(jax.random.PRNGKey(i), 0.0, 1.0, (4,))
        ws.append(np.asarray(t.w(1.0)))
        zs.append(np.asarray(t.z(1.0)))
    ws = np.stack(ws).ravel()
    zs = np.stack(zs).ravel()
    assert abs(ws.mean()) < 0.15
    assert abs(ws.std() - 1.0) < 0.15
    assert abs(np.corrcoef(ws, zs)[0, 1]) < 0.15


@pytest.mark.parametrize(
    "solver,tol,thresh",
    [
        ("sri", 1e-3, 5e-3),
        # milstein's EEst is the reference's as-is scaled step-difference
        # (perform_step.jl:164-167): tight tolerances force tiny steps, so
        # test at a looser tolerance.
        ("milstein", 5e-2, 2e-2),
        ("euler_heun", 1e-2, 2e-2),
    ],
)
def test_sde_strong_accuracy_gbm(solver, tol, thresh):
    """Pathwise comparison against the exact geometric-BM solution
    u(t) = exp((μ−σ²/2)t + σW(t)) driven by the same tree."""
    mu_, sig = 0.5, 0.5

    def f(u, t, p):
        return mu_ * u

    def g(u, t, p):
        return sig * u

    # euler_heun is Stratonovich: dU = mu u dt + sig u ∘ dW has exact
    # solution exp(mu t + sig W); Itô solvers get the -sig²/2 correction.
    ito = solver != "euler_heun"

    @jax.jit
    def run(key):
        sol = sdesolve(
            f, g, jnp.ones(1), (0.0, 1.0), None, noise_key=key,
            rtol=tol, atol=tol, solver=solver, max_steps=1024,
            adjoint="none",
        )
        tree = VirtualBrownianTree(key, 0.0, 1.0, (1,))
        return sol.y_final, tree.w(1.0), sol.success

    errs = []
    for seed in range(10):
        y, w1, ok = run(jax.random.PRNGKey(seed))
        assert bool(ok)
        drift_term = (mu_ - (sig ** 2 / 2 if ito else 0.0)) * 1.0
        exact = np.exp(drift_term + sig * float(w1[0]))
        errs.append(abs(float(y[0]) - exact))
    assert np.mean(errs) < thresh, np.mean(errs)


def _make_ndsde(regularize):
    drift = Chain(Dense(2, 4, "tanh"), Dense(4, 2))
    diffusion = Dense(2, 2)
    return NeuralDSDE(
        drift, diffusion, regularize=regularize,
        rtol=1e-1, atol=1e-1, max_steps=64, checkpoint_every=8,
    )


def _flat(tree):
    return np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(tree)]
    )


@pytest.mark.parametrize("regularize", ["none", "unbiased", "biased"])
def test_neural_dsde_matrix(regularize):
    node = _make_ndsde(regularize)
    ps, st = node.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2))

    def forward(ps, x):
        sol, st_ = node(ps, st, x, training=True)
        return sol.ys[-1], st_

    y, st_ = jax.jit(forward)(ps, x)
    assert y.shape == (8, 2)
    assert int(st_["nfe_drift"]) > 0
    assert int(st_["nfe_diffusion"]) > 0
    if regularize == "none":
        assert float(st_["reg_val"]) == 0.0
    else:
        assert float(st_["reg_val"]) != 0.0

    def loss(ps, x):
        y, _ = forward(ps, x)
        return jnp.sum(y)

    gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(ps, x)
    gp_flat, gx_flat = _flat(gp), _flat(gx)
    assert np.isfinite(gp_flat).all() and (gp_flat != 0).any()
    assert np.isfinite(gx_flat).all() and (gx_flat != 0).any()

    if regularize != "none":
        def regloss(ps, x):
            _, st_ = forward(ps, x)
            return st_["reg_val"]

        rgp, rgx = jax.jit(jax.grad(regloss, argnums=(0, 1)))(ps, x)
        assert float(jnp.abs(_flat(rgx)).max()) == 0.0
        rgp_flat = _flat(rgp)
        assert np.isfinite(rgp_flat).all() and (rgp_flat != 0).any()


def test_sde_rejection_consistency():
    """A solve with many rejections still lands on the same Brownian path:
    solving twice with identical keys is bitwise-identical."""
    def f(u, t, p):
        return -2.0 * u

    def g(u, t, p):
        return 0.5 * u

    @jax.jit
    def run(key):
        return sdesolve(
            f, g, jnp.ones(2), (0.0, 1.0), None, noise_key=key,
            rtol=1e-3, atol=1e-3, max_steps=512, adjoint="none",
        ).y_final

    a = run(jax.random.PRNGKey(5))
    b = run(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
