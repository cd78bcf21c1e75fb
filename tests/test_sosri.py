"""SOSRI (stability-optimized SRI) tableau validation: the drift block is
re-derived (scripts/derive_sosri_drift.py) with the diffusion block frozen
at SRIW1, so strong order 1.5 must hold for BOTH tableaus, and the new drift
block must buy a ~5x larger stability interval (adaptive solves on stiff
drift take far fewer steps)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from localregneuralde_tpu.sde.solve import sdesolve
from localregneuralde_tpu.sde.step import sri_step
from localregneuralde_tpu.sde.tableaus import SOSRITableau, SRIW1Tableau

A_, B_ = 1.5, 0.1  # GBM drift/diffusion: exact u(T)=u0·exp((a−b²/2)T+bW(T))


def _f(u, t, p, st):
    return A_ * u, st


def _g(u, t, p, st):
    return B_ * u, st


def _coupled_increments(key, n_fine, h_fine, levels):
    """(dW, I10) at the finest grid, then exact pairwise coarsening:
    I10 over a merged interval = I10₁ + I10₂ + h·dW₁."""
    kw, kz = jax.random.split(key)
    dW = jax.random.normal(kw, (n_fine,)) * jnp.sqrt(h_fine)
    dZ = jax.random.normal(kz, (n_fine,)) * jnp.sqrt(h_fine)
    I10 = h_fine / 2 * (dW + dZ / jnp.sqrt(3.0))
    out = []
    h = h_fine
    for _ in range(levels):
        out.append((dW, I10, h))
        dW1, dW2 = dW[0::2], dW[1::2]
        I1, I2 = I10[0::2], I10[1::2]
        I10 = I1 + I2 + h * dW1
        dW = dW1 + dW2
        h = 2 * h
    return out


def _run_fixed(tableau, u0, dW, I10, h):
    # recover the dZ the step expects: chi2 = I10/h = (dW + dZ/sqrt3)/2
    dZ = jnp.sqrt(3.0) * (2 * I10 / h - dW)

    def body(carry, xs):
        u, t = carry
        dw, dz = xs
        res = sri_step(
            _f, _g, u, t, jnp.asarray(h), dw, dz, None, None, None,
            1e-2, 1e-2, tableau=tableau,
        )
        return (res.u_new, t + h), None

    (u_fin, _), _ = lax.scan(body, (u0, jnp.asarray(0.0)), (dW, dZ))
    return u_fin


@pytest.mark.parametrize("tableau", [SRIW1Tableau, SOSRITableau])
def test_strong_order_1p5_on_gbm(tableau):
    u0 = jnp.asarray(1.0)
    T = 1.0
    n_fine, levels = 64, 4  # h = 1/64 .. 1/8
    keys = jax.random.split(jax.random.PRNGKey(11), 1024)

    def one(key):
        seq = _coupled_increments(key, n_fine, T / n_fine, levels)
        errs = []
        W_T = jnp.sum(seq[0][0])
        exact = u0 * jnp.exp((A_ - 0.5 * B_ ** 2) * T + B_ * W_T)
        for dW, I10, h in seq:
            u_fin = _run_fixed(tableau, u0, dW, I10, h)
            errs.append(jnp.abs(u_fin - exact))
        return jnp.stack(errs)

    errs = np.asarray(jnp.mean(jax.jit(jax.vmap(one))(keys), axis=0))
    # slope across the 3 octaves (log2 h spacing): strong order ≥ ~1.4
    slopes = np.log2(errs[1:] / errs[:-1])
    assert (errs[1:] > errs[:-1]).all(), errs
    assert slopes.mean() > 1.35, (errs, slopes)


def test_sosri_drift_stability_interval():
    """Deterministic stiff drift u' = λu, fixed step with z = λh = −8:
    inside SOSRI's stability interval (L≈10.16), far outside SRIW1's
    (L=2) — SRIW1 must blow up, SOSRI must contract."""
    lam = -8.0

    def f(u, t, p, st):
        return lam * u, st

    def g(u, t, p, st):
        return 0.0 * u, st

    u0 = jnp.asarray(1.0)
    h = jnp.asarray(1.0)  # z = -8
    zero = jnp.zeros(())

    def run(tableau, n=20):
        u = u0
        for _ in range(n):
            u = sri_step(
                f, g, u, zero, h, zero, zero, None, None, None,
                1e-2, 1e-2, tableau=tableau,
            ).u_new
        return float(u)

    assert abs(run(SOSRITableau)) < 1.0
    assert abs(run(SRIW1Tableau)) > 1e6


def test_sosri_fewer_steps_on_stiff_drift():
    """Adaptive solve of a pathwise-stiff SDE: SRIW1 is stability-limited
    (dt ≲ 2/|λ|), SOSRI is error-limited — materially fewer accepted steps
    at the same tolerance (why the reference defaults to SOSRI)."""

    def f(u, t, p):
        return -40.0 * u

    def g(u, t, p):
        return 0.02 * u

    # horizon long enough that the stability cap (dt ≲ 2/40 for SRIW1)
    # binds past the controller's dt growth ramp (qmax 1.2/accept)
    u0 = jnp.ones((8,))
    res = {}
    for solver in ("sri", "sosri"):
        sol = sdesolve(
            f, g, u0, (0.0, 10.0), None, noise_key=jax.random.PRNGKey(0),
            rtol=1e-1, atol=1e-1, solver=solver, max_steps=2048,
            adjoint="none",
        )
        res[solver] = (
            bool(sol.success),
            int(sol.naccept) + int(sol.nreject),
            float(jnp.max(jnp.abs(sol.y_final))),
        )
    ok_s, att_s, mag_s = res["sosri"]
    ok_r, att_r, mag_r = res["sri"]
    # SOSRI: completes cleanly, solution contracts (true solution → ~0)
    assert ok_s and att_s < 200 and mag_s < 1.0, res
    # SRIW1: stability-limited — measured: the relative-tolerance criterion
    # even ACCEPTS exploding steps near the stability boundary (the
    # denominator grows with |u|), so it either exhausts the cap or
    # produces a blown-up trajectory. Either way: strictly worse.
    assert (not ok_r) or att_r > 2 * att_s or mag_r > 1.0, res


def test_sosri_reaches_neural_dsde():
    from localregneuralde_tpu.models.neural_sde import NeuralDSDE
    from localregneuralde_tpu.models import diffeqsol_to_array
    from localregneuralde_tpu.nn import Chain, Dense

    D, B = 6, 4
    drift = Chain(Dense(D, 12, "tanh"), Dense(12, D))
    diffusion = Dense(D, D)
    node = NeuralDSDE(
        drift, diffusion, solver="sosri", regularize="unbiased",
        rtol=1.4e-1, atol=1.4e-1, max_steps=64, adjoint="stored",
    )
    ps, st = node.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D)) * 0.5

    def loss(ps, x):
        sol, st_ = node(ps, st, x, training=True)
        return jnp.sum(diffeqsol_to_array(sol)) + st_["reg_val"]

    gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(ps, x)
    leaves = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(gp)]
    )
    assert np.isfinite(leaves).all() and (leaves != 0).any()
