"""Non-diagonal (matrix) commutative-noise Milstein: strong convergence vs
an analytic solution, adaptive-solve plumbing, NFE accounting, and the
NeuralDSDE matrix-diffusion option (reference perform_step.jl:126-160 and
the utils.jl:69-74 reshape shim)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from localregneuralde_tpu.sde.solve import sdesolve
from localregneuralde_tpu.sde.step import milstein_commute_step_nondiag

# linear commutative system: du_i = mu*u_i dt + u_i * sum_j sigma_j dW_j
# (each diffusion column is proportional to u ⇒ columns commute); the exact
# solution is per-component geometric: u(T) = u0*exp((mu-|sigma|^2/2)T + sigma.W(T))
MU = 0.5
SIGMA = np.array([0.3, 0.2], np.float32)
D, M = 2, 2


def _f(u, t, p, st):
    return MU * u, st


def _g(u, t, p, st):
    return u[..., :, None] * jnp.asarray(SIGMA)[None, :], st


def _fixed_step_final(u0, T, n, key):
    dt = jnp.asarray(T / n, jnp.float32)
    dWs = jax.random.normal(key, (n, M), jnp.float32) * jnp.sqrt(dt)

    def body(u, dW):
        res = milstein_commute_step_nondiag(
            _f, _g, u, jnp.asarray(0.0), dt, dW, None, None, None,
            1e-2, 1e-2,
        )
        return res.u_new, None

    u_fin, _ = lax.scan(body, u0, dWs)
    return u_fin, dWs.sum(axis=0)


def test_strong_order_one_on_commutative_matrix_noise():
    """Milstein on commutative matrix noise is strong order 1.0: quartering
    dt must cut the strong error ~4x (slope ≥ 0.8 across two octaves)."""
    u0 = jnp.asarray([1.0, 2.0], jnp.float32)
    T = 1.0
    n_paths = 256
    keys = jax.random.split(jax.random.PRNGKey(7), n_paths)

    def errs_for(n):
        def one(key):
            u_fin, W_T = _fixed_step_final(u0, T, n, key)
            exact = u0 * jnp.exp(
                (MU - 0.5 * float(np.sum(SIGMA ** 2))) * T
                + jnp.sum(jnp.asarray(SIGMA) * W_T)
            )
            return jnp.sqrt(jnp.sum((u_fin - exact) ** 2))

        return float(jnp.mean(jax.jit(jax.vmap(one))(keys)))

    # coarsen the SAME driving path: key fixed per path, increments summed
    # implicitly by regenerating at each resolution is NOT the same path, so
    # instead compare mean strong error at geometric resolutions (standard
    # independent-path estimate; with 256 paths the slope is stable).
    e16 = float(errs_for(16))
    e64 = float(errs_for(64))
    e256 = float(errs_for(256))
    slope1 = np.log(e16 / e64) / np.log(4.0)
    slope2 = np.log(e64 / e256) / np.log(4.0)
    assert e16 > e64 > e256
    assert slope1 > 0.8 and slope2 > 0.8, (e16, e64, e256, slope1, slope2)


def test_ito_correction_matters():
    """Without the Itô J −= dt/2·I correction the scheme converges to the
    Stratonovich solution — the error vs the Itô analytic solution plateaus.
    Guards the correction branch."""
    u0 = jnp.asarray([1.0, 2.0], jnp.float32)
    T = 1.0
    keys = jax.random.split(jax.random.PRNGKey(3), 256)

    def err_strat(n):
        dt = jnp.asarray(T / n, jnp.float32)

        def one(key):
            dWs = jax.random.normal(key, (n, M), jnp.float32) * jnp.sqrt(dt)

            def body(u, dW):
                res = milstein_commute_step_nondiag(
                    _f, _g, u, jnp.asarray(0.0), dt, dW, None, None, None,
                    1e-2, 1e-2, interpretation="stratonovich",
                )
                return res.u_new, None

            u_fin, _ = lax.scan(body, u0, dWs)
            exact = u0 * jnp.exp(
                (MU - 0.5 * float(np.sum(SIGMA ** 2))) * T
                + jnp.sum(jnp.asarray(SIGMA) * dWs.sum(0))
            )
            return jnp.sqrt(jnp.sum((u_fin - exact) ** 2))

        return float(jnp.mean(jax.jit(jax.vmap(one))(keys)))

    # Stratonovich-mode solution differs from the Itô analytic limit by a
    # deterministic exp(|sigma|^2 T/2) factor ≈ 6.7% here — the fine-dt
    # error must stay above half that gap instead of vanishing.
    e = float(err_strat(256))
    gap = float(
        jnp.linalg.norm(
            u0 * np.exp((MU - 0.5 * np.sum(SIGMA ** 2)) * 1.0)
            * (np.exp(0.5 * np.sum(SIGMA ** 2)) - 1.0)
        )
    )
    assert e > 0.3 * gap


def test_sdesolve_nondiag_plumbs_and_counts_nfe():
    u0 = jnp.ones((4, D), jnp.float32)

    def f(u, t, p):
        return MU * u

    def g(u, t, p):
        return u[..., :, None] * jnp.asarray(SIGMA)[None, :]

    sol = sdesolve(
        f, g, u0, (0.0, 1.0), None, noise_key=jax.random.PRNGKey(0),
        rtol=1e-1, atol=1e-1, solver="milstein", max_steps=256,
        adjoint="none", noise_shape=(4, M),
    )
    assert bool(sol.success)
    assert np.isfinite(np.asarray(sol.y_final)).all()
    att = int(sol.naccept) + int(sol.nreject)
    assert int(sol.nfe_drift) == 1 + att  # init probe + 1/attempt
    assert int(sol.nfe_diffusion) == att * (1 + M)

    with pytest.raises(ValueError):
        sdesolve(
            f, g, u0, (0.0, 1.0), None, noise_key=jax.random.PRNGKey(0),
            solver="sri", noise_shape=(4, M), adjoint="none",
        )


def test_neural_dsde_nondiagonal_forward_and_grad():
    from localregneuralde_tpu.models.neural_sde import NeuralDSDE
    from localregneuralde_tpu.models import diffeqsol_to_array
    from localregneuralde_tpu.nn import Chain, Dense

    Dm, Mm, B = 6, 3, 4
    drift = Chain(Dense(Dm, 16, "tanh"), Dense(16, Dm))
    diffusion = Dense(Dm, Dm * Mm)  # emits the (d·m) matrix rows
    node = NeuralDSDE(
        drift, diffusion, solver="milstein", noise_dims=Mm,
        regularize="unbiased", rtol=1e-1, atol=1e-1, max_steps=128,
        adjoint="direct", checkpoint_every=8,
    )
    ps, st = node.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Dm)) * 0.5

    def loss(ps, x):
        sol, st_ = node(ps, st, x, training=True)
        return jnp.sum(diffeqsol_to_array(sol)) + st_["reg_val"], st_

    (val, st_), (gp, gx) = jax.jit(
        jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)
    )(ps, x)
    assert np.isfinite(float(val))
    leaves = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(gp)]
    )
    assert np.isfinite(leaves).all() and (leaves != 0).any()
    assert np.isfinite(np.asarray(gx)).all()
    assert float(st_["reg_val"]) >= 0.0
    assert int(st_["nfe_drift"]) > 0 and int(st_["nfe_diffusion"]) > 0

    # sri + noise_dims is rejected up front
    with pytest.raises(ValueError):
        NeuralDSDE(drift, diffusion, solver="sri", noise_dims=Mm)


def test_neural_dsde_nondiag_stored_matches_direct():
    from localregneuralde_tpu.models.neural_sde import NeuralDSDE
    from localregneuralde_tpu.models import diffeqsol_to_array
    from localregneuralde_tpu.nn import Chain, Dense

    Dm, Mm, B = 4, 2, 3
    drift = Chain(Dense(Dm, 8, "tanh"), Dense(8, Dm))
    diffusion = Dense(Dm, Dm * Mm)

    def make(adjoint):
        return NeuralDSDE(
            drift, diffusion, solver="milstein", noise_dims=Mm,
            regularize="none", rtol=1e-1, atol=1e-1, max_steps=128,
            adjoint=adjoint, checkpoint_every=8,
        )

    node_s, node_d = make("stored"), make("direct")
    ps, st = node_s.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Dm)) * 0.5

    def loss(node):
        def inner(ps, x):
            sol, _ = node(ps, st, x, training=True)
            return jnp.sum(diffeqsol_to_array(sol))

        return inner

    gs = jax.jit(jax.grad(loss(node_s), argnums=(0, 1)))(ps, x)
    gd = jax.jit(jax.grad(loss(node_d), argnums=(0, 1)))(ps, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gd)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_nondiagonal_reachable_from_config():
    """model.sde_noise_dims + sde_solver plumb through the harness to a
    matrix-diffusion NeuralDSDE."""
    import localregneuralde_tpu.harness.construct as C
    from localregneuralde_tpu.harness import ExperimentConfig

    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.sde = True
    cfg.model.sde_solver = "milstein"
    cfg.model.sde_noise_dims = 3
    cfg.model.image_size = [8, 8]
    cfg.model.in_channels = 1
    cfg.model.solver.abstol = 1e-1
    cfg.model.solver.reltol = 1e-1
    cfg.model.solver.max_steps = 128
    model = C.construct_model(cfg)
    node = model.layers["neural_dsde"]
    assert node.solver == "milstein" and node.noise_dims == 3
    ps, st = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 1))
    y, st_ = model(ps, st, x, training=True)
    assert np.isfinite(np.asarray(y)).all()
    assert int(st_["neural_dsde"]["nfe_diffusion"]) > 0
