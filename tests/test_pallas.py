"""Pallas fused-kernel tests (interpreter mode on the CPU mesh; the same
code compiles to Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.core import ArrayAndTime
from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
from localregneuralde_tpu.nn import Dense
from localregneuralde_tpu.ode.step import tsit5_step
from localregneuralde_tpu.ops.pallas.fused_mlp import (
    fused_tdmlp,
    fused_tsit5_step,
)

F, H, B = 32, 16, 8


def _setup():
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    ps, st = td.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, F))
    return td, ps, st, x


def test_fused_tdmlp_matches_tdchain():
    td, ps, st, x = _setup()
    y_ref, _ = td(ps, st, ArrayAndTime(x, jnp.asarray(0.3)))
    y_pal = fused_tdmlp(ps, x, jnp.asarray(0.3))
    np.testing.assert_allclose(
        np.asarray(y_ref.array), np.asarray(y_pal), atol=1e-5
    )


def test_fused_step_matches_generic():
    td, ps, st, x = _setup()

    def f(u, t, p, s):
        y, s2 = td(p, s, ArrayAndTime(u, t))
        return y.array, s2

    k1, _ = f(x, 0.2, ps, st)
    ref = tsit5_step(
        f, x, jnp.asarray(0.2), jnp.asarray(0.05), k1, ps, st
    )
    out = fused_tsit5_step(ps, x, jnp.asarray(0.2), jnp.asarray(0.05), k1)
    u_new, utilde = out[0], out[1]
    ks = (k1,) + tuple(out[2:8])
    g6 = out[8]
    np.testing.assert_allclose(
        np.asarray(ref.u_new), np.asarray(u_new), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.utilde), np.asarray(utilde), atol=1e-6
    )
    for k_ref, k_pal in zip(ref.ks, ks):
        np.testing.assert_allclose(
            np.asarray(k_ref), np.asarray(k_pal), atol=1e-5
        )
    np.testing.assert_allclose(np.asarray(ref.g6), np.asarray(g6), atol=1e-5)


def test_fused_step_gradients():
    _, ps, _, x = _setup()

    def loss(ps):
        out = fused_tsit5_step(
            ps, x, jnp.asarray(0.1), jnp.asarray(0.05),
            fused_tdmlp(ps, x, jnp.asarray(0.1)),
        )
        return jnp.sum(out[0] ** 2)

    def loss_pure(ps):
        from localregneuralde_tpu.ops.pallas.fused_mlp import (
            _pure_step,
            _pure_tdmlp,
        )

        out = _pure_step(
            ps, x, jnp.asarray(0.1), jnp.asarray(0.05),
            _pure_tdmlp(ps, x, jnp.asarray(0.1)),
        )
        return jnp.sum(out[0] ** 2)

    g_pal = jax.grad(loss)(ps)
    g_ref = jax.grad(loss_pure)(ps)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_pal), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_neural_ode_pallas_end_to_end():
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    results = {}
    for up in (False, True):
        node = NeuralODE(
            td, regularize="unbiased", rtol=1e-3, atol=1e-5,
            max_steps=32, checkpoint_every=8, use_pallas=up,
        )
        ps, st = node.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, F))

        def loss(ps):
            sol, st_ = node(ps, st, x, training=True)
            return (
                jnp.sum(diffeqsol_to_array(sol)) + st_["reg_val"],
                st_["nfe"],
            )

        (val, nfe), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(ps)
        gl = np.concatenate(
            [np.ravel(np.asarray(v)) for v in jax.tree_util.tree_leaves(g)]
        )
        results[up] = (float(val), int(nfe), gl)
    assert abs(results[False][0] - results[True][0]) < 1e-3
    assert results[False][1] == results[True][1]  # identical NFE path
    np.testing.assert_allclose(results[False][2], results[True][2], atol=2e-2)
