"""Fused conv Tsit5 step kernel (interpreter mode on CPU).

Parity target: the generic ``tsit5_step`` over the XLA TDChain conv
dynamics (concat-free TD convs + training-mode BatchNorm), which is also
the kernel's VJP twin.
"""
import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.core import ArrayAndTime
from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
from localregneuralde_tpu.nn import (
    BatchNorm, Chain, Conv, Dense, Flatten, WrappedFunction,
)
from localregneuralde_tpu.ode.step import tsit5_step
from localregneuralde_tpu.ops.pallas.fused_conv import (
    conv_step_apply, make_fused_conv_step, match_conv_family,
)

B, H, W, Cs, Ch = 4, 8, 8, 8, 16


def _dynamics():
    return TDChain(
        Chain(Conv((3, 3), Cs + 1, Ch, use_bias=False),
              BatchNorm(Ch, "gelu")),
        Chain(Conv((3, 3), Ch + 1, Ch, use_bias=False),
              BatchNorm(Ch, "gelu")),
        Conv((3, 3), Ch + 1, Cs, use_bias=False),
    )


def _setup(seed=0):
    td = _dynamics()
    ps, st = td.init(jax.random.PRNGKey(seed))
    u = 0.5 * jax.random.normal(jax.random.PRNGKey(seed + 1), (B, H, W, Cs))
    return td, ps, st, u


def _xla_step(td, ps, st, u, t, dt, k1, training=True):
    def f(x, s, p, stt):
        y, st2 = td(p, stt, ArrayAndTime(x, s), training=training)
        return y.array, st2

    return tsit5_step(f, u, jnp.float32(t), jnp.float32(dt), k1, ps, st)


def test_match_conv_family():
    spec = match_conv_family(_dynamics())
    assert spec is not None and spec.Cs == Cs and spec.Ch == Ch
    from localregneuralde_tpu.nn import Dense as D

    assert match_conv_family(TDChain(D(Cs + 1, Cs))) is None


def test_step_matches_xla_training():
    td, ps, st, u = _setup()
    spec = match_conv_family(td)

    def f(x, s, p, stt):
        y, st2 = td(p, stt, ArrayAndTime(x, s), training=True)
        return y.array, st2

    k1, _ = f(u, jnp.float32(0.2), ps, st)
    ref = _xla_step(td, ps, st, u, 0.2, 0.07, k1)
    out = conv_step_apply(
        spec, ps, st, u, jnp.float32(0.2), jnp.float32(0.07), k1,
        training=True,
    )
    u_new, utilde, ks, g6, new_state = out
    np.testing.assert_allclose(
        np.asarray(ref.u_new), np.asarray(u_new), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref.utilde), np.asarray(utilde), atol=2e-5
    )
    for kr, kp in zip(ref.ks, ks):
        np.testing.assert_allclose(np.asarray(kr), np.asarray(kp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.g6), np.asarray(g6), atol=2e-5)
    # BN running-stat threading matches the sequential XLA updates
    for nm in ("layer_0", "layer_1"):
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(ref.f_state[nm]["layer_1"][k]),
                np.asarray(new_state[nm]["layer_1"][k]),
                atol=1e-5,
            )


def test_step_matches_xla_eval_mode():
    td, ps, st, u = _setup(seed=3)
    spec = match_conv_family(td)
    # give the running stats non-trivial values
    st = jax.tree_util.tree_map(lambda a: a + 0.1 if a.ndim else a, st)

    def f(x, s, p, stt):
        y, st2 = td(p, stt, ArrayAndTime(x, s), training=False)
        return y.array, st2

    k1, _ = f(u, jnp.float32(0.1), ps, st)
    ref = _xla_step(td, ps, st, u, 0.1, 0.05, k1, training=False)
    out = conv_step_apply(
        spec, ps, st, u, jnp.float32(0.1), jnp.float32(0.05), k1,
        training=False,
    )
    np.testing.assert_allclose(
        np.asarray(ref.u_new), np.asarray(out[0]), atol=2e-5
    )


def test_step_gradients_match_twin():
    td, ps, st, u = _setup(seed=5)
    spec = match_conv_family(td)
    step = make_fused_conv_step(td, spec)

    def f(x, s, p, stt):
        y, st2 = td(p, stt, ArrayAndTime(x, s), training=True)
        return y.array, st2

    k1, _ = f(u, jnp.float32(0.0), ps, st)

    def loss_fused(p, uu, kk):
        res = step(None, uu, jnp.float32(0.0), jnp.float32(0.1), kk, p, None)
        return (
            jnp.sum(res.u_new * jnp.cos(res.u_new))
            + jnp.sum(res.utilde**2) * 50.0
            + jnp.sum(res.ks[6] * 0.1)
        )

    def loss_xla(p, uu, kk):
        res = _xla_step(td, p, st, uu, 0.0, 0.1, kk)
        return (
            jnp.sum(res.u_new * jnp.cos(res.u_new))
            + jnp.sum(res.utilde**2) * 50.0
            + jnp.sum(res.ks[6] * 0.1)
        )

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(ps, u, k1)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(ps, u, k1)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_x)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
        )


def _conv_model(use_pallas):
    node = NeuralODE(
        _dynamics(), regularize="unbiased", rtol=1e-3, atol=1e-3,
        max_steps=32, adjoint="stored", use_pallas=use_pallas,
    )
    return Chain(
        neural_ode=node,
        sol_to_arr=WrappedFunction(diffeqsol_to_array),
        flat=Flatten(),
        classifier=Dense(H * W * Cs, 10),
    )


def test_neural_ode_conv_pallas_end_to_end():
    """Full conv NeuralODE train forward+grad: fused path vs XLA path."""
    m_ref = _conv_model(False)
    m_pal = _conv_model(True)
    params, state = m_ref.init(jax.random.PRNGKey(0))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (B, H, W, Cs))

    def loss(m):
        def run(p):
            y, st_ = m(p, state, x, training=True)
            return jnp.sum(y**2) + 5.0 * st_["neural_ode"]["reg_val"], st_

        return run

    (l_r, st_r), g_r = jax.value_and_grad(loss(m_ref), has_aux=True)(params)
    (l_p, st_p), g_p = jax.value_and_grad(loss(m_pal), has_aux=True)(params)
    np.testing.assert_allclose(float(l_r), float(l_p), rtol=1e-3)
    assert (
        abs(int(st_r["neural_ode"]["nfe"]) - int(st_p["neural_ode"]["nfe"]))
        <= 12
    )
    r_flat, _ = jax.flatten_util.ravel_pytree(g_r)
    p_flat, _ = jax.flatten_util.ravel_pytree(g_p)
    scale = float(jnp.max(jnp.abs(r_flat)))
    np.testing.assert_allclose(
        np.asarray(p_flat), np.asarray(r_flat), atol=1e-2 * scale
    )
    # eval mode (running-stat BN) also agrees
    y_r, _ = m_ref(params, state, x, training=False)
    y_p, _ = m_pal(params, state, x, training=False)
    np.testing.assert_allclose(
        np.asarray(y_r), np.asarray(y_p), atol=2e-3
    )


def test_hand_bwd_matches_twin_bwd():
    """The hand-fused conv backward kernel vs the XLA twin transpose."""
    td, ps, st, u = _setup(seed=7)
    spec = match_conv_family(td)
    step_hand = make_fused_conv_step(td, spec, hand_bwd=True)
    step_twin = make_fused_conv_step(td, spec, hand_bwd=False)

    def f(x, s, p, stt):
        y, st2 = td(p, stt, ArrayAndTime(x, s), training=True)
        return y.array, st2

    k1, _ = f(u, jnp.float32(0.1), ps, st)

    def loss(stepper):
        def run(p, uu, kk):
            res = stepper(
                None, uu, jnp.float32(0.1), jnp.float32(0.08), kk, p, None
            )
            w = jnp.cos(res.u_new)
            return (
                jnp.sum(res.u_new * w)
                + 30.0 * jnp.sum(res.utilde**2)
                + jnp.sum(res.ks[3] * 0.2)
                + jnp.sum(res.ks[6] * 0.1)
            )

        return run

    g_h = jax.grad(loss(step_hand), argnums=(0, 1, 2))(ps, u, k1)
    g_t = jax.grad(loss(step_twin), argnums=(0, 1, 2))(ps, u, k1)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_h), jax.tree_util.tree_leaves(g_t)
    ):
        sc = max(float(jnp.max(jnp.abs(b))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3 * sc, rtol=2e-3
        )
