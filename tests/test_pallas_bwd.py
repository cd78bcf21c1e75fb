"""Fused backward-kernel parity: every exposed gradient matches the
pure-twin VJP; the zero (t, dt) cotangents are proven harmless end-to-end
by tests/test_pallas.py::test_neural_ode_pallas_end_to_end."""
import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.models import TDChain
from localregneuralde_tpu.nn import Dense
from localregneuralde_tpu.ops.pallas.fused_mlp import _pure_step, _pure_tdmlp
from localregneuralde_tpu.ops.pallas.fused_mlp_bwd import fused_step_bwd


def test_bwd_kernel_matches_pure_vjp():
    F, H, B = 32, 16, 8
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    ps, _ = td.init(jax.random.PRNGKey(0))
    u = jax.random.normal(jax.random.PRNGKey(1), (B, F))
    t, dt = jnp.float32(0.2), jnp.float32(0.05)
    k1 = _pure_tdmlp(ps, u, t)
    cts = tuple(
        jax.random.normal(k, (B, F))
        for k in jax.random.split(jax.random.PRNGKey(2), 9)
    )

    _, vjp = jax.vjp(_pure_step, ps, u, t, dt, k1)
    d_ps_ref, d_u_ref, _, _, d_k1_ref = vjp(cts)
    d_ps, d_u, d_t, d_dt, d_k1 = fused_step_bwd(ps, u, t, dt, k1, cts)

    np.testing.assert_allclose(
        np.asarray(d_u), np.asarray(d_u_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_k1), np.asarray(d_k1_ref), rtol=1e-4, atol=1e-5
    )
    for layer in ("layer_0", "layer_1"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(d_ps[layer][leaf]),
                np.asarray(d_ps_ref[layer][leaf]),
                rtol=1e-4, atol=1e-5,
            )
    # controller-fenced outputs: kernel returns exact zeros
    assert float(d_t) == 0.0 and float(d_dt) == 0.0
