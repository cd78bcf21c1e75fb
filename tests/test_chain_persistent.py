"""Persistent solve/sweep kernels for the autonomous Dense-chain family
(latent-ODE gen dynamics, reference ``construct.jl:241-245``) — interpret
mode on the CPU mesh.

Parity target: the XLA adaptive loop / XLA stored sweep on the same
dynamics; end-to-end gradients through ``NeuralODE(use_pallas=True)``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localregneuralde_tpu.core import ArrayAndTime
from localregneuralde_tpu.models import NeuralODE
from localregneuralde_tpu.nn import Chain, Dense
from localregneuralde_tpu.nn.basic import Lambda
from localregneuralde_tpu.ode.solve import odesolve
from localregneuralde_tpu.ops.pallas.fused_solve import (
    match_dense_chain,
    persistent_chain_solve,
)

F, H, B = 6, 10, 8
RTOL = ATOL = 1e-3


def _gen_chain():
    return Chain(
        Lambda(jnp.tanh),
        Dense(F, H, "tanh"),
        Dense(H, F, "tanh"),
        Dense(F, H, "tanh"),
        Dense(H, F, "tanh"),
    )


def _setup(seed=0):
    gen = _gen_chain()
    ps, st = gen.init(jax.random.PRNGKey(seed))
    x = 0.8 * jax.random.normal(jax.random.PRNGKey(seed + 1), (B, F))
    return gen, ps, st, x


def _xla_solve(gen, ps, st, x, **kw):
    def f(u, t, p, s):
        y, s2 = gen(p, s, ArrayAndTime(u, t))
        return y.array, s2

    return odesolve(
        f, x, (0.0, 1.0), ps, rtol=RTOL, atol=ATOL, max_steps=64,
        adjoint="none", stateful=True, f_state=st, **kw,
    )


def test_chain_matches_xla_loop():
    gen, ps, st, x = _setup()
    info = match_dense_chain(gen)
    assert info is not None
    ref = _xla_solve(gen, ps, st, x)
    out = persistent_chain_solve(
        ps, info, x, (0.0, 1.0), rtol=RTOL, atol=ATOL,
        saveat_arr=jnp.asarray([1.0]), max_steps=64,
    )
    assert out is not None
    np.testing.assert_allclose(
        np.asarray(ref.y_final), np.asarray(out["y_final"]), atol=2e-4
    )
    assert abs(int(out["naccept"]) - int(ref.naccept)) <= 1
    assert abs(int(out["nfe"]) - int(ref.nfe)) <= 12
    assert bool(out["success"])


def test_chain_saveat_grid():
    """The latent family's signature shape: a dense saveat GRID (the
    PhysioNet 49-point grid; 7 points here)."""
    gen, ps, st, x = _setup(seed=2)
    info = match_dense_chain(gen)
    grid = jnp.linspace(0.0, 1.0, 7)
    ref = _xla_solve(gen, ps, st, x, saveat=grid)
    out = persistent_chain_solve(
        ps, info, x, (0.0, 1.0), rtol=RTOL, atol=ATOL,
        saveat_arr=grid, max_steps=64,
    )
    np.testing.assert_allclose(
        np.asarray(ref.ys), np.asarray(out["ys"]), atol=5e-4
    )


@pytest.mark.parametrize("knot_window", [None, 6])
def test_chain_end_to_end_grads(knot_window):
    """Stored-adjoint gradients through NeuralODE(use_pallas=True) match
    the all-XLA path — dense (knot_window=None) and two-level windowed
    replay (knot_window=6 < naccept)."""
    grid = jnp.linspace(0.0, 1.0, 5)
    grads = {}
    for up in (False, True):
        gen = _gen_chain()
        node = NeuralODE(
            gen, regularize="none", rtol=RTOL, atol=ATOL, max_steps=64,
            saveat=grid, adjoint="stored", use_pallas=up,
            use_persistent=up, knot_window=knot_window,
        )
        if up:
            assert node._pallas_family == "chain"
        params, state = node.init(jax.random.PRNGKey(0))
        x = 0.8 * jax.random.normal(jax.random.PRNGKey(1), (B, F))
        w = jnp.arange(1, 5 * B * F + 1, dtype=jnp.float32).reshape(
            5, B, F
        ) * 1e-3

        def loss(p):
            sol, st = node(p, state, x, training=True)
            return jnp.sum(sol.ys * w) + jnp.sum(jnp.tanh(sol.y_final))

        grads[up] = jax.grad(loss)(params)

    for a, b in zip(
        jax.tree_util.tree_leaves(grads[False]),
        jax.tree_util.tree_leaves(grads[True]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )


def test_chain_family_gating():
    """Non-matching dynamics still raise with use_pallas=True; the TDChain
    family is untouched by the chain addition."""
    from localregneuralde_tpu.models import TDChain

    bad = Chain(Dense(F, H, "relu"), Dense(H, F))
    with pytest.raises(ValueError):
        NeuralODE(bad, use_pallas=True)

    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(td, use_pallas=True)
    assert node._pallas_family == "mlp"
