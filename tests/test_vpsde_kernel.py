"""VP-SDE persistent-kernel family (interpret mode on CPU).

``sample_vpsde(score_module=...)`` runs the whole reverse-time VP-SDE
sampling solve — score-net stage evals, β(t) scaling, in-kernel Brownian
tree — in one Pallas program (``fused_sde_solve.py`` 'vpsde' family).
The kernel draws a different noise REALIZATION than the XLA loop (same
law), so the correctness anchor is an analytic one: with the exact score
of N(0, I) data (s(x,t) = −x), the sampler must recover N(0, I).
"""
import jax
import jax.numpy as jnp
import numpy as np

import localregneuralde_tpu.ops.pallas.fused_sde_solve as fs
from localregneuralde_tpu.core.containers import ArrayAndTime, get_array
from localregneuralde_tpu.models.common import TDChain
from localregneuralde_tpu.models.score_sde import sample_vpsde
from localregneuralde_tpu.nn import Chain, Dense
from localregneuralde_tpu.ops.pallas.fused_sde_solve import (
    match_td_score_chain,
    td_score_eval_pure,
)

F, H, B = 8, 16, 64


def _module():
    return TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))


def _neg_identity_score():
    """TDChain params realizing s(x, t) = -x — the exact score when the
    data distribution is N(0, I) (VP-SDE marginals stay N(0, I))."""
    mod = TDChain(Dense(F + 1, F))
    w = jnp.zeros((F + 1, F)).at[:F].set(-jnp.eye(F))
    return mod, {"layer_0": {"w": w, "b": jnp.zeros(F)}}


def test_match_td_score_chain():
    info = match_td_score_chain(_module())
    assert info == ((F, H, F), (True, False), ("layer_0", "layer_1"))
    # declines: wrong activation family, width mismatch (d0 != dL),
    # missing bias, non-TDChain, non-Dense sublayer
    assert match_td_score_chain(
        TDChain(Dense(F + 1, H, "relu"), Dense(H + 1, F))
    ) is None
    assert match_td_score_chain(
        TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F + 2))
    ) is None
    assert match_td_score_chain(
        TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F, use_bias=False))
    ) is None
    assert match_td_score_chain(Chain(Dense(F, F))) is None
    assert match_td_score_chain(TDChain(Chain(Dense(F + 1, F)))) is None


def test_pure_eval_matches_module():
    """td_score_eval_pure (the kernel's math, unpadded) must reproduce the
    TDChain concat convention exactly: last input channel = time, so the
    TD weight's last ROW is the time weight."""
    mod = _module()
    dims, acts, keys = match_td_score_chain(mod)
    params, state = mod.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, F))
    for t in (0.0, 0.37, 1.0):
        y_mod, _ = mod(params, state, ArrayAndTime(x, t))
        y_pure = td_score_eval_pure(params, keys, acts, x, t)
        np.testing.assert_allclose(
            np.asarray(get_array(y_mod)), np.asarray(y_pure), atol=1e-6
        )


def test_kernel_recovers_analytic_gaussian(monkeypatch):
    """End-to-end: with the exact N(0, I) score, kernel-path samples are
    N(0, I); also asserts the persistent kernel actually engaged."""
    mod, params = _neg_identity_score()
    calls = []
    orig = fs.persistent_vpsde_solve

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fs, "persistent_vpsde_solve", counted)
    outs = []
    for i in range(4):
        s, sol = sample_vpsde(
            None, (256, F), jax.random.PRNGKey(i), p=params,
            score_module=mod, rtol=1e-2, atol=1e-2, max_steps=512,
        )
        assert bool(sol.success)
        assert int(sol.naccept) > 3
        # NFE accounting: 1 init drift eval + 4 per attempt; diffusion 4
        natt = int(sol.naccept) + int(sol.nreject)
        assert int(sol.nfe_drift) == 1 + 4 * natt
        assert int(sol.nfe_diffusion) == 4 * natt
        outs.append(np.asarray(s))
    assert len(calls) == 4
    s = np.concatenate(outs).ravel()
    assert abs(s.mean()) < 0.05
    assert abs(s.std() - 1.0) < 0.05


def test_statistics_match_xla_loop():
    """Same module, same tolerance, kernel vs XLA loop: same law (final
    mean/std agree), comparable step counts, different realization."""
    mod, params = _neg_identity_score()
    common = dict(p=params, score_module=mod, rtol=1e-2, atol=1e-2,
                  max_steps=512)
    sk, solk = sample_vpsde(
        None, (256, F), jax.random.PRNGKey(3), use_pallas=True, **common
    )
    sx, solx = sample_vpsde(
        None, (256, F), jax.random.PRNGKey(3), use_pallas=False, **common
    )
    assert bool(solk.success) and bool(solx.success)
    a, b = np.asarray(sk), np.asarray(sx)
    assert not np.array_equal(a, b)  # kernel noise is counter-keyed
    assert abs(a.mean() - b.mean()) < 0.1
    assert abs(a.std() - b.std()) < 0.1
    na, nx = int(solk.naccept), int(solx.naccept)
    assert 0.5 < na / nx < 2.0


def test_gating_declines_cleanly(monkeypatch):
    """Unservable configs fall back to the XLA loop (no kernel call):
    odd batch, milstein solver, and a plain score_fn (no module)."""
    mod, params = _neg_identity_score()
    calls = []
    orig = fs.persistent_vpsde_solve

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fs, "persistent_vpsde_solve", counted)
    # batch not a multiple of 8 declines inside persistent_vpsde_solve
    # (the wrapper IS called, returns None, the XLA loop serves)
    s, sol = sample_vpsde(
        None, (6, F), jax.random.PRNGKey(0), p=params, score_module=mod,
        rtol=5e-2, atol=5e-2, max_steps=256,
    )
    assert bool(sol.success) and len(calls) == 1
    # milstein: the wrapper declines (sri/sosri only); the XLA loop runs
    # (it may not converge at this loose tolerance/cap — not asserted)
    s, sol = sample_vpsde(
        None, (B, F), jax.random.PRNGKey(0), p=params, score_module=mod,
        solver="milstein", rtol=5e-2, atol=5e-2, max_steps=256,
    )
    assert bool(jnp.isfinite(s).all()) and len(calls) == 2
    # plain score_fn (no module): no persistent_fn is even built
    s, sol = sample_vpsde(
        lambda u, t, p: -u, (B, F), jax.random.PRNGKey(0),
        rtol=5e-2, atol=5e-2, max_steps=256,
    )
    assert bool(sol.success) and len(calls) == 2


# ---------------------------------------------------------------------------
# probability-flow ODE sampler on the persistent Tsit5 kernel
# ('pfode' family, fused_solve.py) — deterministic, so unlike the SDE
# sampler the kernel can be checked for direct numerical parity


def test_pf_kernel_matches_xla_loop(monkeypatch):
    import localregneuralde_tpu.ops.pallas.fused_solve as fso
    from localregneuralde_tpu.models.score_sde import (
        sample_probability_flow,
    )

    mod = _module()
    params, _ = mod.init(jax.random.PRNGKey(0))
    calls = []
    orig = fso.persistent_pf_solve

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fso, "persistent_pf_solve", counted)
    common = dict(p=params, score_module=mod, rtol=1e-4, atol=1e-6,
                  max_steps=512)
    sk, solk = sample_probability_flow(
        None, (B, F), jax.random.PRNGKey(2), use_pallas=True, **common
    )
    sx, solx = sample_probability_flow(
        None, (B, F), jax.random.PRNGKey(2), use_pallas=False, **common
    )
    assert len(calls) == 1
    assert bool(solk.success) and bool(solx.success)
    # same ODE, same controller: the accept sequence matches (up to an
    # ulp-level coin flip on the shared error norm — assert within 1)
    assert abs(int(solk.naccept) - int(solx.naccept)) <= 1
    assert abs(int(solk.nfe) - int(solx.nfe)) <= 6
    scale = float(jnp.abs(sx).max())
    np.testing.assert_allclose(
        np.asarray(sk), np.asarray(sx), atol=5e-5 * scale
    )


def test_pf_analytic_gaussian():
    """With the exact N(0, I) score the PF dynamics vanish identically
    (du/dt = -beta/2 (u - u) = 0): samples equal the initial noise."""
    from localregneuralde_tpu.models.score_sde import (
        sample_probability_flow,
    )

    mod, params = _neg_identity_score()
    key = jax.random.PRNGKey(11)
    s, sol = sample_probability_flow(
        None, (B, F), key, p=params, score_module=mod,
        rtol=1e-4, atol=1e-6, max_steps=256,
    )
    assert bool(sol.success)
    u_init = jax.random.normal(key, (B, F))
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(u_init), atol=1e-4
    )


# ---------------------------------------------------------------------------
# sampler fan-out under shard_map (inference-scale parallel sampling):
# each shard runs the persistent sampling kernel on its local sub-batch
# with its own adaptive grid / noise stream


def test_sampler_shardmap_fanout(monkeypatch):
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from jax import lax
    from jax.sharding import Mesh, PartitionSpec as P

    from localregneuralde_tpu.parallel.compat import shard_map_nocheck

    mod, params = _neg_identity_score()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    calls = []
    orig = fs.persistent_vpsde_solve

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fs, "persistent_vpsde_solve", counted)

    def sample_shard(p):
        key = jax.random.fold_in(
            jax.random.PRNGKey(7), lax.axis_index("data")
        )
        s, sol = sample_vpsde(
            None, (32, F), key, p, score_module=mod,
            rtol=3e-2, atol=3e-2, max_steps=256,
        )
        return s, sol.naccept[None], sol.success[None]

    # vma/rep checking off: pallas_call doesn't declare vma (the same
    # setting parallel/shardmap_train.py uses via the shared compat shim)
    mapped = shard_map_nocheck(
        sample_shard, mesh, in_specs=(P(),),
        out_specs=(P("data"), P("data"), P("data")),
    )
    s, naccs, oks = jax.jit(mapped)(params)
    assert len(calls) == 1  # traced once; kernel engaged per shard
    assert s.shape == (32 * 8, F)
    assert bool(jnp.all(oks))
    s = np.asarray(s)
    # per-shard keys: shards draw DIFFERENT samples
    assert not np.array_equal(s[:32], s[32:64])
    # pooled over 256 x F draws, N(0, I) recovery holds
    assert abs(s.mean()) < 0.1
    assert abs(s.std() - 1.0) < 0.1
