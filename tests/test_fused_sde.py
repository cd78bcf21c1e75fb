"""Persistent SDE solve kernel (interpret mode on CPU).

The kernel generates its own Brownian noise (counter-keyed — a different
REALIZATION than the XLA path's threefry tree, same law), so parity tests
are structural/statistical plus an exact-gradient check against a
fixed-grid fixed-noise autodiff replica of the recorded trajectory.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from localregneuralde_tpu.models.neural_sde import NeuralDSDE
from localregneuralde_tpu.nn import Chain, Dense
from localregneuralde_tpu.ops.pallas.fused_sde_solve import (
    _norm_icdf,
    persistent_sde_solve,
)
from localregneuralde_tpu.sde.step import sri_step
from localregneuralde_tpu.sde.tableaus import get_sri_tableau

F, H, B = 32, 64, 64


def _params(key=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    return {
        "drift": {
            "layer_0": {"w": 0.3 * jax.random.normal(k1, (F, H)),
                        "b": jnp.zeros(H)},
            "layer_1": {"w": 0.3 * jax.random.normal(k2, (H, F)),
                        "b": jnp.zeros(F)},
        },
        "diffusion": {"w": 0.05 * jax.random.normal(k3, (F, F)),
                      "b": 0.01 * jnp.ones(F)},
    }


def _fd(u, t, p, st):
    d = p["drift"]
    h = jnp.tanh(u @ d["layer_0"]["w"] + d["layer_0"]["b"])
    return h @ d["layer_1"]["w"] + d["layer_1"]["b"], st


def _gd(u, t, p, st):
    return u @ p["diffusion"]["w"] + p["diffusion"]["b"], st


def test_icdf_moments():
    u = (np.arange(1, 200001) / 200001.0).astype(np.float32)
    x = np.asarray(_norm_icdf(jnp.asarray(u)))
    assert abs(x.mean()) < 1e-3
    assert abs(x.var() - 1.0) < 1e-2


def test_solve_deterministic_and_statistics():
    params = _params()
    u0 = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (B, F))
    kw = dict(
        noise_key=jax.random.PRNGKey(9), rtol=1e-2, atol=1e-2,
        solver="sosri", delta=1 / 6, saveat_arr=jnp.asarray([0.5, 1.0]),
        max_steps=128, record_knots=True,
    )
    out = persistent_sde_solve(params, u0, (0.0, 1.0), **kw)
    assert out is not None and bool(out["success"])
    assert float(out["t_final"]) == 1.0
    assert bool(jnp.isfinite(out["y_final"]).all())
    out2 = persistent_sde_solve(params, u0, (0.0, 1.0), **kw)
    np.testing.assert_array_equal(
        np.asarray(out["y_final"]), np.asarray(out2["y_final"])
    )
    # a different key gives a different realization
    out3 = persistent_sde_solve(
        params, u0, (0.0, 1.0), **{**kw, "noise_key": jax.random.PRNGKey(4)}
    )
    assert not np.array_equal(
        np.asarray(out["y_final"]), np.asarray(out3["y_final"])
    )
    # recorded increments obey Var[dW_j] ~= dt_j (pooled over B x F)
    n = int(out["naccept"])
    kt = np.asarray(out["knot_ts"][: n + 1])
    dts = np.diff(kt)
    dws = np.asarray(out["knot_dws"][:n, :, :F])
    ratios = [dws[j].var() / dts[j] for j in range(n) if dts[j] > 1e-4]
    assert 0.85 < float(np.mean(ratios)) < 1.15
    # knot pads are exact zeros
    assert float(np.abs(np.asarray(out["knot_us"][: n + 1, :, F:])).max()) == 0


def test_knots_reconstruct_their_steps():
    """THE stored-adjoint contract: stepping the XLA sri_step from the
    recorded (u_j, dW_j, dZ_j) over dt_j reproduces u_{j+1}."""
    params = _params(1)
    u0 = 0.5 * jax.random.normal(jax.random.PRNGKey(6), (B, F))
    out = persistent_sde_solve(
        params, u0, (0.0, 1.0), noise_key=jax.random.PRNGKey(9), rtol=1e-2,
        atol=1e-2, solver="sosri", delta=1 / 6,
        saveat_arr=jnp.asarray([1.0]), max_steps=128, record_knots=True,
    )
    n = int(out["naccept"])
    assert n >= 3
    for j in range(n):
        t = out["knot_ts"][j]
        dt = out["knot_ts"][j + 1] - t
        res = sri_step(
            _fd, _gd, out["knot_us"][j][:, :F], t, dt,
            out["knot_dws"][j][:, :F], out["knot_dzs"][j][:, :F],
            params, None, None, 1e-2, 1e-2, 1 / 6,
            tableau=get_sri_tableau("sosri"),
        )
        np.testing.assert_allclose(
            np.asarray(res.u_new),
            np.asarray(out["knot_us"][j + 1][:, :F]), atol=5e-6,
        )


def test_stored_gradients_match_fixed_noise_replica():
    """End-to-end NeuralDSDE stored-adjoint gradients through the
    persistent primal vs jax.grad of a fixed-grid fixed-noise replica of
    the recorded trajectory — the exact discretize-through ground truth.
    (Plain FD is INVALID here: perturbing params moves the adaptive grid,
    which resamples the Hoelder-1/2 Brownian path — the framework fences
    grid/noise by design, as the reference does.)"""
    drift = Chain(Dense(F, H, "tanh"), Dense(H, F))
    diff = Dense(F, F)
    node = NeuralDSDE(
        drift, diff, regularize="none", rtol=1e-2, atol=1e-2,
        max_steps=128, solver="sosri", use_pallas=True,
    )
    assert node._persistent_fn() is not None
    params, state = node.init(jax.random.PRNGKey(0))
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (B, F))

    def loss(p):
        sol, st = node(p, state, x, training=True)
        return jnp.sum(sol.y_final**2)

    l, g = jax.value_and_grad(loss)(params)
    gf, _ = ravel_pytree(g)

    _, noise_key, *_ = jax.random.split(state["rng"], 5)
    out = persistent_sde_solve(
        params, x, (0.0, 1.0), noise_key=noise_key, rtol=1e-2, atol=1e-2,
        solver="sosri", delta=1 / 6, saveat_arr=jnp.asarray([1.0]),
        max_steps=128, record_knots=True,
    )
    n = int(out["naccept"])
    ts = out["knot_ts"][: n + 1]
    dws = out["knot_dws"][:n, :, :F]
    dzs = out["knot_dzs"][:n, :, :F]

    def loss_replica(p):
        u = x
        for j in range(n):
            u = sri_step(
                _fd, _gd, u, ts[j], ts[j + 1] - ts[j], dws[j], dzs[j], p,
                None, None, 1e-2, 1e-2, 1 / 6,
                tableau=get_sri_tableau("sosri"),
            ).u_new
        return jnp.sum(u**2)

    l2, g2 = jax.value_and_grad(loss_replica)(params)
    g2f, _ = ravel_pytree(g2)
    np.testing.assert_allclose(float(l), float(l2), rtol=1e-6)
    scale = float(jnp.max(jnp.abs(g2f)))
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(g2f), atol=1e-5 * scale
    )


def test_eval_statistics_family_vs_xla():
    """Same law, different realization: final-state mean/std must agree
    between the kernel and the XLA loop at matched tolerance."""
    drift = Chain(Dense(F, H, "tanh"), Dense(H, F))
    diff = Dense(F, F)

    def build(up):
        return NeuralDSDE(
            drift, diff, regularize="none", rtol=1e-2, atol=1e-2,
            max_steps=128, solver="sosri", use_pallas=up,
        )

    nk, nx = build(True), build(False)
    params, state = nk.init(jax.random.PRNGKey(0))
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (B, F))
    yk, stk = nk(params, state, x, training=False)
    yx, stx = nx(params, state, x, training=False)
    a, b = np.asarray(yk.y_final), np.asarray(yx.y_final)
    assert abs(a.mean() - b.mean()) < 0.1
    assert abs(a.std() - b.std()) < 0.15
    assert stk["nfe_drift"].dtype == stx["nfe_drift"].dtype


def test_reservoir_sample_is_an_accepted_step_start():
    params = _params(2)
    u0 = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (B, F))
    out = persistent_sde_solve(
        params, u0, (0.0, 1.0), noise_key=jax.random.PRNGKey(9), rtol=1e-2,
        atol=1e-2, solver="sosri", delta=1 / 6,
        saveat_arr=jnp.asarray([1.0]), max_steps=128, record_knots=True,
        reservoir_key=jax.random.PRNGKey(11),
    )
    n = int(out["naccept"])
    ts = np.asarray(out["knot_ts"][:n])  # step-START times (excl. t_end)
    rt = float(out["reservoir_t"])
    idx = int(np.argmin(np.abs(ts - rt)))
    assert abs(ts[idx] - rt) < 1e-6
    np.testing.assert_allclose(
        np.asarray(out["knot_us"][idx, :, :F]),
        np.asarray(out["reservoir_u"]), atol=1e-6,
    )


def test_gating():
    """Only the tanh-MLP diagonal SRI family is served; everything else
    declines to the XLA loop."""
    drift = Chain(Dense(F, H, "tanh"), Dense(H, F))
    diff = Dense(F, F)
    assert NeuralDSDE(
        drift, diff, solver="sosri", use_pallas=True
    )._persistent_fn() is not None
    # knob off
    assert NeuralDSDE(
        drift, diff, solver="sosri", use_pallas=True, use_persistent=False
    )._persistent_fn() is None
    assert NeuralDSDE(drift, diff, solver="sosri")._persistent_fn() is None
    # wrong activation family must NOT be served (shapes alone can't tell)
    drift_relu = Chain(Dense(F, H, "relu"), Dense(H, F))
    assert NeuralDSDE(
        drift_relu, diff, solver="sosri", use_pallas=True
    )._persistent_fn() is None
    # milstein / euler_heun decline
    assert NeuralDSDE(
        drift, diff, solver="milstein", use_pallas=True
    )._persistent_fn() is None
    # non-diagonal noise declines
    diff_m = Dense(F, F * 2)
    assert NeuralDSDE(
        drift, diff_m, solver="milstein", noise_dims=2, use_pallas=True
    )._persistent_fn() is None
    # odd batch declines inside the wrapper
    params = _params()
    u0 = jnp.zeros((6, F))
    assert persistent_sde_solve(
        params, u0, (0.0, 1.0), noise_key=jax.random.PRNGKey(0), rtol=1e-2,
        atol=1e-2, solver="sosri", delta=1 / 6,
        saveat_arr=jnp.asarray([1.0]), max_steps=64,
    ) is None


@pytest.mark.parametrize("regularize", ["unbiased", "biased"])
def test_training_modes_run(regularize):
    drift = Chain(Dense(F, H, "tanh"), Dense(H, F))
    diff = Dense(F, F)
    node = NeuralDSDE(
        drift, diff, regularize=regularize, rtol=1e-2, atol=1e-2,
        max_steps=128, solver="sosri", use_pallas=True,
    )
    params, state = node.init(jax.random.PRNGKey(0))
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (B, F))

    def loss(p):
        sol, st = node(p, state, x, training=True)
        return jnp.sum(sol.y_final**2) + 10.0 * st["reg_val"], st

    (l, st), g = jax.value_and_grad(loss, has_aux=True)(params)
    gf, _ = ravel_pytree(g)
    assert bool(jnp.isfinite(gf).all())
    assert float(st["reg_val"]) > 0.0
    assert bool(st["success"])


def test_uniform_clamp_prevents_icdf_poles():
    """Regression (round-3 TPU bug): the raw 24-bit uniform maximum
    1 - 2^-25 rounds to EXACTLY 1.0f; combined with TPU flush-to-zero of
    the denormal tail guard this produced a NaN normal draw that poisoned
    a dyadic subtree of the Brownian tree (solve froze at tau=15/64).
    The clamp must keep every representable bit pattern strictly inside
    (0, 1) and the ICDF finite."""
    from localregneuralde_tpu.ops.pallas.fused_sde_solve import (
        _bits_to_uniform,
    )

    # the exact poisonous pattern: low 24 bits all ones (after >>8 & mask)
    # 0xFFFFFF00 as int32 is -256 (low-24-bits-of-shift all ones)
    bits = jnp.asarray([0x7FFFFFFF, -1, 0, -256], jnp.int32)
    u = _bits_to_uniform(bits)
    assert float(u.max()) < 1.0
    assert float(u.min()) > 0.0
    e = _norm_icdf(u)
    assert bool(jnp.isfinite(e).all())
    # f32 check that the unclamped max would indeed round to 1.0
    raw = np.float32(0xFFFFFF) * np.float32(2.0**-24) + np.float32(2.0**-25)
    assert raw == np.float32(1.0)
