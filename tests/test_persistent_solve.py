"""Persistent-loop Pallas solve kernel (interpreter mode on CPU).

Parity target: the XLA adaptive loop (``ode/solve.py``) on the fused
TD-MLP dynamics family — trajectories, saveat interpolation, NFE stats,
knot recording, reservoir sampling, and end-to-end stored-adjoint
gradients through ``NeuralODE(use_pallas=True)``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localregneuralde_tpu.core import ArrayAndTime
from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
from localregneuralde_tpu.nn import Chain, Dense, WrappedFunction
from localregneuralde_tpu.ode.solve import odesolve
from localregneuralde_tpu.ops.pallas.fused_solve import persistent_tsit5_solve

F, H, B = 32, 16, 8
RTOL = ATOL = 1e-4


def _setup(seed=0):
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    ps, st = td.init(jax.random.PRNGKey(seed))
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(seed + 1), (B, F))
    return td, ps, st, x


def _xla_solve(td, ps, st, x, **kw):
    """XLA adaptive loop with the fused PER-STEP kernel: identical stage
    math to the persistent kernel (the generic jnp step differs at the %
    level in the cancelling ũ sum, which is rounding noise amplified —
    not a valid parity reference for the accept sequence)."""
    from localregneuralde_tpu.ode.step import Tsit5StepResult
    from localregneuralde_tpu.ops.pallas.fused_mlp import fused_tsit5_step

    def f(u, t, p, s):
        y, s2 = td(p, s, ArrayAndTime(u, t))
        return y.array, s2

    def step(fn, u, t, dt, k1, p, f_st):
        u_new, utilde, k2, k3, k4, k5, k6, k7, g6 = fused_tsit5_step(
            p, u, t, dt, k1
        )
        return Tsit5StepResult(
            u_new, utilde, (k1, k2, k3, k4, k5, k6, k7), g6, f_st
        )

    return odesolve(
        f, x, (0.0, 1.0), ps, rtol=RTOL, atol=ATOL, max_steps=64,
        adjoint="none", stateful=True, f_state=st, step_fn=step, **kw,
    )


def test_matches_xla_loop_final_state():
    """Trajectory parity. eest is a CANCELLING sum: when the step error is
    far below tolerance, ulp-level implementation differences legitimately
    move dt proposals by ~1%, so step sequences need not be identical —
    final states must agree to solver accuracy and step counts closely."""
    td, ps, st, x = _setup()
    ref = _xla_solve(td, ps, st, x)
    out = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=RTOL, atol=ATOL,
        saveat_arr=jnp.asarray([1.0]), max_steps=64,
    )
    np.testing.assert_allclose(
        np.asarray(ref.y_final), np.asarray(out["y_final"]), atol=2e-4
    )
    assert abs(int(out["naccept"]) - int(ref.naccept)) <= 1
    assert abs(int(out["nfe"]) - int(ref.nfe)) <= 12
    assert bool(out["success"])
    np.testing.assert_allclose(
        float(out["t_final"]), float(ref.t_final), atol=1e-6
    )


def test_saveat_interpolation_unsorted():
    td, ps, st, x = _setup(seed=3)
    saveat = jnp.asarray([0.7, 0.1, 1.0, 0.0, 0.35])
    ref = _xla_solve(td, ps, st, x, saveat=saveat)
    out = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=RTOL, atol=ATOL,
        saveat_arr=saveat, max_steps=64,
    )
    np.testing.assert_allclose(
        np.asarray(ref.ys), np.asarray(out["ys"]), atol=3e-4
    )


def test_knots_reconstruct_their_steps():
    """THE contract the stored-adjoint backward relies on: consecutive
    knots (t_i, u_i, k1_i) must exactly describe one accepted step —
    stepping with the fused per-step kernel from knot i over
    dt = t_{i+1} − t_i reproduces (u_{i+1}, k1_{i+1})."""
    from localregneuralde_tpu.ops.pallas.fused_mlp import fused_tsit5_step

    td, ps, st, x = _setup(seed=5)
    out = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=RTOL, atol=ATOL,
        saveat_arr=jnp.asarray([1.0]), max_steps=64, record_knots=True,
    )
    n = int(out["naccept"])
    assert n >= 3
    ts = np.asarray(out["knot_ts"][: n + 1])
    assert np.all(np.diff(ts) > 0) and ts[0] == 0.0 and ts[-1] == 1.0
    # knots are returned feature-PADDED (lane-aligned DMA); pad is zeros
    k_us = out["knot_us"][:, :, :F]
    k_ks = out["knot_ks"][:, :, :F]
    assert float(jnp.abs(out["knot_us"][: n + 1, :, F:]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(k_us[0]), np.asarray(x), atol=0)
    np.testing.assert_allclose(
        np.asarray(k_us[n]), np.asarray(out["y_final"]), atol=0
    )
    for i in range(n):
        t_i = out["knot_ts"][i]
        dt_i = out["knot_ts"][i + 1] - t_i
        res = fused_tsit5_step(ps, k_us[i], t_i, dt_i, k_ks[i])
        np.testing.assert_allclose(
            np.asarray(k_us[i + 1]), np.asarray(res[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(k_ks[i + 1]), np.asarray(res[7]), atol=1e-6
        )


def test_reservoir_sample_is_an_accepted_step_start():
    td, ps, st, x = _setup(seed=7)
    out = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=RTOL, atol=ATOL,
        saveat_arr=jnp.asarray([1.0]), max_steps=64, record_knots=True,
        reservoir_key=jax.random.PRNGKey(11),
    )
    n = int(out["naccept"])
    ts = np.asarray(out["knot_ts"][:n])  # step-START times (excl. t_end)
    rt = float(out["reservoir_t"])
    idx = int(np.argmin(np.abs(ts - rt)))
    assert abs(ts[idx] - rt) < 1e-6
    np.testing.assert_allclose(
        np.asarray(out["knot_us"][idx, :, :F]),
        np.asarray(out["reservoir_u"]),
        atol=1e-6,
    )


def _flagship(use_persistent):
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(
        td, regularize="unbiased", rtol=RTOL, atol=ATOL, max_steps=64,
        use_pallas=True, use_persistent=use_persistent,
    )
    return Chain(
        neural_ode=node,
        sol_to_arr=WrappedFunction(diffeqsol_to_array),
        classifier=Dense(F, 10),
    )


@pytest.mark.parametrize("regularize", ["unbiased", "biased"])
def test_neural_ode_persistent_grads_match(regularize):
    """End-to-end: stored-adjoint training grads with the persistent
    primal match the per-step-kernel path (identical backward — the
    persistent kernel only replaces the fenced forward)."""
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (B, F))

    def build(up):
        node = NeuralODE(
            td, regularize=regularize, rtol=RTOL, atol=ATOL, max_steps=64,
            use_pallas=True, use_persistent=up,
        )
        return Chain(
            neural_ode=node,
            sol_to_arr=WrappedFunction(diffeqsol_to_array),
            classifier=Dense(F, 10),
        )

    m_ref = build(False)
    m_per = build(True)
    params, state = m_ref.init(jax.random.PRNGKey(0))

    def loss(m):
        def run(p):
            y, st_ = m(p, state, x, training=True)
            return jnp.sum(y**2) + 10.0 * st_["neural_ode"]["reg_val"], st_

        return run

    (l_ref, st_ref), g_ref = jax.value_and_grad(loss(m_ref), has_aux=True)(
        params
    )
    (l_per, st_per), g_per = jax.value_and_grad(loss(m_per), has_aux=True)(
        params
    )
    if regularize == "unbiased":
        # same t1 (same rng path); trajectories agree to solver accuracy
        # (step sequences may differ by rounding-noise dt proposals — see
        # test_matches_xla_loop_final_state)
        np.testing.assert_allclose(float(l_ref), float(l_per), rtol=1e-3)
        assert (
            abs(
                int(st_ref["neural_ode"]["nfe"])
                - int(st_per["neural_ode"]["nfe"])
            )
            <= 12
        )
        # step sequences differ by rounding-noise dt proposals, so grads
        # carry trajectory noise; strict parity on identical knots is
        # asserted by test_persistent_sweep_matches_xla_sweep
        r_flat, _ = jax.flatten_util.ravel_pytree(g_ref)
        p_flat, _ = jax.flatten_util.ravel_pytree(g_per)
        scale = float(jnp.max(jnp.abs(r_flat)))
        np.testing.assert_allclose(
            np.asarray(p_flat), np.asarray(r_flat), atol=1e-2 * scale
        )
    else:
        # biased: reservoir draws differ (different RNG realization), so
        # only the main-solve quantities match
        assert bool(st_per["neural_ode"]["success"])
        flat, _ = jax.flatten_util.ravel_pytree(g_per)
        assert np.all(np.isfinite(np.asarray(flat)))


def test_eval_mode_uses_persistent_and_matches():
    m_ref = _flagship(False)
    m_per = _flagship(True)
    params, state = m_ref.init(jax.random.PRNGKey(0))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (B, F))
    y_ref, st_ref = m_ref(params, state, x, training=False)
    y_per, st_per = m_per(params, state, x, training=False)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_per), atol=5e-5
    )
    assert int(st_ref["neural_ode"]["nfe"]) == int(st_per["neural_ode"]["nfe"])


def test_persistent_sweep_matches_xla_sweep():
    """Stored-adjoint gradients: whole-sweep Pallas kernel vs the XLA
    while-loop sweep, on IDENTICAL knots (same forward), with saveat
    cotangents on two output times."""
    from jax.flatten_util import ravel_pytree

    from localregneuralde_tpu.ode.step import Tsit5StepResult
    from localregneuralde_tpu.ops.pallas.fused_mlp import fused_tsit5_step
    from localregneuralde_tpu.ops.pallas.fused_mlp_bwd import fused_step_bwd
    from localregneuralde_tpu.ops.pallas.fused_solve_bwd import (
        persistent_stored_sweep,
    )

    td, ps, st, x = _setup(seed=9)
    saveat = jnp.asarray([0.37, 1.0])

    def f(u, t, p, s):
        y, s2 = td(p, s, ArrayAndTime(u, t))
        return y.array, s2

    def step(fn, u, t, dt, k1, p, f_st):
        out = fused_tsit5_step(p, u, t, dt, k1)
        return Tsit5StepResult(
            out[0], out[1], (k1,) + tuple(out[2:8]), out[8], f_st
        )

    def step_vjp(p, u, t, dt, k1, d_unew, d_ks):
        zero = jnp.zeros_like(u)
        cts = (d_unew, zero) + tuple(d_ks) + (zero,)
        d_pm, d_u, _dt, _ddt, d_k1 = fused_step_bwd(
            p, u, t, dt, k1, cts, None, grad_precision=None
        )
        return d_pm, d_u, d_k1

    def sweep(p, knot_ts, knot_us, naccept, saveat_arr, ct_ys, ct_y):
        res = persistent_stored_sweep(
            p, knot_ts, knot_us, naccept, saveat_arr, ct_ys, ct_y
        )
        if res is None:
            return None
        a_u, a_k, d_pm = res
        return a_u, a_k, ravel_pytree(d_pm)[0]

    def loss(x_, ps_, use_sweep):
        sol = odesolve(
            f, x_, (0.0, 1.0), ps_, rtol=RTOL, atol=ATOL, max_steps=64,
            adjoint="stored", stateful=True, f_state=st, saveat=saveat,
            step_fn=step, step_vjp=step_vjp,
            sweep_fn=sweep if use_sweep else None,
        )
        w = 1.0 + jnp.arange(sol.ys.shape[0], dtype=jnp.float32)
        return jnp.sum(
            sol.ys * w.reshape(-1, 1, 1) * jnp.sin(sol.ys)
        ) + 2.0 * jnp.sum(sol.y_final**2)

    gx_r, gp_r = jax.grad(lambda a, b: loss(a, b, False), argnums=(0, 1))(
        x, ps
    )
    gx_p, gp_p = jax.grad(lambda a, b: loss(a, b, True), argnums=(0, 1))(
        x, ps
    )
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), rtol=2e-3, atol=1e-5
    )
    r_flat, _ = jax.flatten_util.ravel_pytree(gp_r)
    p_flat, _ = jax.flatten_util.ravel_pytree(gp_p)
    scale = float(jnp.max(jnp.abs(r_flat)))
    np.testing.assert_allclose(
        np.asarray(p_flat), np.asarray(r_flat), atol=1e-3 * scale
    )


def test_ckpt_recording_matches_dense_knots():
    """Two-level forward: every W-th checkpoint must BITWISE equal the
    dense knot at the same accepted-step index (same DMA'd state), and
    carry the controller state (dt_next, qold) for replay."""
    td, ps, st, x = _setup(seed=2)
    full = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=RTOL, atol=ATOL,
        saveat_arr=jnp.asarray([1.0]), max_steps=64, record_knots=True,
    )
    W = 4
    tl = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=RTOL, atol=ATOL,
        saveat_arr=jnp.asarray([1.0]), max_steps=64, record_knots=True,
        knot_dense_cap=4, knot_stride=W, record_ks=False,
    )
    n = int(full["naccept"])
    assert int(tl["naccept"]) == n
    assert tl["knot_ks"] is None  # record_ks=False skips the k-stream
    np.testing.assert_array_equal(
        np.asarray(full["y_final"]), np.asarray(tl["y_final"])
    )
    kt, ct = np.asarray(full["knot_ts"]), np.asarray(tl["ckpt_ts"])
    ku, cu = np.asarray(full["knot_us"]), np.asarray(tl["ckpt_us"])
    kk, ck = np.asarray(full["knot_ks"]), np.asarray(tl["ckpt_ks"])
    for ci in range(n // W + 1):
        i = ci * W
        assert kt[i] == ct[ci]
        np.testing.assert_array_equal(ku[i], cu[ci])
        np.testing.assert_array_equal(kk[i], ck[ci])
    # slot 0 carries the initial controller state
    assert float(tl["ckpt_dts"][0]) > 0.0


def test_two_level_sweep_matches_dense_sweep():
    """The windowed in-kernel replay sweep vs the dense sweep on the SAME
    solve (same forward kernel, same cotangents). In interpret mode the
    replay can drift by ulps vs the recorded trajectory (two separately
    compiled programs), so tolerances are relative; on TPU the replay
    runs the forward kernel's own tile code."""
    from localregneuralde_tpu.ops.pallas.fused_solve_bwd import (
        persistent_stored_sweep,
        persistent_two_level_sweep,
    )

    td, ps, st, x = _setup(seed=4)
    rt = 1e-6
    saveat = jnp.asarray([0.37, 1.0])
    full = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=rt, atol=rt,
        saveat_arr=saveat, max_steps=64, record_knots=True,
    )
    n = int(full["naccept"])
    DC, W = 4, 5
    assert n > DC  # the windowed branch must fire
    tl = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=rt, atol=rt,
        saveat_arr=saveat, max_steps=64, record_knots=True,
        knot_dense_cap=DC, knot_stride=W, record_ks=False,
    )
    ct_ys = jax.random.normal(jax.random.PRNGKey(3), (2, B, F))
    ct_y = jax.random.normal(jax.random.PRNGKey(4), (B, F))
    dense = persistent_stored_sweep(
        ps, full["knot_ts"], full["knot_us"], full["naccept"], saveat,
        ct_ys, ct_y,
    )
    win = persistent_two_level_sweep(
        ps, tl["knot_ts"], tl["knot_us"], tl["naccept"], saveat, ct_ys,
        ct_y, tl["ckpt_ts"], tl["ckpt_us"], tl["ckpt_ks"], tl["ckpt_dts"],
        tl["ckpt_qolds"], t_end=1.0, rtol=rt, atol=rt, max_steps=64,
        stride=W, dense_cap=DC,
    )
    assert win is not None
    from jax.flatten_util import ravel_pytree

    for a, b in zip(dense[:2], win[:2]):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-2 * scale
        )
    fa, _ = ravel_pytree(dense[2])
    fb, _ = ravel_pytree(win[2])
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fa),
        atol=2e-2 * float(jnp.max(jnp.abs(fa))),
    )

    # a SHORT solve through the same two-level kernel takes the dense
    # branch in-kernel and must match the dense sweep near-exactly
    short = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=1e-3, atol=1e-3,
        saveat_arr=saveat, max_steps=64, record_knots=True,
        knot_dense_cap=16, knot_stride=W, record_ks=False,
    )
    assert int(short["naccept"]) <= 16
    full_s = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=1e-3, atol=1e-3,
        saveat_arr=saveat, max_steps=64, record_knots=True,
    )
    dense_s = persistent_stored_sweep(
        ps, full_s["knot_ts"], full_s["knot_us"], full_s["naccept"],
        saveat, ct_ys, ct_y,
    )
    win_s = persistent_two_level_sweep(
        ps, short["knot_ts"], short["knot_us"], short["naccept"], saveat,
        ct_ys, ct_y, short["ckpt_ts"], short["ckpt_us"], short["ckpt_ks"],
        short["ckpt_dts"], short["ckpt_qolds"], t_end=1.0, rtol=1e-3,
        atol=1e-3, max_steps=64, stride=W, dense_cap=16,
    )
    np.testing.assert_array_equal(
        np.asarray(win_s[0]), np.asarray(dense_s[0])
    )


def test_two_level_replay_fidelity():
    """The in-kernel window replay's states vs the true (dense-recorded)
    trajectory — drift must stay at rounding-noise level."""
    from localregneuralde_tpu.ops.pallas.fused_solve_bwd import (
        persistent_two_level_sweep,
    )

    td, ps, st, x = _setup(seed=1)
    rt = 1e-6
    saveat = jnp.asarray([1.0])
    full = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=rt, atol=rt, saveat_arr=saveat,
        max_steps=64, record_knots=True,
    )
    n = int(full["naccept"])
    DC, W = 4, 64  # one window covering the whole solve
    tl = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=rt, atol=rt, saveat_arr=saveat,
        max_steps=64, record_knots=True, knot_dense_cap=DC, knot_stride=W,
        record_ks=False,
    )
    assert n > DC
    ct_ys = jnp.zeros((1, B, F))
    ct_y = jnp.ones((B, F))
    _, locals_ = persistent_two_level_sweep(
        ps, tl["knot_ts"], tl["knot_us"], tl["naccept"], saveat, ct_ys,
        ct_y, tl["ckpt_ts"], tl["ckpt_us"], tl["ckpt_ks"], tl["ckpt_dts"],
        tl["ckpt_qolds"], t_end=1.0, rtol=rt, atol=rt, max_steps=64,
        stride=W, dense_cap=DC, _return_locals=True,
    )
    ku = np.asarray(full["knot_us"])
    lu = np.asarray(locals_)
    np.testing.assert_array_equal(ku[0], lu[0])  # checkpoint itself
    for i in range(1, n + 1):
        drift = np.max(np.abs(ku[i] - lu[i]))
        assert drift < 5e-2, (i, drift)


def test_two_level_end_to_end_neural_ode():
    """NeuralODE with max_steps > knot_window: the persistent path must
    SERVE the two-level regime (the round-2 gap: it declined, and the
    reference's maxiters=10k configs fell back to the XLA loops), with
    gradients matching the dense persistent configuration."""
    from jax.flatten_util import ravel_pytree

    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (B, F))

    def build(kw):
        node = NeuralODE(
            td, regularize="unbiased", rtol=1e-6, atol=1e-6, max_steps=64,
            use_pallas=True, use_persistent=True, knot_window=kw,
        )
        return Chain(
            neural_ode=node,
            sol_to_arr=WrappedFunction(diffeqsol_to_array),
            classifier=Dense(F, 10),
        )

    m_dense = build(None)   # dense_cap = max_steps: single-level
    m_two = build(4)        # dense_cap 4 < max_steps: two-level
    params, state = m_dense.init(jax.random.PRNGKey(0))

    # the two-level persistent plan must be offered
    node_two = m_two.layers["neural_ode"]
    pf = node_two._persistent_fn()
    assert pf is not None
    assert pf(
        x, (0.0, 1.0), {"model": params["neural_ode"]["model"]},
        saveat_arr=jnp.asarray([1.0]), rtol=1e-6, atol=1e-6, max_steps=64,
        record_knots=True, knot_dense_cap=4, knot_stride=8,
        reservoir_key=None, dt0=None, f_state=None, plan_only=True,
    )

    def lossfn(m):
        def run(p):
            y, st_ = m(p, state, x, training=True)
            return jnp.sum(y**2) + 10.0 * st_["neural_ode"]["reg_val"], st_

        return run

    (l_d, st_d), g_d = jax.value_and_grad(lossfn(m_dense), has_aux=True)(
        params
    )
    (l_t, st_t), g_t = jax.value_and_grad(lossfn(m_two), has_aux=True)(
        params
    )
    # identical forward (same persistent kernel trajectory)
    np.testing.assert_allclose(float(l_d), float(l_t), rtol=1e-6)
    assert int(st_d["neural_ode"]["nfe"]) == int(st_t["neural_ode"]["nfe"])
    fd, _ = ravel_pytree(g_d)
    ft, _ = ravel_pytree(g_t)
    scale = float(jnp.max(jnp.abs(fd)))
    np.testing.assert_allclose(
        np.asarray(ft), np.asarray(fd), atol=5e-3 * scale
    )


def test_odd_batch_falls_back_gracefully():
    """B not divisible by any tile: the persistent plan declines and the
    XLA loop serves the solve — no error, correct output."""
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(
        td, regularize="unbiased", rtol=RTOL, atol=ATOL, max_steps=64,
        use_pallas=True, use_persistent=True,
    )
    params, state = node.init(jax.random.PRNGKey(0))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (6, F))  # B=6
    sol, st = node(params, state, x, training=True)
    assert bool(st["success"])
    assert np.all(np.isfinite(np.asarray(sol.y_final)))


def test_persistent_gating_regression_guard():
    """The flagship configuration must OFFER the persistent kernels (a
    silent gating regression would quietly fall back to the XLA loops
    and cost the measured 1.5× train speedup)."""
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(
        td, regularize="unbiased", rtol=RTOL, atol=ATOL, max_steps=64,
        use_pallas=True,
    )
    assert node._pallas_family == "mlp"
    assert node._persistent_fn() is not None
    assert node._sweep_fn() is not None
    # knob disables it
    node_off = NeuralODE(
        td, regularize="unbiased", rtol=RTOL, atol=ATOL, max_steps=64,
        use_pallas=True, use_persistent=False,
    )
    assert node_off._persistent_fn() is None
    assert node_off._sweep_fn() is None
    # the conv family must NOT take the mlp persistent path
    from localregneuralde_tpu.nn import BatchNorm, Conv

    conv_td = TDChain(
        Chain(Conv((3, 3), 9, 16, use_bias=False), BatchNorm(16, "gelu")),
        Chain(Conv((3, 3), 17, 16, use_bias=False), BatchNorm(16, "gelu")),
        Conv((3, 3), 17, 8, use_bias=False),
    )
    conv_node = NeuralODE(
        conv_td, regularize="unbiased", rtol=1e-3, atol=1e-3,
        use_pallas=True,
    )
    assert conv_node._pallas_family == "conv"
    assert conv_node._persistent_fn() is None
    assert conv_node._sweep_fn() is None
    # two-level (max_steps > knot_window) must decline knot recording
    from localregneuralde_tpu.ops.pallas.fused_solve import (
        persistent_tsit5_solve,
    )

    ps, _ = td.init(jax.random.PRNGKey(0))
    x = jnp.zeros((B, F))
    pf = node._persistent_fn()
    sol = pf(
        x, (0.0, 1.0), {"model": ps},
        saveat_arr=jnp.asarray([1.0]), rtol=RTOL, atol=ATOL,
        max_steps=64, record_knots=True, knot_dense_cap=None,
        reservoir_key=None, dt0=None, f_state=None,
    )
    assert sol is not None and sol.knot_us is not None


def test_failed_solve_ys_reverts_to_u0_beyond_t_final():
    """Truncated solves: saveat entries beyond the final accepted time
    must hold u0 (the XLA loop's accept-only commits), not a rejected
    attempt's speculative interpolant — the post-loop fixup."""
    td, ps, st, x = _setup()
    out = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=1e-12, atol=1e-14,
        saveat_arr=jnp.asarray([0.5, 1.0]), max_steps=2,
    )
    assert not bool(out["success"])
    t_f = float(out["t_final"])
    for i, s in enumerate([0.5, 1.0]):
        if s > t_f:
            np.testing.assert_array_equal(
                np.asarray(out["ys"][i]), np.asarray(x)
            )
