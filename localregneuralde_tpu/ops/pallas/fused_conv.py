"""Fused Pallas Tsit5 step for the CIFAR conv NeuralODE dynamics family.

The CIFAR dynamics (``harness/construct.py:_construct_cifar10_cnn``,
reference ``construct.jl:212-228``) is::

    TDChain(
        Chain(Conv3x3 Cs+1→Ch (no bias), BatchNorm(Ch, gelu)),
        Chain(Conv3x3 Ch+1→Ch (no bias), BatchNorm(Ch, gelu)),
        Conv3x3 Ch+1→Cs (no bias),
    )

Measured on TPU v5e (scripts/cifar_phase_probe.py + a trivial-dynamics
floor probe): the solver loop machinery at batch 32 is ~0.2 ms/step while
the full train step costs ~144 ms — i.e. virtually ALL the time is XLA's
execution of the conv/BN chain (layout churn + HBM round trips between
~20 ops per dynamics eval), not FLOPs (~21 ms at roofline). This kernel
runs one ENTIRE Tsit5 step (6 dynamics evals) in VMEM.

Design:

- **Channels-first flat layout** ``(C, B·H·W)`` inside the kernel: the
  8-channel state tensors are (8, 32768) — compact on sublanes — instead
  of lane-padding 8 → 128 (16× memory blowup in NHWC-flat).
- **Convs as 9 per-tap (roll, mask, matmul) groups** inside a fori:
  ``y = Σ_tap W_tap (Cout,Cin) @ (m_tap ⊙ roll(x, -Δ_tap))`` with
  ``Δ_tap = (dy-1)·W + (dx-1)`` and ``m_tap`` the border-validity mask of
  the source position at each output lane (rolls wrap across image/batch
  boundaries only at masked lanes — exactness follows).
- **Time channel, concat-free**: ``conv(concat(x, t·1)) = conv(x) +
  t·tmap`` with ``tmap = conv(ones, W[:,:,C:,:])`` — the constant border
  map is precomputed in XLA and passed in pre-expanded to (Cout, B·H·W)
  (``models/common.py:_apply_time_dependent`` is the XLA twin of this).
- **BatchNorm in training mode** normalizes with batch statistics
  computed in-kernel (lane reductions); the sequential per-eval
  running-stat EMA chain is applied in-kernel and the final running
  stats are emitted. Eval mode takes the running stats as inputs.

The backward is the hand-fused kernel (``fused_conv_bwd.py``) by
default; the pure-XLA twin transpose remains available
(``hand_bwd=False``) as the parity reference.

STATUS: correct (parity-tested) but measured 3-4× SLOWER than XLA's
native conv chain at the CIFAR shapes — gated behind ``use_pallas='on'``;
see RESULTS.md round 3 for the analysis.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ode.tableaus import Tsit5Tableau as T


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll(x, shift, axis=1):
    """Circular shift with jnp.roll semantics (rolled[i] = x[i-shift]).
    Uses the native TPU roll on hardware (lane rotates lower to the
    cross-lane shuffle unit; the generic concat-of-slices lowering of
    jnp.roll was measured ~10x slower at these shapes)."""
    if _interpret():
        return jnp.roll(x, shift, axis=axis)
    # pltpu.roll requires a non-negative shift (traced negatives are NOT
    # statically rejected — normalize explicitly)
    return pltpu.roll(x, jnp.mod(shift, x.shape[axis]), axis)



class ConvFamilySpec(NamedTuple):
    B: int
    H: int
    W: int
    Cs: int         # state channels
    Ch: int         # hidden channels
    momentum: float
    eps: float


def match_conv_family(model) -> "ConvFamilySpec | None":
    """Detect the CIFAR conv dynamics pattern on a TDChain (shapes are
    resolved at call time from the state tensor)."""
    from ...models.common import TDChain
    from ...nn.basic import BatchNorm, Chain, Conv

    if not isinstance(model, TDChain):
        return None
    layers = list(model.layers.values())
    if len(layers) != 3:
        return None
    l0, l1, l2 = layers

    def conv_bn(layer):
        if not isinstance(layer, Chain):
            return None
        sub = list(layer.layers.values())
        if len(sub) != 2:
            return None
        conv, bn = sub
        if not (isinstance(conv, Conv) and isinstance(bn, BatchNorm)):
            return None
        ok = (
            conv.kernel_size == (3, 3) and conv.padding == "SAME"
            and conv.stride == (1, 1) and not conv.use_bias
            and bn.affine and bn.activation is jax.nn.gelu
        )
        return (conv, bn) if ok else None

    a = conv_bn(l0)
    b = conv_bn(l1)
    if a is None or b is None or not isinstance(l2, Conv):
        return None
    c1, bn1 = a
    c2, bn2 = b
    if not (
        l2.kernel_size == (3, 3) and l2.padding == "SAME"
        and l2.stride == (1, 1) and not l2.use_bias
    ):
        return None
    Cs = l2.out_channels
    Ch = c1.out_channels
    if not (
        c1.in_channels == Cs + 1 and c2.in_channels == Ch + 1
        and c2.out_channels == Ch and l2.in_channels == Ch + 1
    ):
        return None
    if bn1.momentum != bn2.momentum or bn1.eps != bn2.eps:
        return None
    return ConvFamilySpec(0, 0, 0, Cs, Ch, bn1.momentum, bn1.eps)


# ---------------------------------------------------------------------------
# weight / tmap preparation (XLA side, once per step call — cheap)


def _prep_conv(w, B, H, W):
    """(3,3,Cin+1,Cout) conv weight → (9·Cout, Cin) per-TAP matmul blocks
    (row block tap = 3·dy + dx) + the time map expanded to (Cout, B·H·W)."""
    cin = w.shape[2] - 1
    cout = w.shape[3]
    # Wtap[tap]: (Cout, Cin)
    wt = jnp.transpose(w[:, :, :cin, :], (0, 1, 3, 2)).reshape(
        9 * cout, cin
    )
    ones1 = jnp.ones((1, H, W, 1), jnp.float32)
    tmap = lax.conv_general_dilated(
        ones1, w[:, :, cin:, :], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (1, H, W, Cout)
    tmap_cf = jnp.transpose(tmap[0], (2, 0, 1)).reshape(cout, H * W)
    tmap_exp = jnp.tile(tmap_cf, (1, B))  # lane = b·HW + pos
    return wt, tmap_exp


# ---------------------------------------------------------------------------
# kernel


def _make_step_kernel(spec: ConvFamilySpec, precision, training: bool):
    B, H, W, Cs, Ch = spec.B, spec.H, spec.W, spec.Cs, spec.Ch
    N = B * H * W
    eps = spec.eps

    def positions():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        return lane % W, (lane // W) % H

    def tap_mask(wpos, hpos, tap):
        """Validity of source (h+dy-1, w+dx-1) at each output lane."""
        dy = tap // 3
        dx = tap % 3
        ws = wpos + (dx - 1)
        hs = hpos + (dy - 1)
        return (
            (ws >= 0) & (ws <= W - 1) & (hs >= 0) & (hs <= H - 1)
        ).astype(jnp.float32)

    def conv_cf(x, wtap_ref, tmap_ref, s, cout, wpos, hpos):
        """3×3 SAME conv in channels-first flat layout + s·tmap.

        One (roll, mask, matmul) per kernel tap inside a fori — minimal
        live set (no 3·Cin stacking) and 9× less code than unrolling."""
        def tap_body(tap, y):
            dy = tap // 3
            dx = tap % 3
            delta = (dy - 1) * W + (dx - 1)
            m = tap_mask(wpos, hpos, tap)
            xs = _roll(x, -delta, axis=1) * m
            wt = wtap_ref[pl.ds(tap * cout, cout), :]
            return y + jnp.dot(
                wt, xs, preferred_element_type=jnp.float32,
                precision=precision,
            )

        y = lax.fori_loop(0, 9, tap_body, jnp.zeros((cout, N), jnp.float32))
        return y + s * tmap_ref[:]

    def bn_gelu(y, scale_ref, bias_ref, mean_in, var_in):
        if training:
            mean = jnp.mean(y, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(y - mean), axis=1, keepdims=True)
        else:
            mean, var = mean_in, var_in
        xhat = (y - mean) * lax.rsqrt(var + eps)
        out = jax.nn.gelu(xhat * scale_ref[:] + bias_ref[:])
        return out, mean, var

    def kernel(*refs):
        it = iter(refs)
        sc_ref = next(it)                   # SMEM (2,): t, dt
        ab_ref = next(it)                   # SMEM (6, 8): a-row (7) + c
        u_ref = next(it)                    # (Cs, N)
        k1_ref = next(it)                   # (Cs, N)
        w1_ref = next(it)                   # (9Ch, Cs)
        w2_ref = next(it)                   # (9Ch, Ch)
        w3_ref = next(it)                   # (9Cs, Ch)
        t1_ref = next(it)                   # (Ch, N) tmap1
        t2_ref = next(it)                   # (Ch, N)
        t3_ref = next(it)                   # (Cs, N)
        s1_ref = next(it)                   # (Ch, 1) bn1 scale
        b1_ref = next(it)
        s2_ref = next(it)
        b2_ref = next(it)
        m1_ref = next(it)                   # (Ch, 1) running stats in
        v1_ref = next(it)
        m2_ref = next(it)
        v2_ref = next(it)
        unew_ref = next(it)
        utilde_ref = next(it)
        ks_ref = next(it)                   # (7·Cs, N): k1..k7 blocks
        g6_ref = next(it)
        if training:
            m1o_ref = next(it)              # (Ch, 1) updated running stats
            v1o_ref = next(it)
            m2o_ref = next(it)
            v2o_ref = next(it)

        t = sc_ref[0]
        dt = sc_ref[1]
        mom = spec.momentum
        wpos, hpos = positions()

        if not training:
            m1, v1 = m1_ref[:], v1_ref[:]
            m2, v2 = m2_ref[:], v2_ref[:]
        else:
            m1 = v1 = m2 = v2 = None
            # EMA accumulators start from the incoming running stats; the
            # per-eval updates below replicate the XLA path's sequential
            # BatchNorm state chain exactly
            m1o_ref[:] = m1_ref[:]
            v1o_ref[:] = v1_ref[:]
            m2o_ref[:] = m2_ref[:]
            v2o_ref[:] = v2_ref[:]

        ks_ref[pl.ds(0, Cs), :] = k1_ref[:]
        # zero the not-yet-computed blocks: the stage sum multiplies them
        # by a zero coefficient, but 0·garbage can be NaN
        ks_ref[pl.ds(Cs, 6 * Cs), :] = jnp.zeros((6 * Cs, N), jnp.float32)

        # one eval per fori iteration: ~6× smaller Mosaic program than the
        # unrolled 6-eval body (compile time was the binding constraint)
        def eval_body(e, _):
            x = u_ref[:]  # read per-iteration (no cross-loop vector values)
            for j in range(7):
                x = x + (dt * ab_ref[e, j]) * ks_ref[pl.ds(j * Cs, Cs), :]
            s = t + ab_ref[e, 7] * dt

            @pl.when(e == 4)
            def _():
                g6_ref[:] = x

            @pl.when(e == 5)
            def _():
                unew_ref[:] = x

            z1 = conv_cf(x, w1_ref, t1_ref, s, Ch, wpos, hpos)
            a1, mu1, va1 = bn_gelu(z1, s1_ref, b1_ref, m1, v1)
            z2 = conv_cf(a1, w2_ref, t2_ref, s, Ch, wpos, hpos)
            a2, mu2, va2 = bn_gelu(z2, s2_ref, b2_ref, m2, v2)
            k = conv_cf(a2, w3_ref, t3_ref, s, Cs, wpos, hpos)
            ks_ref[pl.ds((e + 1) * Cs, Cs), :] = k
            if training:
                m1o_ref[:] = (1 - mom) * m1o_ref[:] + mom * mu1
                v1o_ref[:] = (1 - mom) * v1o_ref[:] + mom * va1
                m2o_ref[:] = (1 - mom) * m2o_ref[:] + mom * mu2
                v2o_ref[:] = (1 - mom) * v2o_ref[:] + mom * va2
            return 0

        lax.fori_loop(0, 6, eval_body, 0)

        bt = (T.btilde1, T.btilde2, T.btilde3, T.btilde4, T.btilde5,
              T.btilde6, T.btilde7)
        acc = bt[0] * ks_ref[pl.ds(0, Cs), :]
        for j in range(1, 7):
            acc = acc + bt[j] * ks_ref[pl.ds(j * Cs, Cs), :]
        utilde_ref[:] = dt * acc

    return kernel


def _stage_tab():
    """(6, 8) SMEM table: per eval the 7 a-row coefficients (zero-padded)
    and the stage-time fraction c."""
    from .fused_mlp_bwd import _stage_coeffs

    rows = []
    for (a_row, c) in _stage_coeffs():
        rows.append(list(a_row) + [0.0] * (7 - len(a_row)) + [c])
    return jnp.asarray(rows, jnp.float32)


@functools.lru_cache(maxsize=None)
def _build_step_call(spec: ConvFamilySpec, precision, training: bool,
                     interpret: bool):
    B, H, W, Cs, Ch = spec.B, spec.H, spec.W, spec.Cs, spec.Ch
    N = B * H * W
    kernel = _make_step_kernel(spec, precision, training)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    in_specs = [smem(), smem()] + [vmem()] * 16
    out_specs = [vmem()] * 4
    out_shape = [
        jax.ShapeDtypeStruct((Cs, N), jnp.float32),        # u_new
        jax.ShapeDtypeStruct((Cs, N), jnp.float32),        # utilde
        jax.ShapeDtypeStruct((7 * Cs, N), jnp.float32),    # k1..k7 blocks
        jax.ShapeDtypeStruct((Cs, N), jnp.float32),        # g6
    ]
    if training:
        out_specs += [vmem()] * 4
        out_shape += [
            jax.ShapeDtypeStruct((Ch, 1), jnp.float32) for _ in range(4)
        ]

    # live peak ≈ xcat2 (3Ch,N) + activations (2×Ch·N) + stage buffers
    vmem_limit = (
        (3 * Ch + 3 * Ch + 10 * Cs) * N * 4      # xcat + a1/a2 + stages
        + 2 * (Ch + Cs) * N * 4                  # tmaps
        + 24 * 1024 * 1024
    )
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_limit, 120 * 1024 * 1024),
        ),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# wrapper


def _to_cf(x):
    b, h, w, c = x.shape
    return jnp.transpose(x, (3, 0, 1, 2)).reshape(c, b * h * w)


def _from_cf(x_cf, B, H, W):
    c = x_cf.shape[0]
    return jnp.transpose(x_cf.reshape(c, B, H, W), (1, 2, 3, 0))


def _layer_names(params):
    n = sorted(params.keys())
    return n  # layer_0, layer_1, layer_2


def _conv_step_raw(spec0: ConvFamilySpec, params, u, t, dt, k1, precision,
                   bn_state=None):
    """Run the fused kernel; NHWC in/out.

    Training mode (``bn_state is None``): returns
    ``(u_new, utilde, (k1..k7), g6, (means, vars))`` with the per-eval BN
    batch statistics. Eval mode: normalizes with ``bn_state`` running
    stats and returns ``stats=None``.
    """
    B, H, W, Cs = u.shape
    spec = spec0._replace(B=B, H=H, W=W)
    names = _layer_names(params)
    p0, p1, p2 = params[names[0]], params[names[1]], params[names[2]]
    bn1 = p0["layer_1"]
    bn2 = p1["layer_1"]

    w1s, t1m = _prep_conv(p0["layer_0"]["w"], B, H, W)
    w2s, t2m = _prep_conv(p1["layer_0"]["w"], B, H, W)
    w3s, t3m = _prep_conv(p2["w"], B, H, W)

    col = lambda v: v.reshape(-1, 1)  # noqa: E731
    mode_training = not isinstance(bn_state, dict)
    if mode_training:
        # rstats as EMA seeds: a 4-tuple of (Ch,1), or None (fenced — the
        # outputs are discarded anyway)
        if bn_state is None:
            Ch = spec.Ch
            rstats = tuple(
                jnp.zeros((Ch, 1), jnp.float32) for _ in range(4)
            )
        else:
            rstats = bn_state
    else:
        st0 = bn_state[names[0]]["layer_1"]
        st1 = bn_state[names[1]]["layer_1"]
        rstats = (
            col(st0["mean"]), col(st0["var"]),
            col(st1["mean"]), col(st1["var"]),
        )
    args = [
        jnp.stack([jnp.asarray(t, jnp.float32), jnp.asarray(dt, jnp.float32)]),
        _stage_tab(),
        _to_cf(u), _to_cf(k1), w1s, w2s, w3s, t1m, t2m, t3m,
        col(bn1["scale"]), col(bn1["bias"]),
        col(bn2["scale"]), col(bn2["bias"]),
        rstats[0], rstats[1], rstats[2], rstats[3],
    ]

    call = _build_step_call(spec, precision, mode_training, _interpret())
    outs = call(*args)
    Cs = spec.Cs
    u_new = _from_cf(outs[0], B, H, W)
    utilde = _from_cf(outs[1], B, H, W)
    ks_all = outs[2]
    ks = tuple(
        _from_cf(ks_all[j * Cs:(j + 1) * Cs], B, H, W) for j in range(1, 7)
    )
    g6 = _from_cf(outs[3], B, H, W)
    stats = tuple(outs[4:8]) if mode_training else None
    return u_new, utilde, (k1,) + ks, g6, stats


def _state_rstats(params, state):
    """Extract the BN running stats from the TDChain state as the
    kernel's 4-tuple of (Ch, 1) EMA seeds."""
    names = _layer_names(params)
    st0 = state[names[0]]["layer_1"]
    st1 = state[names[1]]["layer_1"]
    col = lambda v: v.reshape(-1, 1)  # noqa: E731
    return (col(st0["mean"]), col(st0["var"]),
            col(st1["mean"]), col(st1["var"]))


def _update_bn_state(params, state, stats):
    """Place the kernel's updated running stats (4×(Ch,1), already the
    sequential 6-eval EMA chain) back into the TDChain state."""
    m1, v1, m2, v2 = stats
    names = _layer_names(params)
    new_state = dict(state)
    new_state[names[0]] = dict(state[names[0]])
    new_state[names[0]]["layer_1"] = {"mean": m1[:, 0], "var": v1[:, 0]}
    new_state[names[1]] = dict(state[names[1]])
    new_state[names[1]]["layer_1"] = {"mean": m2[:, 0], "var": v2[:, 0]}
    return new_state


def conv_step_apply(spec0: ConvFamilySpec, params, state, u, t, dt, k1,
                    *, training: bool, precision=None):
    """Eval-mode (or fenced) step entry; NHWC in/out. Returns
    ``(u_new, utilde, (k1..k7), g6, new_state)``."""
    if training or state is None:
        rstats = None if state is None else _state_rstats(params, state)
        u_new, utilde, ks7, g6, stats = _conv_step_raw(
            spec0, params, u, t, dt, k1, precision, bn_state=rstats
        )
        new_state = state
        if state is not None and stats is not None:
            new_state = _update_bn_state(params, state, stats)
        return u_new, utilde, ks7, g6, new_state
    u_new, utilde, ks7, g6, _ = _conv_step_raw(
        spec0, params, u, t, dt, k1, precision, bn_state=state
    )
    return u_new, utilde, ks7, g6, state


# ---------------------------------------------------------------------------
# differentiable step (custom_vjp; backward transposes the XLA twin)


def _dummy_bn_state(params):
    """Placeholder TDChain state (BN running stats) — training-mode BN
    normalizes with batch statistics, so the values are irrelevant to the
    differentiable outputs; only the SHAPES matter for the twin."""
    names = _layer_names(params)
    st = {}
    for nm in names[:2]:
        ch = params[nm]["layer_1"]["scale"].shape[0]
        st[nm] = {
            "layer_0": {},
            "layer_1": {
                "mean": jnp.zeros((ch,), jnp.float32),
                "var": jnp.ones((ch,), jnp.float32),
            },
        }
    st[names[2]] = {}
    return st


def make_fused_conv_step(model, spec: ConvFamilySpec, precision=None,
                         hand_bwd: bool = True):
    """Build the fused conv Tsit5 step with the ``_step_fn`` contract:

        step(fn, u, t, dt, k1, p, f_st) -> Tsit5StepResult

    Differentiable w.r.t. (p, u, k1). The backward is the hand-fused
    Pallas kernel (``fused_conv_bwd.py``) by default; ``hand_bwd=False``
    transposes the exact XLA dynamics instead (the twin — used as the
    parity reference in tests). BN running-stat threading rides as
    gradient-fenced auxiliary outputs.
    """
    from ...core.containers import ArrayAndTime
    from ...ode.step import Tsit5StepResult, tsit5_step

    def twin_outputs(p, u, t, dt, k1):
        st = _dummy_bn_state(p)

        def f(x, s, p_, stt):
            y, st2 = model(p_, stt, ArrayAndTime(x, s), training=True)
            return y.array, st2

        res = tsit5_step(f, u, t, dt, k1, p, st)
        return res.u_new, res.utilde, tuple(res.ks[1:]), res.g6

    @jax.custom_vjp
    def core_train(p, u, t, dt, k1, rstats):
        """Returns (u_new, utilde, ks6, g6, stats) — stats (the EMA-chained
        BN running stats) are gradient-FENCED auxiliary outputs seeded by
        ``rstats`` (the backward rule returns cotangents only through the
        step outputs), realizing the BN-state fencing of the stored
        adjoint."""
        u_new, utilde, ks7, g6, stats = _conv_step_raw(
            spec, p, u, t, dt, k1, precision, bn_state=rstats
        )
        return u_new, utilde, ks7[1:], g6, stats

    def _fwd(p, u, t, dt, k1, rstats):
        return core_train(p, u, t, dt, k1, rstats), (p, u, t, dt, k1)

    def _bwd(res, cts):
        p, u, t, dt, k1 = res
        zero = jnp.zeros((), jnp.float32)
        d_rstats = tuple(
            jnp.zeros((spec.Ch, 1), jnp.float32) for _ in range(4)
        )
        if hand_bwd:
            from .fused_conv_bwd import fused_conv_step_bwd

            flat = (cts[0], cts[1]) + tuple(cts[2]) + (cts[3],)
            d_p, d_u, d_k1 = fused_conv_step_bwd(
                spec, p, u, t, dt, k1, flat, precision=precision
            )
            return d_p, d_u, zero, zero, d_k1, d_rstats
        _, vjp = jax.vjp(twin_outputs, p, u, t, dt, k1)
        d_p, d_u, _dt, _ddt, d_k1 = vjp(tuple(cts[:4]))
        return d_p, d_u, zero, zero, d_k1, d_rstats

    core_train.defvjp(_fwd, _bwd)

    def step(fn, u, t, dt, k1, p, f_st, *, training=True):
        pm = p["model"] if isinstance(p, dict) and "model" in p else p
        if training or f_st is None:
            if f_st is None:
                rstats = tuple(
                    jnp.zeros((spec.Ch, 1), jnp.float32) for _ in range(4)
                )
            else:
                rstats = jax.tree_util.tree_map(
                    lax.stop_gradient, _state_rstats(pm, f_st)
                )
            u_new, utilde, ks6, g6, stats = core_train(
                pm, u, t, dt, k1, rstats
            )
            new_state = f_st
            if f_st is not None:
                new_state = _update_bn_state(
                    pm, f_st, jax.tree_util.tree_map(
                        lax.stop_gradient, stats
                    )
                )
            return Tsit5StepResult(
                u_new, utilde, (k1,) + tuple(ks6), g6, new_state
            )
        u_new, utilde, ks7, g6, new_state = conv_step_apply(
            spec, pm, f_st, u, t, dt, k1, training=False,
            precision=precision,
        )
        return Tsit5StepResult(u_new, utilde, ks7, g6, new_state)

    return step
