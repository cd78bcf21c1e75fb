"""Adaptive SDE integration: bounded XLA loop + virtual Brownian tree.

TPU-native replacement for the StochasticDiffEq machinery the reference
delegates to (SURVEY.md §2d): adaptive accept/reject stepping with
rejection-consistent noise (the VBT makes retried steps see the same
Brownian path), linear dense output for ``saveat`` (matching RODESolution
interpolation), per-closure NFE statistics (drift/diffusion counted
separately, reference ``src/layers/neural_sde.jl:44-64``), and reservoir
sampling for biased regularization.

Controller: an I-controller with beta1 = 1/(order+1) and conservative growth
(qmax 1.2) — documented deviation from StochasticDiffEq's internals; the
acceptance criterion (scaled-error ≤ 1 with the δ-weighted two-component
residual) matches the reference exactly.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.struct import pytree_dataclass
from ..ode.controller import PIController
from ..ops.residuals import internal_norm
from .brownian import VirtualBrownianTree
from .step import (
    lamba_euler_heun_step,
    milstein_commute_step,
    milstein_commute_step_nondiag,
    sri_step,
)
from .tableaus import get_sri_tableau


@pytree_dataclass
class SDESolution:
    ts: jnp.ndarray
    ys: Any
    t_final: jnp.ndarray
    y_final: Any
    nfe_drift: jnp.ndarray
    nfe_diffusion: jnp.ndarray
    naccept: jnp.ndarray
    nreject: jnp.ndarray
    success: jnp.ndarray
    reservoir_t: jnp.ndarray
    reservoir_u: Any
    f_state: Any
    g_state: Any
    # dense forward storage for the stored adjoint (None unless
    # record_knots=True): knot i = (t_i, u_i) at accepted-step boundaries,
    # plus the Brownian increments (dW_i, dZ_i) of accepted step i — the
    # backward consumes the RECORDED noise instead of re-descending the
    # tree twice per step (bitwise-identical: the tree is a pure function
    # of (key, t), these are the very values the forward used)
    knot_ts: Any = None
    knot_us: Any = None
    knot_dws: Any = None
    knot_dzs: Any = None


@pytree_dataclass
class _SDELoopState:
    t: jnp.ndarray
    dt: jnp.ndarray
    u: Any
    qold: jnp.ndarray
    done: jnp.ndarray
    nfe_f: jnp.ndarray
    nfe_g: jnp.ndarray
    naccept: jnp.ndarray
    nreject: jnp.ndarray
    ys: Any
    res_t: jnp.ndarray
    res_u: Any
    key: jnp.ndarray
    w_t: Any
    z_t: Any
    f_st: Any
    g_st: Any
    knot_ts: Any
    knot_us: Any
    knot_dws: Any
    knot_dzs: Any


def _wrap_stateless(fn: Callable) -> Callable:
    def wrapped(u, t, p, st):
        return fn(u, t, p), st

    return wrapped


_SOLVERS = {"sri": 1.5, "sosri": 1.5, "milstein": 1.0, "euler_heun": 0.5}


def sdesolve(
    f: Callable,
    g: Callable,
    u0,
    tspan,
    p=None,
    *,
    noise_key,
    rtol: float = 1e-2,
    atol: float = 1e-2,
    solver: str = "sri",
    delta: float = 1 / 6,
    saveat: Optional[jnp.ndarray] = None,
    max_steps: int = 256,
    checkpoint_every: int = 16,
    adjoint: str = "direct",
    controller: Optional[PIController] = None,
    dt0=None,
    stateful: bool = False,
    f_state: Any = None,
    g_state: Any = None,
    reservoir_key: Optional[jnp.ndarray] = None,
    brownian_depth: int = 24,
    record_knots: bool = False,
    noise_shape: Optional[tuple] = None,
    persistent_fn=None,
    persistent_sweep_fn=None,
) -> SDESolution:
    """Integrate ``du = f dt + g dW`` over ``tspan``.

    Diagonal noise by default (``g`` returns an array shaped like ``u``;
    ``dW`` has the state shape). With ``noise_shape = (..., m)`` the noise is
    **non-diagonal**: ``dW`` has that shape, ``g`` returns the noise-rate
    matrix ``u.shape + (m,)``, and the solver must be ``'milstein'``
    (commutative-noise RKMilCommute, the reference's only non-diagonal
    branch, ``src/perform_step.jl:126-160``).
    """
    if adjoint == "stored":
        from .stored_adjoint import stored_sdesolve

        return stored_sdesolve(
            f, g, u0, tspan, p, noise_key=noise_key, rtol=rtol, atol=atol,
            solver=solver, delta=delta, saveat=saveat, max_steps=max_steps,
            dt0=dt0, stateful=stateful, f_state=f_state, g_state=g_state,
            reservoir_key=reservoir_key, brownian_depth=brownian_depth,
            noise_shape=noise_shape, persistent_fn=persistent_fn,
            persistent_sweep_fn=persistent_sweep_fn,
        )
    if solver not in _SOLVERS:
        raise ValueError(f"unknown SDE solver {solver!r}; one of {list(_SOLVERS)}")
    if noise_shape is not None and solver != "milstein":
        raise ValueError(
            "non-diagonal noise (noise_shape=...) requires solver='milstein' "
            "(the commutative RKMilCommute branch)"
        )
    order = _SOLVERS[solver]
    if controller is None:
        controller = PIController(
            gamma=0.9, qmin=0.2, qmax=1.2,
            beta1=1.0 / (order + 1.0), beta2=0.0,
        )
    fn = f if stateful else _wrap_stateless(f)
    gn = g if stateful else _wrap_stateless(g)

    t0, t_end = tspan
    dtype = jnp.result_type(u0.dtype, jnp.float32)
    t0 = jnp.asarray(t0, dtype)
    t_end = jnp.asarray(t_end, dtype)

    if saveat is None:
        saveat_arr = t_end[None]
    else:
        saveat_arr = jnp.atleast_1d(jnp.asarray(saveat, dtype))
    n_save = saveat_arr.shape[0]

    # Persistent-loop Pallas path (ops/pallas/fused_sde_solve.py): whole
    # solve incl. in-kernel Brownian noise in one program. Non-
    # differentiated solves only (inference / the fenced primal of the
    # stored adjoint); the stored backward consumes the RECORDED noise, so
    # no replay machinery is needed. May decline (None) on family/plan.
    if (
        persistent_fn is not None
        and adjoint == "none"
        and noise_shape is None
    ):
        sol = persistent_fn(
            u0, tspan, p, noise_key=noise_key, saveat_arr=saveat_arr,
            rtol=rtol, atol=atol, solver=solver, delta=delta,
            max_steps=max_steps, record_knots=record_knots,
            reservoir_key=reservoir_key, brownian_depth=brownian_depth,
            dt0=dt0, f_state=f_state, g_state=g_state,
        )
        if sol is not None:
            return sol

    w_shape = tuple(noise_shape) if noise_shape is not None else u0.shape
    tree = VirtualBrownianTree(
        noise_key, float(tspan[0]), float(tspan[1]), w_shape, dtype,
        depth=brownian_depth,
    )

    # --- initial dt: drift-magnitude heuristic (simplified Hairer for
    # stochastic order; documented deviation from sde_determine_initdt)
    f0, _ = fn(u0, t0, p, f_state)
    nfe_f0 = jnp.asarray(1, jnp.int32)
    if dt0 is None:
        sc = atol + jnp.abs(u0) * rtol
        d0 = internal_norm(u0 / sc)
        d1 = internal_norm(f0 / sc)
        dt_init = jnp.where(
            (d0 < 1e-5) | (d1 < 1e-5), 1e-6,
            0.01 * d0 / jnp.where(d1 == 0, 1.0, d1),
        )
        dt_init = jnp.minimum(dt_init, (t_end - t0) / 2)
    else:
        dt_init = jnp.asarray(dt0, dtype)
    dt_init = lax.stop_gradient(jnp.minimum(dt_init, t_end - t0))

    ys0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_save,) + x.shape), u0
    )
    key0 = reservoir_key if reservoir_key is not None else jax.random.PRNGKey(0)

    if record_knots:
        knot_ts0 = jnp.full((max_steps + 1,), t_end, dtype).at[0].set(t0)
        knot_us0 = jnp.zeros((max_steps + 1,) + u0.shape, u0.dtype).at[0].set(u0)
        knot_dws0 = jnp.zeros((max_steps,) + w_shape, dtype)
        knot_dzs0 = jnp.zeros((max_steps,) + w_shape, dtype)
    else:
        knot_ts0 = knot_us0 = None
        knot_dws0 = knot_dzs0 = None

    state0 = _SDELoopState(
        t=t0,
        dt=dt_init,
        u=u0,
        qold=jnp.asarray(controller.qoldinit, dtype),
        done=(t0 >= t_end),
        nfe_f=nfe_f0,
        nfe_g=jnp.asarray(0, jnp.int32),
        naccept=jnp.asarray(0, jnp.int32),
        nreject=jnp.asarray(0, jnp.int32),
        ys=ys0,
        res_t=t0,
        res_u=u0,
        key=key0,
        w_t=jnp.zeros(w_shape, dtype),
        z_t=jnp.zeros(w_shape, dtype),
        f_st=f_state,
        g_st=g_state,
        knot_ts=knot_ts0,
        knot_us=knot_us0,
        knot_dws=knot_dws0,
        knot_dzs=knot_dzs0,
    )

    nf_step, ng_step = {
        "sri": (4, 4), "sosri": (4, 4), "milstein": (1, 2),
        "euler_heun": (3, 3),
    }[solver]
    if noise_shape is not None:
        # non-diagonal Milstein: 1 drift + (1 + m) diffusion evals per attempt
        nf_step, ng_step = 1, 1 + int(w_shape[-1])

    def step_fn(s: _SDELoopState) -> _SDELoopState:
        t_rem = t_end - s.t
        dt_c = jnp.where(s.done, jnp.ones_like(s.dt), jnp.minimum(s.dt, t_rem))
        is_last = s.dt >= t_rem

        # Brownian increments over [t, t+dt] from the tree (consistent
        # under rejection); noise is never differentiated. One stacked
        # descent yields both W and Z.
        w_next, z_next = tree.wz(s.t + dt_c)
        w_next = lax.stop_gradient(w_next)
        z_next = lax.stop_gradient(z_next)
        dW = w_next - s.w_t
        dZ = z_next - s.z_t

        if solver in ("sri", "sosri"):
            res = sri_step(
                fn, gn, s.u, s.t, dt_c, dW, dZ, p, s.f_st, s.g_st,
                atol, rtol, delta, tableau=get_sri_tableau(solver),
            )
        elif solver == "milstein":
            if noise_shape is not None:
                res = milstein_commute_step_nondiag(
                    fn, gn, s.u, s.t, dt_c, dW, p, s.f_st, s.g_st, atol, rtol
                )
            else:
                res = milstein_commute_step(
                    fn, gn, s.u, s.t, dt_c, dW, p, s.f_st, s.g_st, atol, rtol
                )
        else:
            res = lamba_euler_heun_step(
                fn, gn, s.u, s.t, dt_c, dW, p, s.f_st, s.g_st,
                atol, rtol, delta,
            )

        eest_c = lax.stop_gradient(res.eest)
        accept = eest_c <= 1.0
        dt_acc, dt_rej, qold_acc = controller.propose(eest_c, dt_c, s.qold)
        dt_acc = lax.stop_gradient(dt_acc)
        dt_rej = lax.stop_gradient(dt_rej)

        t_new = jnp.where(is_last, t_end, s.t + dt_c)
        upd = accept & ~s.done

        # linear dense output (RODESolution-style interpolation)
        theta = jnp.clip(
            (saveat_arr - s.t) / dt_c, 0.0, 1.0
        ).reshape((n_save,) + (1,) * (s.u.ndim))
        y_interp = s.u[None] + theta * (res.u_new - s.u)[None]
        hit = (saveat_arr > s.t) & (saveat_arr <= t_new) & upd
        ys_new = jnp.where(
            hit.reshape((n_save,) + (1,) * s.u.ndim), y_interp, s.ys
        )

        key_next, sub = jax.random.split(s.key)
        cnt = s.naccept + 1
        take = (
            jax.random.uniform(sub, (), dtype) * cnt.astype(dtype) < 1.0
        ) & upd
        res_t_new = jnp.where(take, s.t, s.res_t)
        res_u_new = jnp.where(take, s.u, s.res_u)

        if record_knots:
            ki = s.naccept + 1
            knot_ts_n = s.knot_ts.at[ki].set(
                jnp.where(upd, t_new, s.knot_ts[ki])
            )
            knot_us_n = s.knot_us.at[ki].set(
                jnp.where(upd, res.u_new, s.knot_us[ki])
            )
            # accepted step j spans knots j -> j+1; its increments land at j
            knot_dws_n = s.knot_dws.at[s.naccept].set(
                jnp.where(upd, dW, s.knot_dws[s.naccept])
            )
            knot_dzs_n = s.knot_dzs.at[s.naccept].set(
                jnp.where(upd, dZ, s.knot_dzs[s.naccept])
            )
        else:
            knot_ts_n = knot_us_n = None
            knot_dws_n = knot_dzs_n = None

        where = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
            lambda x, y: jnp.where(upd, x, y), a, b
        )
        return _SDELoopState(
            t=jnp.where(upd, t_new, s.t),
            dt=jnp.where(s.done, s.dt, jnp.where(accept, dt_acc, dt_rej)),
            u=where(res.u_new, s.u),
            qold=jnp.where(upd, qold_acc, s.qold),
            done=s.done | (upd & is_last),
            nfe_f=s.nfe_f + jnp.where(s.done, 0, nf_step).astype(jnp.int32),
            nfe_g=s.nfe_g + jnp.where(s.done, 0, ng_step).astype(jnp.int32),
            naccept=s.naccept + upd.astype(jnp.int32),
            nreject=s.nreject + (~accept & ~s.done).astype(jnp.int32),
            ys=ys_new,
            res_t=res_t_new,
            res_u=res_u_new,
            key=key_next,
            w_t=jnp.where(upd, w_next, s.w_t),
            z_t=jnp.where(upd, z_next, s.z_t),
            f_st=where(res.f_state, s.f_st),
            g_st=where(res.g_state, s.g_st),
            knot_ts=knot_ts_n,
            knot_us=knot_us_n,
            knot_dws=knot_dws_n,
            knot_dzs=knot_dzs_n,
        )

    if adjoint == "none":
        final = lax.while_loop(
            lambda s: ~s.done & (s.naccept + s.nreject < max_steps),
            step_fn,
            state0,
        )
    elif adjoint == "direct":
        chunk = max(1, min(checkpoint_every, max_steps))
        n_outer = -(-max_steps // chunk)

        def masked_step(s):
            return lax.cond(s.done, lambda st: st, step_fn, s)

        @jax.checkpoint
        def chunk_fn(s, _):
            def inner(s2, _):
                return masked_step(s2), None

            s, _ = lax.scan(inner, s, None, length=chunk)
            return s, None

        final, _ = lax.scan(chunk_fn, state0, None, length=n_outer)
    else:
        raise ValueError(f"unknown adjoint {adjoint!r}")

    return SDESolution(
        ts=saveat_arr,
        ys=final.ys,
        t_final=final.t,
        y_final=final.u,
        nfe_drift=final.nfe_f,
        nfe_diffusion=final.nfe_g,
        naccept=final.naccept,
        nreject=final.nreject,
        success=final.done,
        reservoir_t=final.res_t,
        reservoir_u=final.res_u,
        f_state=final.f_st,
        g_state=final.g_st,
        knot_ts=final.knot_ts,
        knot_us=final.knot_us,
        knot_dws=final.knot_dws,
        knot_dzs=final.knot_dzs,
    )
