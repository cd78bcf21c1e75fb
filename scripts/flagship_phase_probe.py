#!/usr/bin/env python
"""Phase breakdown of the flagship train step on the persistent kernels.

Where does the remaining train-step time go?  Four arms, each an
ON-DEVICE dependent chain (fori_loop) timed at TWO lengths — the slope
removes the relay's fixed dispatch/sync cost (scripts/roofline.py
doctrine) — with arms interleaved per round in ONE process so relay
drift hits all arms equally (CLAUDE.md A/B doctrine):

  fwd_inf     inference forward  (training=False, adjoint-none while_loop
              persistent solve, no reg step)
  fwd_train   training-mode primal WITHOUT differentiation (adds the
              fenced unbiased reg step; no knot recording, no sweep)
  grad        value_and_grad of the loss (adds knot recording + the
              persistent stored-adjoint sweep + reg-step VJP)
  full        the complete train step (adds Adam + TrainState glue)

Derived: reg-step cost = fwd_train − fwd_inf; backward cost =
grad − fwd_train; optimizer/glue = full − grad.

Params are FIXED for the first three arms. Relay freshness: every call
feeds a DIFFERENT eps input (x is scaled by 1+eps, eps ~ 1e-6·call_idx),
so no (executable, inputs) pair ever repeats at the relay level — a
purely in-chain perturbation (the old acc·1e-18 trick) is NOT enough:
it is below f32 ulp (bitwise no-op) and invisible to the relay's
memoization key anyway.  The loss still feeds the next iteration's input
(acc·1e-18) to keep a cross-iteration data dependency in the HLO.  The
full arm evolves params (real training) but gets the eps input too (its
initial TrainState would otherwise repeat).  NFE per arm is reported so
mismatched adaptive work is visible.

Usage: python scripts/flagship_phase_probe.py [rounds=5] [out.json]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import construct_optimizer
from localregneuralde_tpu.harness.losses import logitcrossentropy
from localregneuralde_tpu.harness.train import TrainState, create_train_state
from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
from localregneuralde_tpu.nn import Chain, Dense, Flatten, WrappedFunction

B, F, H = 512, 784, 100
RTOL, MAX_STEPS = 1e-4, 64  # the bench.py headline config
L_SHORT, L_LONG = 6, 18
N_POOL = 8
W_REG = 1.0


def build():
    use_pallas = jax.default_backend() == "tpu"
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(
        td, regularize="unbiased", rtol=RTOL, atol=RTOL,
        max_steps=MAX_STEPS, checkpoint_every=0, use_pallas=use_pallas,
    )
    model = Chain(
        flatten=Flatten(),
        neural_ode=node,
        sol_to_arr=WrappedFunction(diffeqsol_to_array),
        classifier=Dense(F, 10),
    )

    def loss_fn(params, state, x, y, training):
        y_pred, st_ = model(params, state, x, training=training)
        ce = logitcrossentropy(y_pred, y)
        node_st = st_["neural_ode"]
        return ce + W_REG * node_st["reg_val"], st_, node_st["nfe"]

    return model, loss_fn


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else "flagship_phase_probe.json"
    print("backend", jax.default_backend(), flush=True)

    model, loss_fn = build()
    cfg = ExperimentConfig()
    cfg.optimizer.optimizer = "adam"
    cfg.optimizer.learning_rate = 1e-3
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    optimizer, _ = construct_optimizer(cfg)
    ts0 = create_train_state(model, optimizer, jax.random.PRNGKey(0))

    rng = np.random.RandomState(23)
    xs = jnp.asarray(rng.rand(N_POOL, B, 28, 28, 1).astype("float32"))
    ys = jnp.eye(10, dtype=jnp.float32)[
        jnp.asarray(rng.randint(0, 10, size=(N_POOL, B)))
    ]

    params, state = ts0.params, ts0.state

    # --- arm bodies -----------------------------------------------------
    def chain_fwd(training):
        def run(n, eps):
            def body(i, carry):
                acc, nfe = carry
                x = xs[i % N_POOL] * (1.0 + eps) + acc * 1e-18
                loss, _, nfe_i = loss_fn(params, state, x, ys[i % N_POOL],
                                         training)
                return loss, nfe + nfe_i

            return jax.lax.fori_loop(
                0, n, body,
                (jnp.float32(0.0), jnp.zeros((), jnp.int32)))

        return jax.jit(run, static_argnums=0)

    def chain_grad():
        def run(n, eps):
            def body(i, carry):
                acc, nfe = carry
                x = xs[i % N_POOL] * (1.0 + eps) + acc * 1e-18

                def obj(p):
                    loss, _, nfe_i = loss_fn(p, state, x, ys[i % N_POOL],
                                             True)
                    return loss, nfe_i

                (loss, nfe_i), g = jax.value_and_grad(obj, has_aux=True)(
                    params)
                gsum = sum(jnp.sum(jnp.abs(le))
                           for le in jax.tree_util.tree_leaves(g))
                return loss + gsum * 1e-30, nfe + nfe_i

            return jax.lax.fori_loop(
                0, n, body,
                (jnp.float32(0.0), jnp.zeros((), jnp.int32)))

        return jax.jit(run, static_argnums=0)

    def chain_full():
        def run(n, ts, eps):
            def body(i, carry):
                ts, nfe = carry

                def obj(p):
                    loss, st_, nfe_i = loss_fn(
                        p, ts.state, xs[i % N_POOL] * (1.0 + eps),
                        ys[i % N_POOL], True)
                    return loss, (st_, nfe_i)

                (loss, (st_, nfe_i)), g = jax.value_and_grad(
                    obj, has_aux=True)(ts.params)
                opt_state = ts.opt_state
                opt_state.hyperparams["learning_rate"] = jnp.float32(1e-3)
                updates, opt_state = optimizer.update(g, opt_state, ts.params)
                new_params = optax.apply_updates(ts.params, updates)
                ts = TrainState(params=new_params, state=st_,
                                opt_state=opt_state, step=ts.step + 1)
                return ts, nfe + nfe_i

            ts, nfe = jax.lax.fori_loop(0, n, body,
                                        (ts, jnp.zeros((), jnp.int32)))
            return ts.params["classifier"]["w"].sum(), nfe

        return jax.jit(run, static_argnums=0)

    arms = {
        "fwd_inf": chain_fwd(False),
        "fwd_train": chain_fwd(True),
        "grad": chain_grad(),
        "full": chain_full(),
    }

    call_idx = [0]

    def run_arm(name, n):
        fn = arms[name]
        # fresh relay-visible input every call: no (executable, inputs)
        # pair ever repeats, so memoization cannot fire
        call_idx[0] += 1
        eps = jnp.float32(1e-6 * call_idx[0])
        t0 = time.perf_counter()
        if name == "full":
            out, nfe = fn(n, ts0, eps)
        else:
            out, nfe = fn(n, eps)
        _ = float(out)  # host readback barrier
        dt = time.perf_counter() - t0
        return dt, int(nfe)

    # compile all arms at both lengths up front (compile order != timing)
    for name in arms:
        for n in (L_SHORT, L_LONG):
            t0 = time.perf_counter()
            run_arm(name, n)
            print(f"compile+run {name}@{n}: {time.perf_counter()-t0:.1f}s",
                  flush=True)

    slopes = {k: [] for k in arms}
    nfes = {k: [] for k in arms}
    for r in range(rounds):
        for name in arms:
            t_s, nfe_s = run_arm(name, L_SHORT)
            t_l, nfe_l = run_arm(name, L_LONG)
            slope = (t_l - t_s) / (L_LONG - L_SHORT)
            slopes[name].append(slope)
            nfes[name].append((nfe_l - nfe_s) / (L_LONG - L_SHORT))
            print(f"[{r}] {name}: {slope*1e3:.2f} ms/step "
                  f"(nfe/step {nfes[name][-1]:.0f})", flush=True)

    res = {}
    for name in arms:
        res[name] = {
            "ms_per_step": float(np.median(slopes[name]) * 1e3),
            "nfe_per_step": float(np.median(nfes[name])),
        }
    res["derived"] = {
        "reg_step_ms": res["fwd_train"]["ms_per_step"]
        - res["fwd_inf"]["ms_per_step"],
        "backward_ms": res["grad"]["ms_per_step"]
        - res["fwd_train"]["ms_per_step"],
        "optimizer_glue_ms": res["full"]["ms_per_step"]
        - res["grad"]["ms_per_step"],
    }
    print(json.dumps(res, indent=1))
    Path(out_path).write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
