#!/usr/bin/env python
"""TPU probe: persistent-loop solve kernel vs the XLA adaptive loop.

Flagship shapes (B=512, F=784, H=100), rtol=atol=1e-4, max_steps=64.
Timing: dependent chains (each solve consumes the previous output) so the
relay cannot memoize, with a single host readback as the barrier
(CLAUDE.md honest-timing recipe). Reports per-solve / per-train-step time
for both paths.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def chain_time(fn, x0, n=N):
    x = fn(x0)  # warmup/compile
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n, x


def main():
    from localregneuralde_tpu.models import (
        NeuralODE, TDChain, diffeqsol_to_array,
    )
    from localregneuralde_tpu.nn import Chain, Dense, WrappedFunction
    from localregneuralde_tpu.harness.construct import construct_optimizer
    from localregneuralde_tpu.harness.config import ExperimentConfig
    from localregneuralde_tpu.harness.losses import logitcrossentropy
    from localregneuralde_tpu.harness.train import (
        create_train_state, make_train_step,
    )

    F, H, B = 784, 100, 512
    x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (B, F))
    results = {}

    for tag, up in (("xla_loop", False), ("persistent", True)):
        td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
        node = NeuralODE(
            td, regularize="unbiased", rtol=1e-4, atol=1e-4, max_steps=64,
            use_pallas=True, use_persistent=up,
        )
        params, state = node.init(jax.random.PRNGKey(0))

        # --- eval solve (adjoint 'none', no knots)
        @jax.jit
        def eval_solve(x, params=params, state=state, node=node):
            sol, st = node(params, state, x, training=False)
            return 0.99 * sol.y_final + 0.01 * jnp.tanh(x)

        dt_eval, xe = chain_time(eval_solve, x0)
        nfe = int(
            node(params, state, x0, training=False)[1]["nfe"]
        )
        results[f"{tag}_eval_s"] = round(dt_eval, 6)
        results[f"{tag}_eval_nfe"] = nfe

        # --- full train step (stored adjoint + reg step + Adam)
        model = Chain(
            neural_ode=node,
            sol_to_arr=WrappedFunction(diffeqsol_to_array),
            classifier=Dense(F, 10),
        )

        def loss_fn(model, params, st, data, w_reg, *, training=True):
            x, y = data
            y_pred, st_ = model(params, st, x, training=training)
            ce = logitcrossentropy(y_pred, y)
            return ce + w_reg * st_["neural_ode"]["reg_val"], st_, {
                "nfe": st_["neural_ode"]["nfe"],
            }

        cfg = ExperimentConfig()
        optimizer, _ = construct_optimizer(cfg)
        ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
        train_step = make_train_step(model, loss_fn, optimizer)
        y = jnp.eye(10, dtype=jnp.float32)[
            jax.random.randint(jax.random.PRNGKey(2), (B,), 0, 10)
        ]

        ts, loss, stats = train_step(ts, (x0, y), 1.0, 1e-3)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        nfes = []
        for _ in range(N):
            ts, loss, stats = train_step(ts, (x0, y), 1.0, 1e-3)
            nfes.append(stats["nfe"])
        jax.block_until_ready(loss)
        el = (time.perf_counter() - t0) / N
        results[f"{tag}_train_s"] = round(el, 6)
        results[f"{tag}_train_nfe"] = round(
            float(jnp.mean(jnp.stack(nfes).astype(jnp.float32))), 1
        )
        results[f"{tag}_train_nfe_per_s"] = round(
            float(jnp.sum(jnp.stack(nfes))) / (el * N), 1
        )

    results["eval_speedup"] = round(
        results["xla_loop_eval_s"] / results["persistent_eval_s"], 3
    )
    results["train_speedup"] = round(
        results["xla_loop_train_s"] / results["persistent_train_s"], 3
    )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
