#!/usr/bin/env python
"""Benchmark: MNIST MLP Neural-ODE training throughput on the local device.

Protocol: the flagship config (batch 512, hidden 100, unbiased error-estimate
regularization, fused Pallas TD-MLP kernels) trained with the fused jitted
step. Because the adaptive step count drifts as parameters evolve, the
headline metric is **dynamics evaluations per second** (NFE/s) through full
training steps — forward solve + reverse through the solver + reg step +
Adam — which normalizes throughput against NFE drift. Median over trials.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline compares
against the first recorded TPU value (bench_baseline.json).
"""
import json
import os
import statistics
import time

import jax
import jax.numpy as jnp

N_TRIALS = 8
N_ITERS = 40


def main():
    from localregneuralde_tpu.harness.config import ExperimentConfig
    from localregneuralde_tpu.harness.construct import (
        construct_loss,
        construct_optimizer,
    )
    from localregneuralde_tpu.harness.losses import logitcrossentropy
    from localregneuralde_tpu.harness.train import (
        create_train_state,
        make_train_step,
    )
    from localregneuralde_tpu.models import (
        NeuralODE,
        TDChain,
        diffeqsol_to_array,
    )
    from localregneuralde_tpu.nn import Chain, Dense, Flatten, WrappedFunction

    cfg = ExperimentConfig()
    cfg.model.regularize = "unbiased"
    cfg.optimizer.optimizer = "adam"
    cfg.optimizer.learning_rate = 1e-3
    cfg.optimizer.scheduler.lr_scheduler = "constant"

    F, H = 784, 100
    use_pallas = jax.default_backend() == "tpu"
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(
        td, regularize="unbiased", rtol=1e-4, atol=1e-4,
        max_steps=64, checkpoint_every=0, use_pallas=use_pallas,
    )
    model = Chain(
        flatten=Flatten(),
        neural_ode=node,
        sol_to_arr=WrappedFunction(diffeqsol_to_array),
        classifier=Dense(F, 10),
    )

    def loss_fn(model, params, state, data, w_reg, *, training=True):
        x, y = data
        y_pred, st_ = model(params, state, x, training=training)
        ce = logitcrossentropy(y_pred, y)
        node_st = st_["neural_ode"]
        return ce + w_reg * node_st["reg_val"], st_, {
            "nfe": node_st["nfe"], "ce": ce,
        }

    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    train_step = make_train_step(model, loss_fn, optimizer)

    batch = 512
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (batch, 28, 28, 1), jnp.float32)
    y = jnp.eye(10, dtype=jnp.float32)[
        jax.random.randint(key, (batch,), 0, 10)
    ]

    # warmup / compile
    ts, loss, stats = train_step(ts, (x, y), 1.0, 1e-3)
    loss.block_until_ready()

    rates, nfe_rates = [], []
    for _ in range(N_TRIALS):
        nfes = []
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            ts, loss, stats = train_step(ts, (x, y), 1.0, 1e-3)
            nfes.append(stats["nfe"])  # stays on device; no per-iter sync
        loss.block_until_ready()
        elapsed = time.perf_counter() - t0
        total_nfe = int(jnp.sum(jnp.stack(nfes)))
        rates.append(N_ITERS / elapsed)
        nfe_rates.append(total_nfe / elapsed)

    steps_per_sec = statistics.median(rates)
    nfe_per_sec = statistics.median(nfe_rates)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    record = {
        "metric": "mnist_node_train_nfe_per_sec",
        "value": nfe_per_sec,
        "steps_per_sec": steps_per_sec,
        "backend": jax.default_backend(),
    }
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = nfe_per_sec
        with open(baseline_path, "w") as f:
            json.dump(record, f)

    print(json.dumps({
        "metric": "mnist_node_train_nfe_per_sec",
        "value": round(nfe_per_sec, 1),
        "unit": "dynamics evals/s (through full train steps)",
        "vs_baseline": round(nfe_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
