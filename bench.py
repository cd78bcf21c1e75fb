#!/usr/bin/env python
"""Benchmark: MNIST MLP Neural-ODE training throughput on the local device.

Measures steady-state full training steps/sec (forward adaptive solve +
reverse through the solver + local-regularization step + Adam update) on the
flagship config (batch 512, hidden 100, unbiased error-estimate reg).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) — vs_baseline is computed
against the first recorded value of this benchmark (stored in
``bench_baseline.json`` on first successful run) so rounds are comparable.
"""
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from localregneuralde_tpu.harness.config import ExperimentConfig
    from localregneuralde_tpu.harness.construct import (
        construct_loss,
        construct_model,
        construct_optimizer,
    )
    from localregneuralde_tpu.harness.train import (
        create_train_state,
        make_train_step,
    )

    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = "unbiased"
    cfg.model.image_size = [28, 28]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 100
    cfg.model.solver.abstol = 1e-4
    cfg.model.solver.reltol = 1e-4
    cfg.model.solver.max_steps = 64
    cfg.model.solver.checkpoint_every = 8
    cfg.optimizer.optimizer = "adam"
    cfg.optimizer.learning_rate = 1e-3
    cfg.optimizer.scheduler.lr_scheduler = "constant"

    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
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

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        ts, loss, stats = train_step(ts, (x, y), 1.0, 1e-3)
    loss.block_until_ready()
    elapsed = time.perf_counter() - t0
    steps_per_sec = n_iters / elapsed

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = steps_per_sec
        with open(baseline_path, "w") as f:
            json.dump(
                {"metric": "mnist_node_train_steps_per_sec",
                 "value": steps_per_sec}, f,
            )

    print(json.dumps({
        "metric": "mnist_node_train_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
