#!/usr/bin/env python
"""TPU ablation probe for the CIFAR conv NeuralODE step cost.

RESULTS.md round-2 gap: ~21 ms pure conv compute vs ~150 ms/step total at
batch 32 — this probe decomposes the other ~130 ms. Ablations:

  fwd        forward-only loss (stored primal incl. knot recording)
  train      full train step (fwd + sweep + reg step + Adam)
  train_none regularize='none' train step (no reg step)
  train_nobn BatchNorm replaced by identity in the dynamics
  cap512     max_steps=512 (single-level knots) vs the 10k hybrid

Timing: dependent chains (fresh values each call), one readback barrier.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def build_model(max_steps, with_bn=True):
    from localregneuralde_tpu.models import (
        AugmenterLayer, NeuralODE, TDChain, diffeqsol_to_array,
    )
    from localregneuralde_tpu.nn import (
        BatchNorm, Chain, Conv, Dense, Flatten, WrappedFunction,
    )

    def bn(c, act=None):
        return BatchNorm(c, act) if with_bn else (
            WrappedFunction(jax.nn.gelu) if act else WrappedFunction(
                lambda x: x
            )
        )

    node_core = TDChain(
        Chain(Conv((3, 3), 9, 64, use_bias=False), bn(64, "gelu")),
        Chain(Conv((3, 3), 65, 64, use_bias=False), bn(64, "gelu")),
        Conv((3, 3), 65, 8, use_bias=False),
    )
    node = NeuralODE(
        node_core, regularize="unbiased", rtol=1e-4, atol=1e-4,
        max_steps=max_steps, adjoint="stored",
    )
    return Chain(
        augment=AugmenterLayer(Conv((3, 3), 3, 5), axis=-1),
        bn=bn(8),
        neural_ode=node,
        sol_to_arr=WrappedFunction(diffeqsol_to_array),
        flat=Flatten(),
        classifier=Dense(32 * 32 * 8, 10),
    )


def main():
    from localregneuralde_tpu.harness.config import ExperimentConfig
    from localregneuralde_tpu.harness.construct import construct_optimizer
    from localregneuralde_tpu.harness.losses import logitcrossentropy
    from localregneuralde_tpu.harness.train import (
        create_train_state, make_train_step,
    )

    B = 32
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (B, 32, 32, 3))
    y = jnp.eye(10, dtype=jnp.float32)[
        jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 10)
    ]
    results = {}

    def loss_maker(reg=True):
        def loss_fn(model, params, st, data, w_reg, *, training=True):
            x, yy = data
            y_pred, st_ = model(params, st, x, training=training)
            ce = logitcrossentropy(y_pred, yy)
            node_st = st_["neural_ode"]
            l = ce + (w_reg * node_st["reg_val"] if reg else 0.0)
            return l, st_, {"nfe": node_st["nfe"]}
        return loss_fn

    def time_train(tag, model, loss_fn):
        cfg = ExperimentConfig()
        optimizer, _ = construct_optimizer(cfg)
        ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
        step = make_train_step(model, loss_fn, optimizer)
        ts, loss, stats = step(ts, (x0, y), 1.0, 1e-3)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        nfes = []
        for _ in range(N):
            ts, loss, stats = step(ts, (x0, y), 1.0, 1e-3)
            nfes.append(stats["nfe"])
        jax.block_until_ready(loss)
        el = (time.perf_counter() - t0) / N
        results[tag + "_s"] = round(el, 4)
        results[tag + "_nfe"] = round(
            float(jnp.mean(jnp.stack(nfes).astype(jnp.float32))), 1
        )
        print(tag, results[tag + "_s"], "s/step, nfe",
              results[tag + "_nfe"], flush=True)
        return ts

    def time_fwd(tag, model, loss_fn):
        params, state = model.init(jax.random.PRNGKey(0))

        @jax.jit
        def fwd(p, st, x):
            l, st_, stats = loss_fn(model, p, st, (x, y), 1.0)
            return l, st_

        l, st_ = fwd(params, state, x0)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        x = x0
        for _ in range(N):
            l, st_ = fwd(params, state, x)
            x = x0 * 0.999 + 0.001 * l  # fresh values, device-side
        jax.block_until_ready(l)
        results[tag + "_s"] = round((time.perf_counter() - t0) / N, 4)
        print(tag, results[tag + "_s"], "s", flush=True)

    m10k = build_model(10000)
    time_fwd("fwd10k", m10k, loss_maker())
    time_train("train10k", m10k, loss_maker())
    m512 = build_model(512)
    time_fwd("fwd512", m512, loss_maker())
    time_train("train512", m512, loss_maker())
    time_train("train512_nobn", build_model(512, with_bn=False),
               loss_maker())

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
