#!/usr/bin/env python
"""Measure solver.grad_precision='default' (one-pass backward recompute) at
the paper tolerance (VERDICT round-3 ask #4: push paper_tol_nfe_per_sec
from 40k toward the 57k headline).

At rtol 1.4e-8 the solve runs precision='highest' (6-pass bf16 matmuls);
the stored-adjoint backward re-evaluates the stage matmuls at the same
precision although they only serve GRADIENTS — the controller's accept/dt
decisions were fixed in the forward. grad_precision='default' drops the
backward recompute + cotangent dots to the one-pass MXU rate.

Measures, on the flagship MNIST MLP at mlp.yaml semantics:
 1. gradient quality: relative L2 error + cosine similarity of the
    'default' gradient vs the 'match' gradient on identical (params, batch)
 2. step time: block-interleaved A/B in ONE process (10 steps/block,
    fresh batches every call, float(loss) readback barrier — relay
    doctrine, CLAUDE.md)
 3. short-training equivalence: N steps per arm from the same init; final
    train NFE + CE within noise

Usage: python scripts/grad_precision_probe.py [blocks=6] [steps_per_block=10] [train_steps=150]
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("LRN_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.train import create_train_state, make_train_step


def make_cfg(grad_precision):
    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = "unbiased"
    cfg.model.image_size = [28, 28]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 100
    cfg.model.solver.abstol = 1.4e-8
    cfg.model.solver.reltol = 1.4e-8
    cfg.model.solver.max_steps = 512
    cfg.model.solver.checkpoint_every = 16
    cfg.model.solver.grad_precision = grad_precision
    cfg.loss.w_reg_start = 2.5
    cfg.loss.w_reg_end = 1.0
    cfg.loss.w_reg_decay = "exponential"
    cfg.dataset.train_batchsize = 512
    cfg.optimizer.optimizer = "adam"
    cfg.optimizer.learning_rate = 1e-3
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    return cfg


def build(grad_precision):
    cfg = make_cfg(grad_precision)
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, optimizer)
    grad = jax.jit(
        lambda ts, batch, w: jax.grad(
            lambda p: loss_fn(model, p, ts.state, batch, w, training=True)[0]
        )(ts.params)
    )
    return cfg, model, loss_fn, ts, step, grad


def main():
    blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spb = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    train_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 150

    x_train, y_train, _, _ = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=512, seed=0, difficulty="hard"
    )
    y_oh = one_hot(y_train, 10)
    rng = np.random.RandomState(0)

    def batch(i):
        idx = rng.randint(0, len(x_train), 512)
        return jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx])

    arms = {}
    for gp in ("match", "default"):
        arms[gp] = build(gp)

    # --- 1. gradient quality on identical (params, batch)
    xb, yb = batch(0)
    out = {}
    g_ref = arms["match"][5](arms["match"][3], (xb, yb), 2.5)
    g_fast = arms["default"][5](arms["default"][3], (xb, yb), 2.5)
    v_ref, _ = ravel_pytree(jax.device_get(g_ref))
    v_fast, _ = ravel_pytree(jax.device_get(g_fast))
    rel = float(np.linalg.norm(v_fast - v_ref) / np.linalg.norm(v_ref))
    cos = float(
        np.dot(v_fast, v_ref)
        / (np.linalg.norm(v_fast) * np.linalg.norm(v_ref))
    )
    out["grad_rel_l2"] = rel
    out["grad_cosine"] = cos
    print(f"gradient: rel_l2={rel:.3e} cosine={cos:.8f}", flush=True)

    # --- 2. block-interleaved step timing
    times = {"match": [], "default": []}
    states = {gp: arms[gp][3] for gp in arms}
    # one warmup dispatch per arm (compile)
    for gp in arms:
        ts2, loss, _ = arms[gp][4](states[gp], batch(1), 2.5, 1e-3)
        float(loss)
        states[gp] = ts2
    for b in range(blocks):
        for gp in ("match", "default") if b % 2 == 0 else ("default", "match"):
            step = arms[gp][4]
            t0 = time.perf_counter()
            for i in range(spb):
                states[gp], loss, _ = step(states[gp], batch(2 + b), 2.5, 1e-3)
            lf = float(loss)  # readback barrier
            times[gp].append((time.perf_counter() - t0) / spb)
    for gp in times:
        med = float(np.median(times[gp]))
        out[f"step_s_{gp}"] = med
        out[f"step_band_{gp}"] = [float(min(times[gp])), float(max(times[gp]))]
        print(f"{gp}: median step {med*1e3:.2f} ms "
              f"band [{min(times[gp])*1e3:.2f}, {max(times[gp])*1e3:.2f}]",
              flush=True)
    out["speedup"] = out["step_s_match"] / out["step_s_default"]

    # --- 3. short-training equivalence (each arm from the same init)
    trajs = {}
    for gp in ("match", "default"):
        cfg, model, loss_fn, ts, step, _ = build(gp)
        r = np.random.RandomState(7)
        nfes, ces = [], []
        for s in range(1, train_steps + 1):
            idx = r.randint(0, len(x_train), 512)
            xb = jnp.asarray(x_train[idx])
            yb = jnp.asarray(y_oh[idx])
            ts, loss, stats = step(ts, (xb, yb), 2.5, 1e-3)
            if s % 25 == 0:
                nfes.append(int(stats["nfe"]))
                ces.append(float(stats["ce_loss"]))
        trajs[gp] = {"nfe": nfes, "ce": ces}
        print(f"{gp}: train nfe={nfes} ce={[round(c,3) for c in ces]}",
              flush=True)
    out["train"] = trajs
    out["backend"] = jax.default_backend()

    with open("grad_precision_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("grad_rel_l2", "grad_cosine", "speedup")}, indent=1))


if __name__ == "__main__":
    main()
