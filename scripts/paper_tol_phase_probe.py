#!/usr/bin/env python
"""Where does the paper-tolerance train step spend its time?

Replicates the grad_precision_probe config (flagship MLP, rtol 1.4e-8,
'highest', max_steps=512 dense / or 10000 two-level via argv), counts
which kernels engage (persistent fwd / dense sweep / two-level sweep /
per-step fused bwd / XLA fallback), and times value-only vs
value_and_grad vs full step with fresh batches + readback barriers.

Usage: python scripts/paper_tol_phase_probe.py [max_steps=512] [iters=10] [grad_precision=match]
"""
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

from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.train import create_train_state, make_train_step

CALLS = {"persist_fwd": 0, "dense_sweep": 0, "two_level_sweep": 0,
         "chain_sweep": 0, "step_bwd": 0}


def instrument():
    import localregneuralde_tpu.models.neural_ode as node_mod
    import localregneuralde_tpu.ops.pallas.fused_mlp_bwd as mbwd
    import localregneuralde_tpu.ops.pallas.fused_solve as fsol
    import localregneuralde_tpu.ops.pallas.fused_solve_bwd as fbwd

    def wrap(mod, name, key):
        orig = getattr(mod, name)

        def wrapped(*a, **k):
            out = orig(*a, **k)
            if out is not None:
                CALLS[key] += 1
            return out

        setattr(mod, name, wrapped)

    wrap(fsol, "persistent_tsit5_solve", "persist_fwd")
    wrap(fbwd, "persistent_stored_sweep", "dense_sweep")
    wrap(fbwd, "persistent_two_level_sweep", "two_level_sweep")
    wrap(fbwd, "persistent_chain_sweep", "chain_sweep")
    wrap(mbwd, "fused_step_bwd", "step_bwd")
    # the model modules captured these at import time inside methods —
    # they import lazily per call, so module-level patching is enough
    return node_mod


def main():
    max_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    gp = sys.argv[3] if len(sys.argv) > 3 else "match"
    instrument()

    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = "unbiased"
    cfg.model.image_size = [28, 28]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 100
    cfg.model.solver.abstol = 1.4e-8
    cfg.model.solver.reltol = 1.4e-8
    cfg.model.solver.max_steps = max_steps
    cfg.model.solver.checkpoint_every = 16
    cfg.model.solver.grad_precision = gp
    cfg.loss.w_reg_start = 2.5
    cfg.loss.w_reg_end = 1.0
    cfg.dataset.train_batchsize = 512
    cfg.optimizer.learning_rate = 1e-3
    cfg.optimizer.scheduler.lr_scheduler = "constant"

    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, optimizer)

    x_train, y_train, _, _ = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=512, seed=0, difficulty="hard"
    )
    y_oh = one_hot(y_train, 10)
    rng = np.random.RandomState(0)

    def batch(i):
        idx = rng.randint(0, len(x_train), 512)
        return jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx])

    @jax.jit
    def value_only(ts, data, w):
        return loss_fn(model, ts.params, ts.state, data, w, training=True)[0]

    @jax.jit
    def value_and_grad(ts, data, w):
        l, g = jax.value_and_grad(
            lambda p: loss_fn(model, p, ts.state, data, w, training=True)[0]
        )(ts.params)
        return l, jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b * b), g, 0.0
        )

    print("trace-time engagement:", flush=True)
    # compile all three programs
    t0 = time.time()
    float(value_only(ts, batch(0), 2.5))
    print(f"  value_only compiled {time.time()-t0:.1f}s calls={CALLS}",
          flush=True)
    t0 = time.time()
    l, gn = value_and_grad(ts, batch(0), 2.5)
    float(l)
    print(f"  value_and_grad compiled {time.time()-t0:.1f}s calls={CALLS}",
          flush=True)
    t0 = time.time()
    ts2, loss, stats = step(ts, batch(0), 2.5, 1e-3)
    float(loss)
    print(f"  full step compiled {time.time()-t0:.1f}s calls={CALLS} "
          f"nfe={int(stats['nfe'])}", flush=True)
    ts = ts2  # step donates its input TrainState — the old ts is deleted

    def clock(fn, tag, uses_step=False):
        nonlocal ts
        ws = []
        for i in range(iters):
            t0 = time.perf_counter()
            if uses_step:
                ts, loss, stats = fn(ts, batch(10 + i), 2.5, 1e-3)
                float(loss)
            else:
                out = fn(ts, batch(10 + i), 2.5)
                loss = out[0] if isinstance(out, tuple) else out
                float(loss)
            ws.append(time.perf_counter() - t0)
        med = float(np.median(ws))
        print(f"  {tag}: median {med*1e3:.2f} ms "
              f"band [{min(ws)*1e3:.1f}, {max(ws)*1e3:.1f}]", flush=True)
        return med

    print(f"timing ({iters} iters, fresh batches, readback barrier):",
          flush=True)
    t_v = clock(value_only, "value_only  (fwd solve + loss)")
    t_vg = clock(value_and_grad, "value_and_grad (fwd + sweep)")
    t_s = clock(step, "full train step", uses_step=True)
    print(f"  => bwd sweep ≈ {1e3*(t_vg - t_v):.2f} ms, "
          f"opt+dispatch ≈ {1e3*(t_s - t_vg):.2f} ms", flush=True)
    print(f"final stats: nfe={int(stats['nfe'])} "
          f"backend={jax.default_backend()} grad_precision={gp}")


if __name__ == "__main__":
    main()
