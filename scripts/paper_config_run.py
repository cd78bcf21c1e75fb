#!/usr/bin/env python
"""Run the reference's exact MNIST MLP configuration (mlp.yml semantics):
Tsit5, abstol=reltol=1.4e-8, batch 512, Adam 1e-3 constant, w_reg 2.5→1.0
exponential over the full schedule — comparing regularize none vs unbiased.

Usage: python scripts/paper_config_run.py [steps=1500] [max_steps=512] \
           [out.json] [arms=none,unbiased] [save_dir] [difficulty=easy] \
           [seed=cfg-default]

seed varies model init AND batch order (the task data stays fixed) for
multiseed robustness runs.

difficulty='hard' uses the non-saturating synthetic variant (accuracy
plateaus below ~93%), making the matched-accuracy control discriminating
at the paper tolerance.
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

from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.losses import accuracy
from localregneuralde_tpu.harness.train import create_train_state, make_train_step


def parse_arm(spec):
    """Arm syntax: 'none' | 'unbiased' (shipped mlp.yml w 2.5→1 exp) |
    'stiffness:W' (mlp_stiff.yml semantics: stiffness_estimate at const
    weight W, unbiased t1 sampling — reference perform_step.jl:40-47)."""
    if spec.startswith("stiffness"):
        w = float(spec.split(":")[1]) if ":" in spec else 0.1
        return dict(name=spec, regularize="unbiased",
                    regularize_type="stiffness_estimate",
                    w0=w, w1=w, decay="constant")
    return dict(name=spec, regularize=spec,
                regularize_type="error_estimate",
                w0=2.5, w1=1.0, decay="exponential")


def make_cfg(arm, total_steps, max_steps):
    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = arm["regularize"]
    cfg.model.regularize_type = arm["regularize_type"]
    cfg.model.image_size = [28, 28]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 100
    cfg.model.solver.abstol = 1.4e-8
    cfg.model.solver.reltol = 1.4e-8
    cfg.model.solver.max_steps = max_steps
    cfg.model.solver.checkpoint_every = 16
    cfg.loss.w_reg_start = arm["w0"]
    cfg.loss.w_reg_end = arm["w1"]
    cfg.loss.w_reg_decay = arm["decay"]
    cfg.dataset.train_batchsize = 512
    cfg.train.total_steps = total_steps
    cfg.optimizer.optimizer = "adam"
    cfg.optimizer.learning_rate = 1e-3
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    return cfg


def run(arm_spec, steps, max_steps, save_params=None, difficulty="easy",
        seed=None):
    arm = parse_arm(arm_spec)
    regularize = arm["regularize"]
    cfg = make_cfg(arm, steps, max_steps)
    if seed is not None:
        cfg.seed = seed
    model = construct_model(cfg)
    loss_fn, w_sched = construct_loss(cfg)
    optimizer, lr_sched = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(cfg.seed))
    train_step = make_train_step(model, loss_fn, optimizer)

    x_train, y_train, x_test, y_test = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=2048, seed=0,
        difficulty=difficulty,
    )
    y_oh = one_hot(y_train, 10)
    rng = np.random.RandomState(cfg.seed)

    log = []
    t_start = time.time()
    for step in range(1, steps + 1):
        idx = rng.randint(0, len(x_train), 512)
        xb, yb = jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx])
        w = float(w_sched(step)) if regularize != "none" else 0.0
        ts, loss, stats = train_step(ts, (xb, yb), w, float(lr_sched(step)))
        if step % 50 == 0 or step == 1:
            rec = dict(
                step=step, nfe=int(stats["nfe"]),
                ce=float(stats["ce_loss"]),
                acc=float(accuracy(stats["y_pred"], yb)),
                reg=float(stats["reg_val"]),
                success=bool(stats.get("solver_success", True)),
            )
            log.append(rec)
            print(f"  [{regularize}] {rec}", flush=True)
    wall = time.time() - t_start

    if save_params:
        import pickle

        with open(save_params, "wb") as f:
            pickle.dump(
                {"params": jax.device_get(ts.params),
                 "state": jax.device_get(ts.state)}, f,
            )
        print(f"saved trained params to {save_params}", flush=True)

    # eval NFE on the inference (while-loop) path
    xe = jnp.asarray(x_test[:1024])
    ye = jnp.asarray(one_hot(y_test[:1024], 10))
    loss_e, st_e, stats_e = loss_fn(
        model, ts.params, ts.state, (xe, ye), 0.0, training=False
    )
    return dict(
        arm=arm["name"], regularize=regularize,
        regularize_type=arm["regularize_type"],
        w_reg=[arm["w0"], arm["w1"]], log=log, wall_s=wall,
        final_eval_acc=float(accuracy(stats_e["y_pred"], ye)),
        final_eval_nfe=int(stats_e["nfe"]),
        final_eval_success=bool(stats_e.get("solver_success", True)),
        all_train_success=all(r["success"] for r in log),
        max_steps=max_steps,
        difficulty=difficulty,
        seed=int(cfg.seed),
        backend=jax.default_backend(),
    )


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    out = sys.argv[3] if len(sys.argv) > 3 else "paper_config_run.json"
    arms = sys.argv[4].split(",") if len(sys.argv) > 4 else ["none", "unbiased"]
    save_dir = sys.argv[5] if len(sys.argv) > 5 else None
    if save_dir in ("-", ""):
        save_dir = None
    difficulty = sys.argv[6] if len(sys.argv) > 6 else "easy"
    seed = int(sys.argv[7]) if len(sys.argv) > 7 else None
    results = []
    for reg in arms:
        print(f"=== regularize={reg} (tol 1.4e-8, max_steps={max_steps}, "
              f"difficulty={difficulty}, seed={seed}) ===", flush=True)
        tag = reg.replace(":", "_")
        sp = f"{save_dir}/paper_params_{tag}.pkl" if save_dir else None
        results.append(run(reg, steps, max_steps, save_params=sp,
                           difficulty=difficulty, seed=seed))
        with open(out, "w") as f:  # per-arm incremental dump
            json.dump(results, f, indent=1)
    if len(results) < 2:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(results[0]["regularize"], "final_nfe",
              results[0]["final_eval_nfe"])
        return
    base_rows = [r for r in results if r["regularize"] == "none"]
    if base_rows:
        base = base_rows[0]["final_eval_nfe"]
        for r in results:
            if r is not base_rows[0]:
                r["nfe_reduction_vs_none"] = base / max(
                    r["final_eval_nfe"], 1
                )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    for r in results:
        print(r["arm"], "final_nfe", r["final_eval_nfe"], "acc",
              round(r["final_eval_acc"], 2), "wall_s", round(r["wall_s"], 1))


if __name__ == "__main__":
    main()
