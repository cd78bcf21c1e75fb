#!/usr/bin/env python
"""Latent-ODE (PhysioNet config) TPU numbers — round-2 verdict item 7.

Measures s/step + NFE for the physionet.yaml configuration (tol 1.4e-8,
maxiters 10k, batch 512) under the stored vs interpolating adjoints
(interpolating is the reference's default sensealg, neural_ode.jl:11),
and maps the interp-adjoint feasibility line (max_steps where its
O(max_steps * state) storage still compiles/fits).

Honest relay protocol: interleaved arms, fresh batch values, float()
readback barriers, medians.

Usage: python scripts/latent_probe.py [steps=20] [out.json]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_optimizer,
    construct_time_series,
)
from localregneuralde_tpu.harness.data import synthetic_physionet
from localregneuralde_tpu.harness.train import create_train_state, make_train_step


def make_cfg(adjoint, max_steps):
    cfg = ExperimentConfig()
    cfg.model.model_type = "time_series"
    cfg.model.regularize = "unbiased"
    cfg.model.solver.abstol = 1.4e-8
    cfg.model.solver.reltol = 1.4e-8
    cfg.model.solver.max_steps = max_steps
    cfg.model.solver.checkpoint_every = 0
    cfg.model.solver.adjoint = adjoint
    cfg.loss.w_reg_start = 100.0
    cfg.loss.w_reg_end = 10.0
    cfg.optimizer.optimizer = "adamax"
    cfg.optimizer.learning_rate = 0.01
    return cfg


def build_arm(adjoint, max_steps, tgrid):
    cfg = make_cfg(adjoint, max_steps)
    model = construct_time_series(cfg, saveat=jnp.asarray(tgrid))
    loss_fn, w_sched = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, optimizer)
    return dict(ts=ts, step=step, w=w_sched, times=[], nfes=[])


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_path = sys.argv[2] if len(sys.argv) > 2 else "latent_probe.json"
    print("backend", jax.default_backend(), flush=True)

    data, mask, tgrid = synthetic_physionet(n=2048, t_steps=49, features=37,
                                            seed=0)
    dt = np.concatenate([tgrid[1:] - tgrid[:-1], [0.0]]).astype("float32")
    dtb = np.broadcast_to(dt[None, :, None], (2048, 49, 1)).copy()

    arms = {}
    order_names = []
    for adjoint in ("stored", "interpolating"):
        name = adjoint
        t0 = time.time()
        try:
            arms[name] = build_arm(adjoint, 10000, tgrid)
            # compile + first step
            b = (jnp.asarray(data[:512]), jnp.asarray(mask[:512]),
                 jnp.asarray(dtb[:512]))
            a = arms[name]
            a["ts"], loss, st = a["step"](a["ts"], b, (100.0, 0.1), 0.01)
            _ = float(loss)
            print(f"{name}: compile+first {time.time()-t0:.0f}s", flush=True)
            order_names.append(name)
        except Exception as e:
            print(f"{name}: FAILED at max_steps=10000: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            arms.pop(name, None)

    rng = np.random.RandomState(7)
    for i in range(1, steps + 1):
        idx = rng.randint(0, 2048, 512)
        b = (jnp.asarray(data[idx]), jnp.asarray(mask[idx]),
             jnp.asarray(dtb[idx]))
        order = order_names if i % 2 else order_names[::-1]
        for name in order:
            a = arms[name]
            t0 = time.time()
            a["ts"], loss, st = a["step"](a["ts"], b, (100.0, 0.1), 0.01)
            _ = float(loss)
            el = time.time() - t0
            if i > 3:
                a["times"].append(el)
                a["nfes"].append(int(st["nfe"]))
        if i % 5 == 0:
            print(f"  {i}: " + " ".join(
                f"{n}={arms[n]['times'][-1]*1e3:.0f}ms"
                f"(nfe {arms[n]['nfes'][-1]})" for n in order_names
            ), flush=True)

    out = {}
    for name, a in arms.items():
        med = float(np.median(a["times"]))
        out[name] = dict(
            median_step_s=med, mean_nfe=float(np.mean(a["nfes"])),
            nfe_per_s=float(np.mean(a["nfes"])) / med,
        )
        print(name, out[name], flush=True)

    # interp-adjoint feasibility line: binary-probe max_steps capacities
    feas = {}
    for ms in (512, 2048, 10000):
        if "interpolating" in out and ms == 10000:
            feas[ms] = True
            continue
        try:
            t0 = time.time()
            a = build_arm("interpolating", ms, tgrid)
            b = (jnp.asarray(data[:512]), jnp.asarray(mask[:512]),
                 jnp.asarray(dtb[:512]))
            a["ts"], loss, st = a["step"](a["ts"], b, (100.0, 0.1), 0.01)
            _ = float(loss)
            feas[ms] = True
            print(f"interp feasible at max_steps={ms} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            feas[ms] = False
            print(f"interp INFEASIBLE at max_steps={ms}: "
                  f"{type(e).__name__}", flush=True)
    out["interp_feasibility"] = {str(k): v for k, v in feas.items()}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
