#!/usr/bin/env python
"""Train-step timing at the reference's EXACT flagship capacity:
tol 1.4e-8, maxiters 10_000 (construct.jl:196) — persistent two-level
Pallas path vs the XLA loops.

Honest relay timing: fresh batch values every step, float(loss) readback
as the barrier, steady-state median over the post-warmup steps.

Usage: python scripts/paper_speed_probe.py [steps=30] [max_steps=10000] [arms]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.data import one_hot, synthetic_classification
from localregneuralde_tpu.harness.train import create_train_state, make_train_step
from paper_config_run import make_cfg


def run(use_persistent, steps, max_steps):
    cfg = make_cfg("unbiased", steps, max_steps)
    cfg.model.solver.use_persistent = use_persistent
    model = construct_model(cfg)
    loss_fn, w_sched = construct_loss(cfg)
    optimizer, lr_sched = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(cfg.seed))
    train_step = make_train_step(model, loss_fn, optimizer)

    x_train, y_train, *_ = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=64, seed=0
    )
    y_oh = one_hot(y_train, 10)
    rng = np.random.RandomState(1234)

    times, nfes = [], []
    for step in range(1, steps + 1):
        idx = rng.randint(0, len(x_train), 512)
        xb, yb = jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx])
        t0 = time.time()
        ts, loss, stats = train_step(ts, (xb, yb), float(w_sched(step)), 1e-3)
        _ = float(loss)  # host readback barrier
        el = time.time() - t0
        nfe = int(stats["nfe"])
        if step > 5:
            times.append(el)
            nfes.append(nfe)
        if step in (1, 2, 6) or step % 10 == 0:
            print(f"  [{'persistent' if use_persistent else 'xla'}] "
                  f"{step}: {el*1e3:.1f} ms nfe={nfe} "
                  f"success={bool(stats.get('solver_success', True))}",
                  flush=True)
    med = float(np.median(times))
    return dict(
        use_persistent=use_persistent, median_step_s=med,
        mean_nfe=float(np.mean(nfes)),
        nfe_per_s=float(np.mean(nfes)) / med,
        steps_measured=len(times),
    )


def run_interleaved(steps, max_steps):
    """Relay-fair A/B: BOTH train states advance in the same loop, steps
    alternating — order effects (relay warm-up, allocator state) hit both
    arms equally. This is the honest protocol; sequential arms measured a
    spurious ±30% order effect (run 1 vs run 2 of this script)."""
    arms = {}
    for name, up in (("persistent", True), ("xla", False)):
        cfg = make_cfg("unbiased", steps, max_steps)
        cfg.model.solver.use_persistent = up
        model = construct_model(cfg)
        loss_fn, w_sched = construct_loss(cfg)
        optimizer, _ = construct_optimizer(cfg)
        ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
        arms[name] = dict(
            ts=ts, step=make_train_step(model, loss_fn, optimizer),
            w=w_sched, times=[], nfes=[],
        )

    x_train, y_train, *_ = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=64, seed=0
    )
    y_oh = one_hot(y_train, 10)
    rng = np.random.RandomState(1234)
    for step in range(1, steps + 1):
        idx = rng.randint(0, len(x_train), 512)
        xb, yb = jnp.asarray(x_train[idx]), jnp.asarray(y_oh[idx])
        order = ("persistent", "xla") if step % 2 else ("xla", "persistent")
        for name in order:
            a = arms[name]
            t0 = time.time()
            a["ts"], loss, stats = a["step"](
                a["ts"], (xb, yb), float(a["w"](step)), 1e-3
            )
            _ = float(loss)
            el = time.time() - t0
            if step > 5:
                a["times"].append(el)
                a["nfes"].append(int(stats["nfe"]))
        if step % 10 == 0:
            print(
                f"  {step}: "
                + " ".join(
                    f"{n}={arms[n]['times'][-1]*1e3:.1f}ms" for n in arms
                ),
                flush=True,
            )
    out = {}
    for name, a in arms.items():
        med = float(np.median(a["times"]))
        out[name] = dict(
            median_step_s=med, mean_nfe=float(np.mean(a["nfes"])),
            nfe_per_s=float(np.mean(a["nfes"])) / med,
            steps_measured=len(a["times"]),
        )
    return out


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    mode = sys.argv[3] if len(sys.argv) > 3 else "interleave"
    if mode == "interleave":
        out = run_interleaved(steps, max_steps)
    else:
        out = {}
        for a in mode.split(","):
            up = a == "p"
            print(f"=== {'persistent' if up else 'xla'} "
                  f"max_steps={max_steps} ===", flush=True)
            t0 = time.time()
            out["persistent" if up else "xla"] = run(up, steps, max_steps)
            print(f"  arm wall (incl compile): {time.time()-t0:.0f}s",
                  flush=True)
    if len(out) == 2:
        out["speedup"] = out["xla"]["median_step_s"] / out[
            "persistent"]["median_step_s"]
        print("SPEEDUP persistent vs xla:", round(out["speedup"], 3))
    with open("paper_speed_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
