#!/usr/bin/env python
"""Diagnose the round-3 CIFAR study baseline collapse (VERDICT Weak #1):
the `none` arm trains to 91% train-mode accuracy but evaluates at 16%.

Loads the saved none-arm checkpoint and (a) inspects BatchNorm running
stats, (b) evaluates the params in eval mode vs train mode on the same
synthetic test set, CPU f32 — separating "BN running stats poisoned"
from "TPU bf16 eval artifact".
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from localregneuralde_tpu.harness import define_configuration
from localregneuralde_tpu.harness.checkpoint import load_checkpoint
from localregneuralde_tpu.harness.construct import construct_model, construct_optimizer
from localregneuralde_tpu.harness.data import get_classification_data
from localregneuralde_tpu.harness.train import create_train_state

CONFIG = REPO / "experiments" / "cifar10" / "cnn.yaml"
CKPT = (
    REPO / "checkpoints" / "cifar_nfe_study_600_s0_hard" /
    "config-cns_none_w1to1_s0_regularizer-none_seed-0_id-" /
    "model_current.ckpt"
)

CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2023, 0.1994, 0.2010], np.float32)


def bn_stat_report(state, prefix=""):
    """Walk the model-state pytree printing running mean/var ranges."""
    if isinstance(state, dict):
        for k, v in state.items():
            if k in ("running_mean", "running_var", "mean", "var") and hasattr(
                v, "shape"
            ):
                arr = np.asarray(v, np.float64)
                print(
                    f"  {prefix}/{k}: shape={arr.shape} "
                    f"min={arr.min():.3e} max={arr.max():.3e} "
                    f"mean={arr.mean():.3e} finite={np.isfinite(arr).all()}"
                )
            else:
                bn_stat_report(v, f"{prefix}/{k}")
    elif isinstance(state, (list, tuple)):
        for i, v in enumerate(state):
            bn_stat_report(v, f"{prefix}[{i}]")


def main():
    cfg = define_configuration([], str(CONFIG))
    cfg.model.model_type = "cifar10_cnn"
    cfg.dataset.difficulty = "hard"
    cfg.seed = 0

    model = construct_model(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts0 = create_train_state(model, optimizer, jax.random.PRNGKey(cfg.seed))
    state0 = ts0.state
    ck = load_checkpoint(str(CKPT))
    assert ck is not None, "checkpoint missing"
    ts = ck["tstate"]
    params, mstate = ts.params, ts.state
    print("=== BN running stats (none arm, step 600) ===")
    bn_stat_report(mstate)

    x_train, y_train, x_test, y_test, is_real = get_classification_data(cfg)
    x_test = ((x_test - CIFAR_MEAN) / CIFAR_STD).astype(np.float32)
    xb, yb = x_test[:256], y_test[:256]

    def acc(logits):
        return float((np.argmax(np.asarray(logits), -1) == yb).mean() * 100)

    y_eval, st_eval = model(params, mstate, jnp.asarray(xb), training=False)
    print(f"eval-mode  acc (CPU f32): {acc(y_eval):.2f}%  "
          f"nfe={float(st_eval.get('neural_ode', {}).get('nfe', -1)) if isinstance(st_eval, dict) else '?'}")

    y_tr, _ = model(params, mstate, jnp.asarray(xb), training=True)
    print(f"train-mode acc (CPU f32): {acc(y_tr):.2f}%")

    # fresh (init) state with trained params: is it the running stats?
    y_fresh, _ = model(params, state0, jnp.asarray(xb), training=False)
    print(f"eval-mode acc, INIT state (CPU f32): {acc(y_fresh):.2f}%")


if __name__ == "__main__":
    main()
