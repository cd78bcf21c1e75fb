#!/usr/bin/env python
"""Probe WHY the unregularized paper-config baseline saturates max_steps.

Loads the trained unregularized params (paper_config_run.py ... save_dir),
then measures the inference-path NFE of one forward solve at tol 1.4e-8:

  (a) float32, max_steps 40_000  — if still truncated, the failure is not
      "a bit more capacity needed";
  (b) float64, max_steps 262_144 — the true step requirement. If (b)
      finishes with far fewer steps than (a) allows, the fp32 failure is a
      *precision floor*: at rtol 1.4e-8 the embedded error estimate's fp32
      rounding noise (~1e-7·|u| from cancelling stage sums) exceeds the
      tolerance, so acceptance becomes impossible once the dynamics leave
      the trivially-smooth regime. The reference runs Float32 with
      maxiters=10_000 (construct.jl:196) and hits the same wall — its
      baseline NFE is equally truncation-capped.

Usage: python scripts/fp64_baseline_probe.py artifacts/paper_params_none.pkl [out.json]
Run on CPU (f64); forces the platform itself.
"""
import json
import pickle
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from localregneuralde_tpu.harness.data import synthetic_classification  # noqa: E402
from scripts.paper_config_run import make_cfg  # noqa: E402
from localregneuralde_tpu.harness.construct import construct_model  # noqa: E402


def main():
    pkl = sys.argv[1] if len(sys.argv) > 1 else "artifacts/paper_params_none.pkl"
    out = sys.argv[2] if len(sys.argv) > 2 else "fp64_baseline_probe.json"
    with open(pkl, "rb") as f:
        saved = pickle.load(f)

    x_train, y_train, x_test, y_test = synthetic_classification(
        (28, 28), 1, 10, n_train=8192, n_test=2048, seed=0
    )
    xe32 = jnp.asarray(x_test[:64], jnp.float32)

    results = {}
    for label, dtype, max_steps in (
        ("fp32_40k", jnp.float32, 40_000),
        ("fp64_262k", jnp.float64, 262_144),
    ):
        cfg = make_cfg("none", 1, max_steps)
        model = construct_model(cfg)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), saved["params"]
        )
        state = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else jnp.asarray(a),
            saved["state"],
        )
        x = xe32.astype(dtype)
        t0 = time.time()
        _, st_ = model(params, state, x, training=False)
        node = st_["neural_ode"]
        rec = dict(
            nfe=int(node["nfe"]),
            success=bool(node["success"]),
            wall_s=round(time.time() - t0, 1),
            max_steps=max_steps,
        )
        results[label] = rec
        print(label, rec, flush=True)

    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
