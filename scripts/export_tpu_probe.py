#!/usr/bin/env python
"""TPU probe: AOT export of the flagship model WITH persistent Pallas
kernels engaged.

Question: does ``jax.export`` serialize the Mosaic custom calls of the
persistent solve kernel (platform-specific StableHLO custom_call with a
Mosaic payload), and does the deserialized program reproduce the live
model bitwise? If not, exports must use the XLA path (use_pallas=False)
— either answer is a documented caveat for the serving story.

Writes export_tpu_probe.json at the repo root.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(use_pallas):
    from bench import _flagship_ode
    from localregneuralde_tpu.utils.export import (
        export_model,
        load_exported,
        save_exported,
    )

    model, _, _ = _flagship_ode(1e-4, 64)
    # _flagship_ode gates use_pallas on the backend; override explicitly
    model.layers["neural_ode"].use_pallas = use_pallas
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.RandomState(5).rand(512, 28, 28, 1).astype("float32")
    )
    out = {"use_pallas": use_pallas}
    try:
        y_live, st_live = model(params, state, x, training=False)
        y_live = np.asarray(y_live)
        exp = export_model(model, params, state, x)
        path = f"/tmp/export_probe_{int(use_pallas)}.stablehlo"
        save_exported(exp, path)
        out["artifact_mb"] = round(os.path.getsize(path) / 1e6, 3)
        fn = load_exported(path)
        t0 = time.perf_counter()
        y_served = np.asarray(fn(x))
        out["first_call_s"] = round(time.perf_counter() - t0, 2)
        out["max_abs_diff"] = float(np.max(np.abs(y_served - y_live)))
        out["bitwise"] = bool((y_served == y_live).all())
        out["nfe_live"] = int(st_live["neural_ode"]["nfe"])
        out["ok"] = True
    except Exception as e:  # document the failure mode verbatim
        out["ok"] = False
        out["error"] = f"{type(e).__name__}: {str(e)[:300]}"
    return out


def main():
    res = {
        "backend": jax.default_backend(),
        "pallas_on": run(True),
        "pallas_off": run(False),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "export_tpu_probe.json",
    )
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
