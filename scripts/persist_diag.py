#!/usr/bin/env python
"""Phase diagnosis of persistent vs XLA at the paper tolerance (1.4e-8).

Arms (one TPU claim, sequential):
  fwd-eval timing (inference path), train-step timing, both persistent/xla,
  plus knot_window sensitivity and an rtol=1e-4 regression check.

Usage: python scripts/persist_diag.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
from localregneuralde_tpu.nn import Chain, Dense, Flatten, WrappedFunction

F, H, B = 784, 100, 512


def build(rtol, use_persistent, knot_window=None, max_steps=10000):
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    node = NeuralODE(
        td, regularize="unbiased", rtol=rtol, atol=rtol,
        max_steps=max_steps, checkpoint_every=0, use_pallas=True,
        use_persistent=use_persistent, knot_window=knot_window,
    )
    return Chain(
        neural_ode=node, sol_to_arr=WrappedFunction(diffeqsol_to_array),
        classifier=Dense(F, 10),
    )


def timeit(fn, n=12, warm=3):
    ts = []
    for i in range(n):
        x = 0.3 * jax.random.normal(jax.random.PRNGKey(100 + i), (B, F))
        t0 = time.time()
        out = fn(x)
        _ = float(out)  # readback barrier
        if i >= warm:
            ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    print("backend", jax.default_backend(), flush=True)
    results = {}

    for rtol in (1.4e-8, 1e-4):
        for up in (True, False):
            m = build(rtol, up)
            params, state = m.init(jax.random.PRNGKey(0))

            def fwd(x, m=m, params=params, state=state):
                y, st = m(params, state, x, training=False)
                return jnp.sum(y) + st["neural_ode"]["nfe"].astype(jnp.float32)

            def trainval(x, m=m, params=params, state=state):
                def loss(p):
                    y, st_ = m(p, state, x, training=True)
                    return jnp.sum(y**2) + 2.5 * st_["neural_ode"]["reg_val"]

                l, g = jax.value_and_grad(loss)(params)
                gf = jax.flatten_util.ravel_pytree(g)[0]
                return l + jnp.sum(jnp.abs(gf)) * 0.0

            fj = jax.jit(fwd)
            tj = jax.jit(trainval)
            t0 = time.time()
            name = f"rtol{rtol:g}_{'per' if up else 'xla'}"
            tf = timeit(fj)
            tt = timeit(tj)
            results[name] = (tf, tt)
            print(f"{name}: fwd {tf*1e3:.1f} ms  train {tt*1e3:.1f} ms "
                  f"(arm wall {time.time()-t0:.0f}s)", flush=True)

    # knot_window sensitivity at paper tolerance, persistent
    for kw in (128, 256):
        m = build(1.4e-8, True, knot_window=kw)
        params, state = m.init(jax.random.PRNGKey(0))

        def trainval(x, m=m, params=params, state=state):
            def loss(p):
                y, st_ = m(p, state, x, training=True)
                return jnp.sum(y**2) + 2.5 * st_["neural_ode"]["reg_val"]

            l, g = jax.value_and_grad(loss)(params)
            gf = jax.flatten_util.ravel_pytree(g)[0]
            return l + jnp.sum(jnp.abs(gf)) * 0.0

        tt = timeit(jax.jit(trainval))
        print(f"paper persistent knot_window={kw}: train {tt*1e3:.1f} ms",
              flush=True)

    print(results, flush=True)


if __name__ == "__main__":
    main()
