#!/usr/bin/env python
"""TPU probe for the two-level persistent path.

1. Replay fidelity ON HARDWARE: the windowed sweep's replayed states vs
   the dense-recorded trajectory (the bitwise-consistency claim).
2. Two-level vs dense persistent gradients at flagship shapes.

Usage: python scripts/two_level_probe.py [B] [F] [H]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from localregneuralde_tpu.models import NeuralODE, TDChain, diffeqsol_to_array
from localregneuralde_tpu.nn import Chain, Dense, WrappedFunction
from localregneuralde_tpu.ops.pallas.fused_solve import persistent_tsit5_solve
from localregneuralde_tpu.ops.pallas.fused_solve_bwd import (
    persistent_stored_sweep,
    persistent_two_level_sweep,
)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 784
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    print("backend", jax.default_backend(), "B F H =", B, F, H, flush=True)
    rt = 1e-6
    td = TDChain(Dense(F + 1, H, "tanh"), Dense(H + 1, F))
    ps, _ = td.init(jax.random.PRNGKey(0))
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, F))
    saveat = jnp.asarray([1.0])

    t0 = time.time()
    full = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=rt, atol=rt, saveat_arr=saveat,
        max_steps=64, record_knots=True,
    )
    n = int(full["naccept"])
    print(f"dense fwd: naccept={n} ({time.time()-t0:.1f}s incl compile)",
          flush=True)

    DC, W = 4, 64  # single window covering the whole solve
    t0 = time.time()
    tl = persistent_tsit5_solve(
        ps, x, (0.0, 1.0), rtol=rt, atol=rt, saveat_arr=saveat,
        max_steps=64, record_knots=True, knot_dense_cap=DC, knot_stride=W,
        record_ks=False,
    )
    print(f"two-level fwd: naccept={int(tl['naccept'])} "
          f"({time.time()-t0:.1f}s incl compile)", flush=True)
    assert int(tl["naccept"]) == n
    same_final = np.array_equal(
        np.asarray(full["y_final"]), np.asarray(tl["y_final"])
    )
    print("fwd y_final bitwise (dense vs two-level cfg):", same_final,
          flush=True)

    ct_ys = jnp.zeros((1, B, F))
    ct_y = jnp.ones((B, F))
    t0 = time.time()
    (win, locals_) = persistent_two_level_sweep(
        ps, tl["knot_ts"], tl["knot_us"], tl["naccept"], saveat, ct_ys,
        ct_y, tl["ckpt_ts"], tl["ckpt_us"], tl["ckpt_ks"], tl["ckpt_dts"],
        tl["ckpt_qolds"], t_end=1.0, rtol=rt, atol=rt, max_steps=64,
        stride=W, dense_cap=DC, _return_locals=True,
    )
    print(f"two-level sweep ran ({time.time()-t0:.1f}s incl compile)",
          flush=True)
    ku = np.asarray(full["knot_us"])
    lu = np.asarray(locals_)
    drifts = [float(np.max(np.abs(ku[i] - lu[i]))) for i in range(n + 1)]
    print("replay drift per step:", ["%.2e" % d for d in drifts], flush=True)
    print("REPLAY BITWISE ON TPU:" , all(d == 0.0 for d in drifts), flush=True)

    dense = persistent_stored_sweep(
        ps, full["knot_ts"], full["knot_us"], full["naccept"], saveat,
        ct_ys, ct_y,
    )
    fa, _ = ravel_pytree(dense[2])
    fb, _ = ravel_pytree(win[2])
    print("sweep dp maxdiff:", float(jnp.max(jnp.abs(fa - fb))),
          "scale:", float(jnp.max(jnp.abs(fa))), flush=True)
    print("sweep a_u maxdiff:",
          float(jnp.max(jnp.abs(dense[0] - win[0]))), flush=True)

    # ---- end-to-end NeuralODE grads: two-level vs dense
    def build(kw):
        node = NeuralODE(
            td, regularize="unbiased", rtol=rt, atol=rt, max_steps=64,
            use_pallas=True, use_persistent=True, knot_window=kw,
        )
        return Chain(
            neural_ode=node,
            sol_to_arr=WrappedFunction(diffeqsol_to_array),
            classifier=Dense(F, 10),
        )

    m_dense, m_two = build(None), build(4)
    params, state = m_dense.init(jax.random.PRNGKey(0))

    def lossfn(m):
        def run(p):
            y, st_ = m(p, state, x, training=True)
            return jnp.sum(y**2) + 10.0 * st_["neural_ode"]["reg_val"], st_

        return run

    for name, m in (("dense", m_dense), ("two-level", m_two)):
        t0 = time.time()
        (l, st), g = jax.jit(
            jax.value_and_grad(lossfn(m), has_aux=True)
        )(params)
        gf, _ = ravel_pytree(g)
        print(f"{name}: loss={float(l):.6f} nfe={int(st['neural_ode']['nfe'])} "
              f"|g|max={float(jnp.max(jnp.abs(gf))):.4f} "
              f"({time.time()-t0:.1f}s incl compile)", flush=True)
        if name == "dense":
            g_dense = gf
        else:
            print("e2e grad maxdiff vs dense:",
                  float(jnp.max(jnp.abs(gf - g_dense))), flush=True)


if __name__ == "__main__":
    main()
