#!/usr/bin/env python
"""Score-SDE demo (BASELINE config 5): NFE-vs-sample-quality for the
adaptive reverse-SDE sampler, with a score network trained WITH vs WITHOUT
local solver regularization.

The paper's thesis applied to diffusion: the sampler's cost is NFE through
an adaptive solver; shaping the model during training with the solver's
LOCAL error estimate (one fenced SRI step of the reverse SDE per training
step — O(1) overhead, exactly the NeuralDSDE 'unbiased' recipe,
``src/layers/neural_sde.jl:88-104``) buys samples of the same quality at
fewer NFE.

Task: 2-D mixture of 4 Gaussians (analytic ground truth). Score net:
time-dependent MLP (TDChain). Training: denoising score matching
(±w_reg · EEst·dt). Evaluation: for a tolerance sweep, draw 4096 samples
with ``sample_vpsde`` and record (drift+diffusion NFE, energy distance to
ground-truth samples, moment errors).

Usage: python scripts/score_sde_demo.py [train_steps=3000] [out.json]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from localregneuralde_tpu.core.containers import ArrayAndTime, get_array
from localregneuralde_tpu.models.score_sde import VPSDE, sample_vpsde
from localregneuralde_tpu.models import TDChain
from localregneuralde_tpu.nn import Dense
from localregneuralde_tpu.sde.step import sri_step
from localregneuralde_tpu.sde.tableaus import get_sri_tableau

MEANS = np.array([[1.5, 1.5], [-1.5, 1.5], [1.5, -1.5], [-1.5, -1.5]],
                 np.float32)
STD = 0.3


def draw_data(key, n):
    k1, k2 = jax.random.split(key)
    comp = jax.random.randint(k1, (n,), 0, 4)
    eps = jax.random.normal(k2, (n, 2))
    return jnp.asarray(MEANS)[comp] + STD * eps


def energy_distance(x, y):
    """Energy distance between two sample sets (unbiased-ish, subsampled)."""
    def pd(a, b):
        return jnp.sqrt(
            jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1) + 1e-12
        ).mean()

    return float(2 * pd(x, y) - pd(x, x) - pd(y, y))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "score_sde_demo.json"
    sde = VPSDE()
    net = TDChain(Dense(3, 64, "tanh"), Dense(65, 64, "tanh"), Dense(65, 2))

    def score_apply(p, u, t):
        y, _ = net(p, {"layer_0": {}, "layer_1": {}, "layer_2": {}},
                   ArrayAndTime(u, t))
        return get_array(y)

    def dsm_loss(p, key):
        """Denoising score matching: E || sigma*s(u_t,t) + eps ||^2."""
        kt, kx, ke = jax.random.split(key, 3)
        x0 = draw_data(kx, 256)
        t = jax.random.uniform(kt, (256, 1), minval=1e-3, maxval=1.0)
        alpha = jnp.exp(2.0 * sde.marginal_log_alpha(t))
        sigma = jnp.sqrt(1.0 - alpha)
        eps = jax.random.normal(ke, x0.shape)
        ut = jnp.sqrt(alpha) * x0 + sigma * eps
        # per-sample t: fold t into the input via the time channel by
        # evaluating at per-row times (TDChain takes scalar t; use the
        # closed-over per-row trick: append t as feature via vmap)
        s = jax.vmap(lambda u, tt: score_apply(p, u[None], tt[0])[0])(ut, t)
        return jnp.mean(jnp.sum((sigma * s + eps) ** 2, -1))

    def reg_val(p, key):
        """One fenced SRI step of the REVERSE SDE at a sampled (u, t):
        EEst*dt — the local regularizer (NeuralDSDE 'unbiased' recipe)."""
        kt, kx, ke, kw, kz = jax.random.split(key, 5)
        t1 = jax.random.uniform(kt, (), minval=0.05, maxval=0.95)
        x0 = draw_data(kx, 256)
        alpha = jnp.exp(2.0 * sde.marginal_log_alpha(t1))
        u1 = jnp.sqrt(alpha) * x0 + jnp.sqrt(1 - alpha) * jax.random.normal(
            ke, x0.shape
        )
        u1 = jax.lax.stop_gradient(u1)

        def drift(u, tau, p_, st):
            t = 1.0 - tau
            b = sde.beta(t)
            return -(-0.5 * b * u - b * score_apply(p_, u, t)), st

        def diffusion(u, tau, p_, st):
            return jnp.sqrt(sde.beta(1.0 - tau)) * jnp.ones_like(u), st

        tau1 = 1.0 - t1
        dt_r = jnp.float32(0.01)
        sqdt = jnp.sqrt(dt_r)
        dW = jax.random.normal(kw, u1.shape) * sqdt
        dZ = jax.random.normal(kz, u1.shape) * sqdt
        res = sri_step(
            drift, diffusion, u1, tau1, dt_r, dW, dZ, p, None, None,
            1e-2, 1e-2, 1 / 6, tableau=get_sri_tableau("sosri"),
        )
        return res.eest * dt_r

    def train(w_reg, seed):
        p, _ = net.init(jax.random.PRNGKey(seed))
        opt = optax.adam(1e-3)
        ost = opt.init(p)

        @jax.jit
        def step(p, ost, key):
            def loss(p_):
                kd, kr = jax.random.split(key)
                l = dsm_loss(p_, kd)
                if w_reg > 0:
                    l = l + w_reg * reg_val(p_, kr)
                return l

            l, g = jax.value_and_grad(loss)(p)
            up, ost2 = opt.update(g, ost)
            return optax.apply_updates(p, up), ost2, l

        for i in range(steps):
            p, ost, l = step(p, ost, jax.random.PRNGKey(1000 + i))
        return p, float(l)

    truth = np.asarray(draw_data(jax.random.PRNGKey(123), 4096))
    results = []
    for name, w in (("plain", 0.0), ("regularized", 1.0)):
        t0 = time.time()
        p, final_loss = train(w, seed=0)
        print(f"{name}: trained {steps} steps ({time.time()-t0:.0f}s, "
              f"final loss {final_loss:.4f})", flush=True)

        for rtol in (3e-1, 1e-1, 3e-2, 1e-2):
            # score_module engages the persistent whole-solve Pallas
            # kernel ('vpsde' family, fused_sde_solve.py) when servable;
            # the XLA-loop fallback evaluates the SAME module
            samp, sol = jax.jit(
                lambda key, p_, r=rtol: sample_vpsde(
                    None, (4096, 2), key, p_, rtol=r, atol=r,
                    solver="sosri", max_steps=4096, score_module=net,
                )
            )(jax.random.PRNGKey(7), p)
            nfe = int(sol.nfe_drift) + int(sol.nfe_diffusion)
            s = np.asarray(samp)
            ed = energy_distance(
                jnp.asarray(s[:2048]), jnp.asarray(truth[:2048])
            )
            rec = dict(
                arm=name, rtol=rtol, nfe=nfe,
                naccept=int(sol.naccept), nreject=int(sol.nreject),
                energy_distance=round(ed, 5),
                mean_err=round(float(np.abs(s.mean(0)).max()), 4),
                std_err=round(
                    float(np.abs(s.std(0) - truth.std(0)).max()), 4
                ),
                success=bool(sol.success),
            )
            results.append(rec)
            print("  ", rec, flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
