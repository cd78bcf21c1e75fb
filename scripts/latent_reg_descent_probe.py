# Pure-reg descent FROM THE TRAINED baseline (hard stand-in, seed 0):
# does a smoother minimum exist near the trained none-arm params, and how
# much masked-NLL does moving toward it cost? This measures the local
# NFE<->fit tradeoff that combined training failed to exploit.
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
import numpy as np
import optax

from localregneuralde_tpu.harness.checkpoint import load_checkpoint
from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import construct_time_series
from localregneuralde_tpu.harness.data import synthetic_physionet

cfg = ExperimentConfig()
cfg.model.model_type = "time_series"
cfg.model.regularize = "unbiased"
cfg.model.solver.abstol = 1.4e-8
cfg.model.solver.reltol = 1.4e-8
cfg.model.solver.max_steps = 10000
cfg.model.solver.checkpoint_every = 0

data, mask, tgrid = synthetic_physionet(
    n=2048, t_steps=49, features=cfg.model.ts_in_dims, seed=0,
    difficulty="hard")
dt = np.concatenate([tgrid[1:] - tgrid[:-1], [0.0]]).astype(np.float32)
B = 256
dtb = np.broadcast_to(dt[None, :, None], (B, 49, 1)).copy()
xb, mb = jnp.asarray(data[:B]), jnp.asarray(mask[:B])
x = jnp.concatenate([xb, mb, jnp.asarray(dtb)], axis=-1)

model = construct_time_series(cfg, saveat=jnp.asarray(tgrid))
ck = load_checkpoint(
    "/root/repo/checkpoints/latent_nfe_study_3000_s0_hard/"
    "config-lns_none_w1to1_s0_regularizer-none_seed-0_id-/model_best.ckpt")
ts = ck["tstate"]
params = jax.tree_util.tree_map(jnp.asarray, ts.params)
state = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a) if hasattr(a, "shape") else a, ts.state)

def fwd(p, st):
    y, st_ = model(p, st, x, training=True)
    mse = jnp.sum(jnp.sum(jnp.square((y[..., :mb.shape[-1]] if y.shape[-1]!=mb.shape[-1] else y) - xb)**0 ,axis=(1,2)))  # placeholder
    return st_

def reg_and_metrics(p, st):
    y, st_ = model(p, st, x, training=True)
    mse = jnp.sum(
        jnp.sum(jnp.square((y - xb) * mb), axis=(1, 2))
        / jnp.sum(mb, axis=(1, 2))
    ) / B
    return st_["neural_ode"]["reg_val"], (st_, mse, st_["neural_ode"]["nfe"])

opt = optax.adamax(1e-3)
ost = opt.init(params)

@jax.jit
def step(p, st, ost):
    (rv, (st_, mse, nfe)), g = jax.value_and_grad(
        reg_and_metrics, has_aux=True)(p, st)
    up, ost = opt.update(g, ost, p)
    return optax.apply_updates(p, up), st_, ost, rv, mse, nfe

import json
traj = []
for i in range(61):
    params, state, ost, rv, mse, nfe = step(params, state, ost)
    if i % 5 == 0:
        row = {"iter": i, "reg_val": float(rv), "mse": float(mse),
               "nfe": int(nfe)}
        traj.append(row)
        print(row, flush=True)
json.dump(traj, open("/root/repo/latent_reg_descent_probe.json", "w"), indent=1)
