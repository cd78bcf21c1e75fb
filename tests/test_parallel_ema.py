"""Params-EMA under the parallel train steps (gspmd + shardmap).

Round-3 addition: ``train.ema_decay`` originally required
``data_parallel='none'``; the parallel step bodies dropped the
``TrainState.ema`` field entirely, so resuming an EMA checkpoint under a
mesh either crashed on a pytree-spec mismatch or silently deleted the
EMA. These tests pin the lifted restriction: the EMA updates under both
parallel modes (identically to the single-device step under gspmd, whose
grads are bitwise the global-batch grads) and rides through unchanged
when ``ema_decay=0`` (the resume case).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.train import (
    create_train_state,
    init_ema,
    make_train_step,
)
from localregneuralde_tpu.parallel import (
    make_mesh,
    make_shardmap_train_step,
    make_sharded_train_step,
    shard_batch,
    shard_train_state,
    train_state_shardings,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

DECAY = 0.9


def _tiny_cfg():
    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = "unbiased"
    cfg.model.image_size = [8, 8]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 16
    cfg.model.solver.abstol = 1e-2
    cfg.model.solver.reltol = 1e-2
    cfg.model.solver.max_steps = 16
    cfg.model.solver.checkpoint_every = 4
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    return cfg


def _batch(B=16):
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 8, 8, 1))
    y = jnp.eye(10)[jax.random.randint(jax.random.PRNGKey(2), (B,), 0, 10)]
    return x, y


def _setup():
    cfg = _tiny_cfg()
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = init_ema(create_train_state(model, optimizer, jax.random.PRNGKey(0)))
    return model, loss_fn, optimizer, ts


def test_gspmd_ema_follows_its_params_trajectory():
    # the EMA recursion is checked against the sharded run's OWN params
    # snapshots (ema_k = d·ema_{k-1} + (1-d)·params_k) — NOT against a
    # single-device run: Adam normalizes near-zero gradient components,
    # so f32 psum reduction-order noise legitimately flips their update
    # signs between the two runs (loss/param-scale parity is covered by
    # test_parallel.py).
    model, loss_fn, optimizer, ts = _setup()
    x, y = _batch()

    mesh = make_mesh({"data": 8})
    ts_sh = shard_train_state(ts, mesh)
    step = make_sharded_train_step(
        model, loss_fn, optimizer, mesh,
        ts_shardings=train_state_shardings(ts, mesh), ema_decay=DECAY,
    )
    data = shard_batch((x, y), mesh)
    ema = [np.asarray(l) for l in jax.tree_util.tree_leaves(ts.params)]
    for _ in range(2):
        ts_sh, _, _ = step(ts_sh, data, 1.0, 1e-3)
        ema = [
            DECAY * e + (1 - DECAY) * np.asarray(p)
            for e, p in zip(ema, jax.tree_util.tree_leaves(ts_sh.params))
        ]

    for a, b in zip(ema, jax.tree_util.tree_leaves(ts_sh.ema)):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-6, atol=1e-8)
    # EMA lags params (it is a distinct trajectory, not a copy)
    p0 = jax.tree_util.tree_leaves(ts_sh.params)[0]
    e0 = jax.tree_util.tree_leaves(ts_sh.ema)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))


def test_gspmd_ema_rides_through_when_disabled():
    # the resume-from-EMA-checkpoint case: ema present, ema_decay=0 —
    # the field must survive the sharded step unchanged (this used to
    # fail with a pytree-structure mismatch against the pinned specs)
    model, loss_fn, optimizer, ts = _setup()
    x, y = _batch()
    ema_before = [np.asarray(l) for l in jax.tree_util.tree_leaves(ts.ema)]

    mesh = make_mesh({"data": 8})
    ts_sh = shard_train_state(ts, mesh)
    step = make_sharded_train_step(
        model, loss_fn, optimizer, mesh,
        ts_shardings=train_state_shardings(ts, mesh), ema_decay=0.0,
    )
    ts_sh, _, _ = step(ts_sh, shard_batch((x, y), mesh), 1.0, 1e-3)

    assert ts_sh.ema is not None
    for a, b in zip(ema_before, jax.tree_util.tree_leaves(ts_sh.ema)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_shardmap_ema_updates_and_stays_replicated():
    model, loss_fn, optimizer, ts = _setup()
    x, y = _batch()

    mesh = make_mesh({"data": 8})
    ts_sh = shard_train_state(ts, mesh)
    step = make_shardmap_train_step(
        model, loss_fn, optimizer, mesh, ema_decay=DECAY
    )
    data = shard_batch((x, y), mesh)
    params0 = [np.asarray(l) for l in jax.tree_util.tree_leaves(ts.params)]
    ts_sh, _, _ = step(ts_sh, data, 1.0, 1e-3)
    params1 = [
        np.asarray(l) for l in jax.tree_util.tree_leaves(ts_sh.params)
    ]
    # one step from ema==params0: ema' = d*params0 + (1-d)*params1
    for p0, p1, e in zip(
        params0, params1, jax.tree_util.tree_leaves(ts_sh.ema)
    ):
        np.testing.assert_allclose(
            DECAY * p0 + (1 - DECAY) * p1, np.asarray(e),
            rtol=1e-5, atol=1e-7,
        )
    # second step runs (donated state round-trips the spec)
    ts_sh, _, _ = step(ts_sh, data, 1.0, 1e-3)
    assert ts_sh.ema is not None
