"""Gradient accumulation under the gspmd sharded step (round-3 lifted
restriction): ``make_sharded_train_step(grad_accumulation=N)`` runs the
SAME microbatch scan as the single-device path (the body is the shared
``_fused_step_body``) on the DP-sharded batch — one optimizer update on
the mean of N sequential microbatch gradients."""
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
    make_train_step,
)
from localregneuralde_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
    shard_train_state,
    train_state_shardings,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup():
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
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    return model, loss_fn, optimizer


def test_gspmd_grad_accum_matches_single_device():
    model, loss_fn, optimizer = _setup()
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 8, 8, 1))
    y = jnp.eye(10)[jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)]

    single = make_train_step(model, loss_fn, optimizer, grad_accumulation=2)
    ts_ref = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    ts_ref, loss_ref, stats_ref = single(ts_ref, (x, y), 1.0, 1e-3)

    mesh = make_mesh({"data": 8})
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    ts_sh = train_state_shardings(ts, mesh)
    ts = shard_train_state(ts, mesh, shardings=ts_sh)
    step = make_sharded_train_step(
        model, loss_fn, optimizer, mesh, ts_shardings=ts_sh,
        grad_accumulation=2,
    )
    ts, loss_sh, stats_sh = step(ts, shard_batch((x, y), mesh), 1.0, 1e-3)

    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-4)
    # merged stats: NFE summed over microbatches, y_pred re-concatenated
    assert int(stats_sh["nfe"]) == int(stats_ref["nfe"])
    np.testing.assert_allclose(
        np.asarray(stats_ref["y_pred"]),
        np.asarray(jax.device_get(stats_sh["y_pred"])),
        atol=2e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ts_ref.params),
        jax.tree_util.tree_leaves(ts.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=2e-5
        )
    # second call runs (donated layouts round-trip)
    ts, _, _ = step(ts, shard_batch((x, y), mesh), 1.0, 1e-3)
