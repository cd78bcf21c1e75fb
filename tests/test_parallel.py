"""Sharded-training tests on the virtual 8-device CPU mesh: DP×TP train
step parity with the single-device step, and batch sharding placement."""
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
from localregneuralde_tpu.harness.train import create_train_state, make_train_step
from localregneuralde_tpu.parallel import (
    make_mesh,
    make_param_shardings,
    make_sharded_train_step,
    shard_batch,
    shard_train_state,
    sharding_rules_for_mlp_tp,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


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


def _setup(mesh_axes):
    cfg = _tiny_cfg()
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    mesh = make_mesh(mesh_axes)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    return cfg, model, loss_fn, optimizer, mesh, ts


def test_dp_tp_step_matches_single_device():
    cfg, model, loss_fn, optimizer, mesh, ts = _setup(
        {"data": 4, "model": 2}
    )
    rules = sharding_rules_for_mlp_tp("model")

    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 1))
    y = jnp.eye(10)[jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)]

    # single-device reference
    single_step = make_train_step(model, loss_fn, optimizer)
    ts_ref = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    ts_ref, loss_ref, _ = single_step(ts_ref, (x, y), 1.0, 1e-3)

    # sharded
    ts_sh = shard_train_state(ts, mesh, rules)
    sharded_step = make_sharded_train_step(
        model, loss_fn, optimizer, mesh, rules=rules
    )
    xb, yb = shard_batch((x, y), mesh)
    ts_sh, loss_sh, _ = sharded_step(ts_sh, (xb, yb), 1.0, 1e-3)

    np.testing.assert_allclose(
        float(loss_ref), float(loss_sh), rtol=1e-4
    )
    # parameters after one update agree
    for a, b in zip(
        jax.tree_util.tree_leaves(ts_ref.params),
        jax.tree_util.tree_leaves(ts_sh.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=2e-5
        )


def test_param_sharding_rules_apply():
    cfg, model, loss_fn, optimizer, mesh, ts = _setup(
        {"data": 4, "model": 2}
    )
    rules = sharding_rules_for_mlp_tp("model")
    shardings = make_param_shardings(ts.params, mesh, rules)
    from jax.sharding import PartitionSpec as P

    flat, _ = jax.tree_util.tree_flatten_with_path(shardings)
    tp_sharded = [
        s for path, s in flat
        if "layer_0" in "/".join(str(p) for p in path) and s.spec != P()
    ]
    assert tp_sharded, "expected the first dynamics layer to be TP-sharded"


def test_shard_batch_places_on_mesh():
    mesh = make_mesh({"data": 8})
    x = jnp.ones((16, 4))
    (xs,) = shard_batch((x,), mesh)
    assert len(xs.sharding.device_set) == 8
