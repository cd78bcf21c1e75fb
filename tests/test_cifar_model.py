"""Conv Neural-ODE (CIFAR family) test — the survey's hard-part 5:
BatchNorm state must thread through every solver stage and update."""
import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.harness.config import ExperimentConfig
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
)


def test_cifar_cnn_trains_with_batchnorm_in_dynamics():
    cfg = ExperimentConfig()
    cfg.model.model_type = "cifar10_cnn"
    cfg.model.image_size = [8, 8]
    cfg.model.in_channels = 3
    cfg.model.regularize = "unbiased"
    cfg.model.solver.abstol = 1e-2
    cfg.model.solver.reltol = 1e-2
    cfg.model.solver.max_steps = 16
    cfg.model.solver.checkpoint_every = 4

    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    ps, st = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3))
    y = jnp.eye(10)[jnp.array([0, 1, 2, 3])]

    def obj(ps):
        loss, st_, stats = loss_fn(model, ps, st, (x, y), 1.0, training=True)
        return loss, (st_, stats)

    (loss, (st_, stats)), g = jax.jit(
        jax.value_and_grad(obj, has_aux=True)
    )(ps)
    assert np.isfinite(float(loss))
    assert int(stats["nfe"]) > 0
    assert float(stats["reg_val"]) != 0.0

    # BatchNorm running stats inside the dynamics were updated by the solve
    bn_new = st_["neural_ode"]["model"]["layer_0"]["layer_1"]["mean"]
    bn_old = st["neural_ode"]["model"]["layer_0"]["layer_1"]["mean"]
    assert not np.allclose(np.asarray(bn_new), np.asarray(bn_old))

    leaves = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(g)]
    )
    assert np.isfinite(leaves).all() and (leaves != 0).any()

    # eval mode consumes the updated running stats without mutating them
    loss_e, st_e, stats_e = loss_fn(
        model, ps, st_, (x, y), 1.0, training=False
    )
    bn_eval = st_e["neural_ode"]["model"]["layer_0"]["layer_1"]["mean"]
    np.testing.assert_allclose(np.asarray(bn_eval), np.asarray(bn_new))
