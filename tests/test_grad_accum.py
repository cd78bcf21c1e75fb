"""Gradient accumulation (train.grad_accumulation): microbatched updates.

The accumulated step must equal the hand-computed mean of the microbatch
gradients applied in ONE optimizer update, with layer state threaded
sequentially and stats merged (NFE summed, losses averaged, y_pred
re-concatenated)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from localregneuralde_tpu.harness import ExperimentConfig
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.train import (
    create_train_state,
    make_train_step,
)


def _tiny_cfg(**train_overrides):
    cfg = ExperimentConfig()
    cfg.model.model_type = "mlp"
    cfg.model.regularize = "unbiased"
    cfg.model.image_size = [8, 8]
    cfg.model.in_channels = 1
    cfg.model.mlp_hidden_state_size = 16
    cfg.model.solver.abstol = 1e-2
    cfg.model.solver.reltol = 1e-2
    cfg.model.solver.max_steps = 32
    cfg.model.solver.checkpoint_every = 8
    cfg.dataset.train_batchsize = 16
    cfg.dataset.eval_batchsize = 64
    cfg.train.total_steps = 2
    cfg.train.print_frequency = 1
    cfg.train.evaluate_every = 2
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    for k, v in train_overrides.items():
        setattr(cfg.train, k, v)
    return cfg


def _setup(cfg):
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(16, 8, 8, 1).astype("float32"))
    y = jnp.eye(10, dtype=jnp.float32)[
        jnp.asarray(rng.randint(0, 10, size=16))
    ]
    return model, loss_fn, optimizer, ts, (x, y)


def test_grad_accum_matches_manual_microbatch_mean():
    cfg = _tiny_cfg()
    model, loss_fn, optimizer, ts, (x, y) = _setup(cfg)

    step2 = make_train_step(model, loss_fn, optimizer, grad_accumulation=2)
    ts2, loss2, stats2 = step2(ts, (x, y), 1.0, 1e-3)

    # manual: two sequential half-batch grads, state threaded, mean grad,
    # one optax update
    ts_ref = create_train_state(model, optimizer, jax.random.PRNGKey(0))

    def objective(params, state, data):
        loss, st_, stats = loss_fn(
            model, params, state, data, 1.0, training=True
        )
        return loss, (st_, stats)

    vg = jax.value_and_grad(objective, has_aux=True)
    (lA, (stA, statsA)), gA = vg(ts_ref.params, ts_ref.state, (x[:8], y[:8]))
    (lB, (stB, statsB)), gB = vg(ts_ref.params, stA, (x[8:], y[8:]))
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, gA, gB)
    opt_state = ts_ref.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(1e-3)
    updates, opt_state = optimizer.update(gmean, opt_state, ts_ref.params)
    params_ref = optax.apply_updates(ts_ref.params, updates)

    for got, want in zip(
        jax.tree_util.tree_leaves(ts2.params),
        jax.tree_util.tree_leaves(params_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
        )

    # merged stats: loss/ce mean, NFE summed, y_pred re-concatenated
    np.testing.assert_allclose(
        float(loss2), (float(lA) + float(lB)) / 2.0, rtol=1e-6
    )
    assert int(stats2["nfe"]) == int(statsA["nfe"]) + int(statsB["nfe"])
    np.testing.assert_allclose(
        np.asarray(stats2["y_pred"]),
        np.concatenate(
            [np.asarray(statsA["y_pred"]), np.asarray(statsB["y_pred"])]
        ),
        rtol=1e-6, atol=1e-6,
    )
    assert bool(stats2["solver_success"]) == (
        bool(statsA["solver_success"]) and bool(statsB["solver_success"])
    )


def test_runner_grad_accum_end_to_end(tmp_path):
    from localregneuralde_tpu.harness.runner import (
        run_classification_experiment,
    )

    cfg = _tiny_cfg(grad_accumulation=4)
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    out = run_classification_experiment(cfg, "tiny_ga")
    assert out["final_step"] == 2


def test_runner_grad_accum_composes_with_steps_per_call(tmp_path):
    from localregneuralde_tpu.harness.runner import (
        run_classification_experiment,
    )

    cfg = _tiny_cfg(grad_accumulation=2, steps_per_call=2,
                    print_frequency=2)
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    out = run_classification_experiment(cfg, "tiny_ga_spc")
    assert out["final_step"] == 2


def test_runner_grad_accum_sde(tmp_path):
    """SDE stats carry a (drift, diffusion) NFE tuple — the microbatch
    merge must sum each counter and thread the noise rng sequentially."""
    from localregneuralde_tpu.harness.runner import (
        run_classification_experiment,
    )

    cfg = _tiny_cfg(grad_accumulation=2)
    cfg.model.sde = True
    cfg.model.regularize = "unbiased"
    cfg.model.solver.abstol = 1e-1
    cfg.model.solver.reltol = 1e-1
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    out = run_classification_experiment(cfg, "tiny_sde_ga")
    assert out["final_step"] == 2


def test_grad_accum_config_validation(tmp_path):
    from localregneuralde_tpu.harness.runner import (
        run_classification_experiment,
    )

    cfg = _tiny_cfg(grad_accumulation=3)  # 3 does not divide 16
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    with pytest.raises(ValueError, match="must divide"):
        run_classification_experiment(cfg, "bad_ga")

    # gspmd composes (restriction lifted round 3); shardmap still declines
    cfg = _tiny_cfg(grad_accumulation=2, data_parallel="shardmap")
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    with pytest.raises(ValueError, match="shardmap"):
        run_classification_experiment(cfg, "bad_ga_dp")

    cfg = _tiny_cfg(grad_accumulation=2, data_parallel="gspmd")
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    out = run_classification_experiment(cfg, "ga_gspmd")
    assert out["final_step"] == cfg.train.total_steps
