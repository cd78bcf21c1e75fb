"""Params-EMA (train.ema_decay): in-step update, eval swap, checkpoint
back-compat."""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localregneuralde_tpu.harness import ExperimentConfig
from localregneuralde_tpu.harness.construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
)
from localregneuralde_tpu.harness.train import (
    TrainState,
    create_train_state,
    init_ema,
    make_train_step,
    swap_ema_params,
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


def test_ema_update_matches_manual():
    cfg = _tiny_cfg()
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = init_ema(create_train_state(model, optimizer, jax.random.PRNGKey(0)))
    p0 = jax.tree_util.tree_map(np.asarray, ts.params)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(16, 8, 8, 1).astype("float32"))
    y = jnp.eye(10, dtype=jnp.float32)[jnp.asarray(rng.randint(0, 10, 16))]

    d = 0.75
    step = make_train_step(model, loss_fn, optimizer, ema_decay=d)
    ts1, _, _ = step(ts, (x, y), 1.0, 1e-3)
    p1 = jax.tree_util.tree_map(np.asarray, ts1.params)  # before donation
    ts2, _, _ = step(ts1, (x, y), 1.0, 1e-3)

    # manual recursion: ema seeded at p0, then ema_k = d·ema_{k-1}+(1−d)·p_k
    ema1 = jax.tree_util.tree_map(
        lambda e, p: d * e + (1 - d) * p, p0, p1
    )
    ema2 = jax.tree_util.tree_map(
        lambda e, p: d * e + (1 - d) * np.asarray(p), ema1, ts2.params
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(ts2.ema), jax.tree_util.tree_leaves(ema2)
    ):
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-6, atol=1e-7
        )

    # swap view: eval sees the averaged weights, raw params keep training
    swapped = swap_ema_params(ts2)
    assert swapped.params is ts2.ema
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(ts2.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(ts2.ema)[0]),
    )


def test_ema_disabled_is_inert_and_swap_is_identity():
    cfg = _tiny_cfg()
    model = construct_model(cfg)
    loss_fn, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))
    assert ts.ema is None
    assert swap_ema_params(ts) is ts

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(16, 8, 8, 1).astype("float32"))
    y = jnp.eye(10, dtype=jnp.float32)[jnp.asarray(rng.randint(0, 10, 16))]
    step = make_train_step(model, loss_fn, optimizer)
    ts1, _, _ = step(ts, (x, y), 1.0, 1e-3)
    assert ts1.ema is None


def test_pre_ema_checkpoint_pickle_still_loads():
    """TrainStates pickled before the ema field existed unpickle into
    instances whose __dict__ lacks 'ema'; the class-attribute default
    (None) must make them fully usable pytrees."""
    cfg = _tiny_cfg()
    model = construct_model(cfg)
    _, _ = construct_loss(cfg)
    optimizer, _ = construct_optimizer(cfg)
    ts = create_train_state(model, optimizer, jax.random.PRNGKey(0))

    blob = pickle.dumps(ts)
    old = pickle.loads(blob)
    object.__delattr__(old, "ema")  # simulate a pre-ema pickle
    assert "ema" not in old.__dict__
    assert old.ema is None  # class-attribute fallback
    # pytree ops (the resume path's tree_map) work
    moved = jax.tree_util.tree_map(jnp.asarray, old)
    assert moved.ema is None
    assert isinstance(moved, TrainState)


def test_runner_ema_end_to_end(tmp_path):
    from localregneuralde_tpu.harness.checkpoint import load_checkpoint
    from localregneuralde_tpu.harness.runner import (
        run_classification_experiment,
    )

    cfg = _tiny_cfg(ema_decay=0.9)
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    out = run_classification_experiment(cfg, "tiny_ema")
    assert out["final_step"] == 2
    # summaries surface the last eval's metrics (NFE studies consume these)
    assert np.isfinite(out["final_eval"]["accuracy_top1"])
    assert out["final_eval"]["nfe"] > 0
    ck = load_checkpoint(str(tmp_path / "ckpt") + "/" + out["ckpt_dir"].split("/")[-1] + "/model_current.ckpt")
    assert ck is not None
    ema_leaves = jax.tree_util.tree_leaves(ck["tstate"].ema)
    assert ema_leaves and all(
        np.isfinite(np.asarray(l)).all() for l in ema_leaves
    )


def test_latent_runner_ema_end_to_end(tmp_path):
    from localregneuralde_tpu.harness.latent_runner import (
        run_latent_ode_experiment,
    )

    cfg = _tiny_cfg(ema_decay=0.9)
    cfg.model.model_type = "time_series"
    cfg.model.ts_in_dims = 5
    cfg.model.ts_hidden_dims = 8
    cfg.model.ts_latent_dims = 6
    cfg.model.ts_node_dims = 4
    cfg.dataset.eval_batchsize = 16
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    out = run_latent_ode_experiment(cfg, "tiny_ts_ema")
    assert np.isfinite(out["best_eval_mse"])
    # summaries surface the last eval's metrics (NFE studies consume these)
    assert np.isfinite(out["final_eval_mse"])
    assert out["final_eval_nfe"] > 0


def test_runner_ema_validation(tmp_path):
    from localregneuralde_tpu.harness.runner import (
        run_classification_experiment,
    )

    cfg = _tiny_cfg(ema_decay=1.5)
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    with pytest.raises(ValueError, match="ema_decay"):
        run_classification_experiment(cfg, "bad_ema")
