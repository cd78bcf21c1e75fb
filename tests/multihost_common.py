"""Shared model/data construction for the multi-process test: the worker
processes and the in-test single-process reference must build bitwise-
identical models and batches."""
import numpy as np

GLOBAL_BATCH = 16


def setup():
    from localregneuralde_tpu.harness.config import ExperimentConfig
    from localregneuralde_tpu.harness.construct import (
        construct_loss,
        construct_model,
        construct_optimizer,
    )

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


def make_batch():
    rng = np.random.RandomState(7)
    x = rng.uniform(size=(GLOBAL_BATCH, 8, 8, 1)).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[rng.randint(0, 10, size=GLOBAL_BATCH)]
    return x, y
