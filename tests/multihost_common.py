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


def runner_cfg(workdir: str, steps_per_call: int = 1):
    """The tiny end-to-end runner config shared by the 2-process workers
    and the in-test single-process reference (identical seed ⇒ identical
    synthetic data and batch order; GSPMD's shared global adaptive grid
    makes the loss trajectory DP-degree-independent)."""
    from localregneuralde_tpu.harness.config import ExperimentConfig

    cfg = ExperimentConfig()
    cfg.seed = 0
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
    cfg.dataset.train_batchsize = 16
    cfg.dataset.eval_batchsize = 64
    cfg.train.total_steps = 4
    cfg.train.print_frequency = 2
    cfg.train.evaluate_every = 4
    cfg.train.data_parallel = "gspmd"
    cfg.train.steps_per_call = steps_per_call
    cfg.train.checkpoint_dir = f"{workdir}/ckpt"
    cfg.train.log_dir = f"{workdir}/logs"
    return cfg


def latent_cfg(workdir: str):
    """Tiny end-to-end latent-ODE (PhysioNet-family) runner config for the
    pod-mode test — same determinism contract as ``runner_cfg`` (identical
    seed ⇒ identical synthetic irregular-time-series data and batch order
    on every process; the GSPMD shared global adaptive grid makes the
    trajectory DP-degree-independent)."""
    from localregneuralde_tpu.harness.config import ExperimentConfig

    cfg = ExperimentConfig()
    cfg.seed = 0
    cfg.model.model_type = "time_series"
    cfg.model.regularize = "unbiased"
    cfg.model.ts_in_dims = 4
    cfg.model.ts_hidden_dims = 8
    cfg.model.ts_latent_dims = 8
    cfg.model.ts_node_dims = 8
    cfg.model.solver.abstol = 1e-2
    cfg.model.solver.reltol = 1e-2
    cfg.model.solver.max_steps = 16
    cfg.model.solver.checkpoint_every = 4
    cfg.optimizer.optimizer = "adamax"
    cfg.optimizer.scheduler.lr_scheduler = "constant"
    cfg.dataset.train_batchsize = 16
    cfg.dataset.eval_batchsize = 64
    cfg.train.total_steps = 4
    cfg.train.print_frequency = 2
    cfg.train.evaluate_every = 4
    cfg.train.data_parallel = "gspmd"
    cfg.train.checkpoint_dir = f"{workdir}/ckpt"
    cfg.train.log_dir = f"{workdir}/logs"
    return cfg
