from .checkpoint import load_checkpoint, save_checkpoint
from .config import (
    ExperimentConfig,
    define_configuration,
    experiment_name,
    flatten_config,
)
from .construct import (
    construct_loss,
    construct_model,
    construct_optimizer,
    construct_time_series,
)
from .data import (
    Dataloader,
    get_classification_data,
    make_dataloader,
    one_hot,
)
from .logging import (
    AverageMeter,
    CSVLogger,
    ProgressMeter,
    create_logger,
    get_loggable_values,
    reset_meters,
)
from .losses import (
    accuracy,
    kl_divergence,
    log_likelihood_loss,
    logitcrossentropy,
    mean_absolute_error,
    mean_squared_error,
)
from .schedulers import (
    Constant,
    CosineAnneal,
    ExponentialDecay,
    InverseDecay,
    Step,
)
from .train import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    run_training_step,
    warmup_model,
)

__all__ = [
    "load_checkpoint", "save_checkpoint",
    "ExperimentConfig", "define_configuration", "experiment_name",
    "flatten_config",
    "construct_loss", "construct_model", "construct_optimizer",
    "construct_time_series",
    "Dataloader", "get_classification_data", "make_dataloader", "one_hot",
    "AverageMeter", "CSVLogger", "ProgressMeter", "create_logger",
    "get_loggable_values", "reset_meters",
    "accuracy", "kl_divergence", "log_likelihood_loss", "logitcrossentropy",
    "mean_absolute_error", "mean_squared_error",
    "Constant", "CosineAnneal", "ExponentialDecay", "InverseDecay", "Step",
    "TrainState", "create_train_state", "make_eval_step", "make_train_step",
    "run_training_step", "warmup_model",
]
