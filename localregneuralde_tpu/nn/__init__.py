from .basic import (
    BatchNorm,
    Chain,
    Conv,
    Dense,
    Flatten,
    Lambda,
    WrappedFunction,
    resolve_activation,
)
from .module import Module
from .recurrence import Recurrence

__all__ = [
    "BatchNorm",
    "Chain",
    "Conv",
    "Dense",
    "Flatten",
    "Lambda",
    "WrappedFunction",
    "resolve_activation",
    "Module",
    "Recurrence",
]
