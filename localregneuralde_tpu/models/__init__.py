from .common import (
    AugmenterLayer,
    ReparameterizeLayer,
    TDChain,
    diffeqsol_to_array,
    diffeqsol_to_timeseries,
)
from .latent_ode import LatentGRUCell
from .neural_ode import NeuralODE

__all__ = [
    "AugmenterLayer",
    "ReparameterizeLayer",
    "TDChain",
    "diffeqsol_to_array",
    "diffeqsol_to_timeseries",
    "LatentGRUCell",
    "NeuralODE",
]
