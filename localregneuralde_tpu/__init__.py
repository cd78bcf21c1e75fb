"""localregneuralde_tpu — a TPU-native neural differential equation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``avik-pal/LocalRegNeuralDE.jl`` (ICML 2023, arXiv 2303.02262): adaptive
ODE/SDE solvers as bounded reverse-differentiable XLA loops, differentiable
single solver steps whose embedded local-error / stiffness estimates act as a
local regularizer, a neural-DE layer zoo with explicit (params, state)
semantics, and a full experiment harness — designed TPU-first (SPMD sharding,
static shapes, fused Pallas kernels) rather than as a translation.
"""
from .core import ArrayAndTime, get_array, get_scalar
from .ode import ODESolution, PIController, odesolve

__version__ = "0.1.0"

__all__ = [
    "ArrayAndTime",
    "get_array",
    "get_scalar",
    "ODESolution",
    "PIController",
    "odesolve",
]
