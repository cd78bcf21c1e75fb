"""Core containers shared across the framework.

``ArrayAndTime`` mirrors the reference's ``(array, scalar_time)`` container
(reference: ``src/utils.jl:12-23``): it lets the integration time ride through
arbitrary NN layers so that time-dependent layers (``TDChain``) can consume it
while plain layers silently ignore it.
"""
from __future__ import annotations

import jax.numpy as jnp

from .struct import pytree_dataclass


@pytree_dataclass
class ArrayAndTime:
    """A value array paired with a scalar time, registered as a pytree."""

    array: jnp.ndarray
    scalar: jnp.ndarray  # scalar time

    @property
    def shape(self):
        return self.array.shape

    @property
    def dtype(self):
        return self.array.dtype


def get_array(x):
    """Return the payload array (reference: ``src/utils.jl:17``)."""
    if isinstance(x, ArrayAndTime):
        return x.array
    return x


def get_scalar(x: ArrayAndTime):
    """Return the scalar time (reference: ``src/utils.jl:18``)."""
    return x.scalar
