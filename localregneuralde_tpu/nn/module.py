"""Explicit-state NN module system.

Layers here are *static descriptions* (plain Python objects, hashable under
jit) with two pure functions::

    params, state = layer.init(key)
    y, new_state = layer(params, state, x, training=False)

mirroring the reference's Lux ``AbstractExplicitLayer`` design
(``(layer)(x, ps, st) → (y, st′)``, SURVEY.md §1 L2) — the natural fit for
JAX: parameters and mutable state (BatchNorm statistics, PRNG keys, NFE
counters, regularization values) are explicit pytrees that thread cleanly
through ``lax.scan``/``while_loop`` solver loops and ``jax.grad``.

The generic ``ArrayAndTime`` lift (reference ``src/utils.jl:20-23``) lives in
``Module.__call__``: layers that are not time-aware transparently unwrap the
array, apply, and rewrap — so integration time rides through arbitrary
sub-networks and only ``TDChain``-style layers consume it.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax

from ..core.containers import ArrayAndTime


class Module:
    """Base class for all layers. Subclasses implement ``init`` / ``apply``."""

    #: time-aware layers receive the full ArrayAndTime container.
    time_aware: bool = False

    def init(self, key) -> Tuple[Any, Any]:
        """Return ``(params, state)`` pytrees."""
        return {}, {}

    def apply(self, params, state, x, *, training: bool = False):
        raise NotImplementedError

    def __call__(self, params, state, x, *, training: bool = False):
        if isinstance(x, ArrayAndTime) and not self.time_aware:
            y, st = self.apply(params, state, x.array, training=training)
            return ArrayAndTime(y, x.scalar), st
        return self.apply(params, state, x, training=training)


def split_key(key, n: int):
    """Split a PRNG key into ``n`` subkeys (helper for container layers)."""
    return jax.random.split(key, n)
