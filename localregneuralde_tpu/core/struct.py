"""Pytree dataclass helpers.

Small, dependency-free utilities for declaring JAX-pytree dataclasses. Fields
marked ``static=True`` are treated as auxiliary (hashable, not traced).

This is the L0 "pytree discipline" layer of the framework (see SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


def field(*, static: bool = False, **kwargs) -> Any:
    """Dataclass field; ``static=True`` marks it as pytree metadata."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = static
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls=None, /):
    """Decorator: make ``cls`` a frozen dataclass registered as a JAX pytree."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **changes):
    """``dataclasses.replace`` re-export for pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
