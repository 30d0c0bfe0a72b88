"""Pytree-registered dataclasses with static (hashable) metadata fields.

The framework keeps *structure* (index tables, shapes, flags) as static Python/NumPy
metadata and *state* (fields, couplings, chemical potential) as JAX leaves, so jitted
update functions retrace only when the model structure changes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


def static_field(**kwargs: Any) -> dataclasses.Field:
    """Mark a dataclass field as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


class _HashableArray:
    """Hashable wrapper so NumPy index tables can live in static pytree aux data."""

    __slots__ = ("array", "_hash")

    def __init__(self, array: np.ndarray):
        self.array = array
        self._hash = hash((array.shape, array.dtype.str, array.tobytes()))

    def __hash__(self) -> int:
        return self._hash

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, _HashableArray)
            and self.array.shape == other.array.shape
            and self.array.dtype == other.array.dtype
            and np.array_equal(self.array, other.array)
        )


class _HashableDataclass:
    """Hashable wrapper for (frozen) dataclasses whose fields may hold arrays."""

    __slots__ = ("cls", "fields", "_hash")

    def __init__(self, cls, fields: tuple):
        self.cls = cls
        self.fields = fields
        self._hash = hash((cls, fields))

    def __hash__(self) -> int:
        return self._hash

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, _HashableDataclass)
            and self.cls is other.cls
            and self.fields == other.fields
        )


def _wrap_static(value: Any) -> Any:
    if isinstance(value, np.ndarray):
        return _HashableArray(value)
    if isinstance(value, (list, tuple)):
        return tuple(_wrap_static(v) for v in value)
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        names = tuple(f.name for f in dataclasses.fields(value))
        vals = tuple(_wrap_static(getattr(value, n)) for n in names)
        return _HashableDataclass(type(value), tuple(zip(names, vals)))
    return value


def _unwrap_static(value: Any) -> Any:
    if isinstance(value, _HashableArray):
        return value.array
    if isinstance(value, _HashableDataclass):
        kwargs = {n: _unwrap_static(v) for n, v in value.fields}
        return value.cls(**kwargs)
    if isinstance(value, tuple):
        return tuple(_unwrap_static(v) for v in value)
    return value


def register_pytree_dataclass(cls):
    """Class decorator: dataclass -> pytree with static_field() members as aux data."""
    cls = dataclasses.dataclass(cls)
    fields = dataclasses.fields(cls)
    leaf_names = tuple(f.name for f in fields if not f.metadata.get("static", False))
    static_names = tuple(f.name for f in fields if f.metadata.get("static", False))

    def flatten(obj):
        leaves = tuple(getattr(obj, n) for n in leaf_names)
        aux = tuple(_wrap_static(getattr(obj, n)) for n in static_names)
        return leaves, aux

    def flatten_with_keys(obj):
        leaves = tuple((jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in leaf_names)
        aux = tuple(_wrap_static(getattr(obj, n)) for n in static_names)
        return leaves, aux

    def unflatten(aux, leaves):
        obj = object.__new__(cls)
        for n, v in zip(leaf_names, leaves):
            object.__setattr__(obj, n, v)
        for n, v in zip(static_names, aux):
            object.__setattr__(obj, n, _unwrap_static(v))
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)
    cls.replace = dataclasses.replace
    return cls
