"""Pytree dataclass helpers.

The whole framework is built from pure functions over pytrees: problem
containers, smoothers and solver state are frozen dataclasses whose array
fields are jax pytree leaves and whose configuration fields (callables,
enums, shapes) are static metadata. This replaces the reference's mutable
Julia structs (e.g. /root/reference/src/problems.jl:5-40) with a design
that `jax.jit` / `jax.vmap` / `jax.sharding` understand natively.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs):
    """A dataclass field treated as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: freeze a dataclass and register it as a jax pytree.

    Fields declared with :func:`static_field` become pytree metadata; all
    other fields are pytree children (traced arrays / nested pytrees).
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def replace(obj: _T, **changes) -> _T:
    """`dataclasses.replace` re-exported for pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
