"""Property-value serialization.

Property values in the triple relation are **JSON literals stored as
strings**: ``"Alice"`` is stored as ``'"Alice"'``, ``30`` as ``'30'``.
Null and empty-string values serialize to NULL and the triple is dropped
downstream. Special keys (``id``, ``@type``, ``@from``, ``@to``) keep raw
(unserialized) strings.
(Semantics per reference src/ketl/core.py:99-183, src/ketl/helpers.py:38-52.)

The engine expresses serialization as **native Column expressions** so the
whole pipeline stays Catalyst-visible (no Python in the hot path); the
Python :class:`ValueConverter` classes exist for the driver-side JSONL
writer and for tests.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Column-expression serialization (the hot path)
# ---------------------------------------------------------------------------

# to_json(struct(v)) of a scalar yields '{"v":<json-literal>}'; the literal
# starts at char 6 and ends 1 char before the end. A NULL field is omitted
# (→ '{}'), which the NULLIF-style guard below maps back to NULL.
_PREFIX_LEN = len('{"v":')


def json_literal(col: Column) -> Column:
    """Serialize any scalar/array/map Column to its JSON-literal string.

    NULL and empty-string inputs yield NULL (drop-on-empty semantics).
    JVM-side only — escaping, numeric formatting and nesting are handled
    by Spark's `to_json`.
    """
    j = F.to_json(F.struct(col.alias("v")))
    inner = j.substr(F.lit(_PREFIX_LEN + 1), F.length(j) - F.lit(_PREFIX_LEN + 1))
    return F.when(
        col.isNull() | (col.cast("string") == F.lit("")), F.lit(None).cast("string")
    ).otherwise(inner)


def raw_string(col: Column) -> Column:
    """Serialization for special keys: plain string cast, NULL-on-empty."""
    s = col.cast("string")
    return F.when(s.isNull() | (s == F.lit("")), F.lit(None).cast("string")).otherwise(s)


def serialized(col: Column, key: str | None, *, serialize: bool = True) -> Column:
    """Pick the right serialization for a property ``key``."""
    from .model import SPECIAL_KEYS

    if not serialize or (key is not None and key in SPECIAL_KEYS):
        return raw_string(col)
    return json_literal(col)


# ---------------------------------------------------------------------------
# Python converters (driver-side JSONL writer + tests)
# ---------------------------------------------------------------------------


class ValueConverter(ABC):
    """Pluggable value<->string codec (reference src/ketl/core.py:99-157)."""

    @abstractmethod
    def serialize(self, value: Any) -> str | None: ...

    @abstractmethod
    def unserialize(self, value_repr: str | None) -> Any: ...


class JSONValueConverter(ValueConverter):
    """Default codec: JSON literals, None/"" → None (drop)."""

    def serialize(self, value: Any) -> str | None:
        if value is None or value == "":
            return None
        return json.dumps(value)

    def unserialize(self, value_repr: str | None) -> Any:
        if value_repr is None or value_repr == "":
            return None
        return json.loads(value_repr)


class IdentityValueConverter(ValueConverter):
    """Raw passthrough for special keys."""

    def serialize(self, value: Any) -> str | None:
        if value is None or value == "":
            return None
        return str(value)

    def unserialize(self, value_repr: str | None) -> Any:
        return value_repr


DEFAULT_CONVERTER = JSONValueConverter()
IDENTITY_CONVERTER = IdentityValueConverter()
