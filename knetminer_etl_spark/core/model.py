"""Canonical data model for the knowledge-graph ETL engine.

Three relations flow through the pipeline:

1. **Triple DataFrame** — the tall EAV relation ``(id, key, value)``;
   one row per (element, property, value). Nodes and edges share the
   relation; an element is an edge iff it has a ``@from`` row.
   (Semantics per reference src/ketl/tabmap/core.py:357-361 and
   src/ketl/io/core.py:108-113.)

2. **PG DataFrame** — the wide property-graph relation
   ``(id, type, labels, from, to, properties)``
   (reference src/ketl/io/core.py:36-49).

3. **PG-JSONL** — one JSON object per line, the interchange format the
   graph-DB loader consumes (reference src/ketl/io/core.py:160-187).

Everything here is plain schema/constant definitions — no Spark session
required at import time.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T

# --- special property keys that carry graph structure ----------------------
# (reference src/ketl/core.py:35-43)
TYPE_KEY = "@type"  # node label / relationship type
FROM_KEY = "@from"  # edge source element id
TO_KEY = "@to"  # edge target element id

#: keys whose values are raw strings, never JSON-serialized
#: (reference src/ketl/helpers.py:38-52)
SPECIAL_KEYS = (TYPE_KEY, FROM_KEY, TO_KEY)

# --- triple relation --------------------------------------------------------
ID_COL = "id"
KEY_COL = "key"
VALUE_COL = "value"

TRIPLE_COLUMNS = [ID_COL, KEY_COL, VALUE_COL]

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField(ID_COL, T.StringType(), nullable=False),
        T.StructField(KEY_COL, T.StringType(), nullable=False),
        T.StructField(VALUE_COL, T.StringType(), nullable=True),
    ]
)

# --- PG relation ------------------------------------------------------------


class PGElementType(str, Enum):
    """Discriminator for the ``type`` column of the PG relation
    (reference src/ketl/core.py:86-89)."""

    NODE = "node"
    EDGE = "edge"

    def __str__(self) -> str:  # str(PGElementType.NODE) == "node"
        return self.value


PG_COLUMNS = ["id", "type", "labels", "from", "to", "properties"]

PG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("type", T.StringType(), nullable=False),
        T.StructField("labels", T.ArrayType(T.StringType()), nullable=True),
        T.StructField("from", T.StringType(), nullable=True),
        T.StructField("to", T.StringType(), nullable=True),
        T.StructField(
            "properties",
            T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            nullable=True,
        ),
    ]
)
