"""PG DataFrame ⇄ PG-JSONL.

Line format (reference src/ketl/io/core.py:130-191, FIXTURES.md §2.3):

    {"type":"node","id":"...","labels":[...],"properties":{"k":[v,...]}}
    {"type":"edge","id":"...","labels":[...],"from":"...","to":"...","properties":{...}}

Property values are **unserialized back to native JSON types** at this
stage (they are stored as JSON-literal strings in the PG relation), so the
line can be assembled JVM-side by splicing the already-JSON value strings
into the surrounding object — no Python in the loop.

Two sinks:

* :func:`write_pg_jsonl` — distributed ``df.write.text`` of the assembled
  lines; the 100 TB path (one file per partition).
* :func:`pg_jsonl_lines` / :func:`write_pg_jsonl_single` — driver-side
  iterator / single-file writer matching the reference's
  ``toLocalIterator`` contract (src/ketl/io/core.py:160-187) for
  tooling that requires one file. Streams partition-at-a-time; do not use
  at scale.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from pathlib import Path
from typing import IO

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.model import PGElementType
from ..core.serialize import DEFAULT_CONVERTER, ValueConverter


def _json_str(col: Column) -> Column:
    """JSON-encode a string Column (quotes + escapes), JVM-side."""
    j = F.to_json(F.struct(col.alias("v")))
    return j.substr(F.lit(6), F.length(j) - F.lit(6))


def pg_jsonl_line_expr() -> Column:
    """Column producing the full PG-JSONL line for a PG row.

    Values inside ``properties`` are JSON literals already, so they are
    spliced in raw; labels/ids/keys are JSON-string-encoded.
    """
    labels = F.concat(
        F.lit("["),
        F.array_join(F.transform(F.col("labels"), _json_str), ","),
        F.lit("]"),
    )
    props_entries = F.transform(
        F.map_entries(F.col("properties")),
        lambda e: F.concat(
            _json_str(e["key"]),
            F.lit(":["),
            F.array_join(e["value"], ","),
            F.lit("]"),
        ),
    )
    props = F.concat(F.lit("{"), F.array_join(props_entries, ","), F.lit("}"))
    head = F.concat(
        F.lit('{"type":'),
        _json_str(F.col("type")),
        F.lit(',"id":'),
        _json_str(F.col("id")),
        F.lit(',"labels":'),
        labels,
    )
    edge_part = F.when(
        F.col("type") == str(PGElementType.EDGE),
        F.concat(
            F.lit(',"from":'),
            _json_str(F.col("from")),
            F.lit(',"to":'),
            _json_str(F.col("to")),
        ),
    ).otherwise(F.lit(""))
    return F.concat(head, edge_part, F.lit(',"properties":'), props, F.lit("}"))


def write_pg_jsonl(pg: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed PG-JSONL sink: one part-file per partition."""
    pg.select(pg_jsonl_line_expr().alias("value")).write.mode(mode).text(path)


def read_pg_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """PG-JSONL source → PG DataFrame (values re-serialized to JSON-literal
    strings, i.e. the inverse of the sink). Reads with an explicit schema —
    no sampling/inference pass (reference src/ketl/io/neoloader.py:308-359
    reads the same format line-wise outside Spark)."""
    raw_schema = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField("labels", T.ArrayType(T.StringType())),
            T.StructField("from", T.StringType()),
            T.StructField("to", T.StringType()),
            T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    # properties values are heterogeneous JSON arrays -> keep raw JSON text
    # via a first pass on the line, then split per-value.
    lines = spark.read.text(path)
    parsed = lines.select(
        F.from_json(
            F.col("value"),
            raw_schema,
            {"mode": "PERMISSIVE"},
        ).alias("r"),
        F.col("value").alias("_line"),
    ).select("r.*", "_line")
    # properties came through as map<string, string-of-json-array>; explode
    # each array back into per-value JSON literals.
    props = F.map_from_entries(
        F.transform(
            F.map_entries(F.col("properties")),
            lambda e: F.struct(
                e["key"].alias("key"),
                _split_json_array(e["value"]).alias("values"),
            ),
        )
    )
    return parsed.select(
        F.col("id"),
        F.col("type"),
        F.col("labels"),
        F.col("from"),
        F.col("to"),
        F.coalesce(props, F.map_from_arrays(F.array(), F.array())).alias("properties"),
    )


def _split_json_array(col: Column) -> Column:
    """'["a",1]' → array of element JSON literals (['"a"', '1']).

    Quote-preserving split: an array<string> round-trip alone would strip
    JSON quoting and silently re-type numeric/boolean-looking string values
    ('"123"' → 123 — corrupting accession IDs, common in this KG domain).
    Instead, parse twice JVM-side and zip:

    * ``from_json`` → array<string> keeps the raw literal text of numbers/
      booleans/objects/arrays (Jackson passes the token text through), but
      un-quotes strings;
    * ``parse_json`` → array<variant> tells us *which* elements were JSON
      strings (``schema_of_variant`` == 'STRING'); those are re-encoded
      with ``to_json(variant)`` which restores quoting and escapes.

    JSON ``null`` elements come back as the literal 'null' (array<string>
    maps them to SQL NULL, hence the coalesce), matching the serializer.
    try_parse_json, not parse_json: the outer line parse is PERMISSIVE
    (malformed → NULL row), and a strict inner parse would fail the whole
    read on one corrupt value array instead of nulling it.
    """
    raw = F.from_json(col, T.ArrayType(T.StringType()))
    var = F.variant_get(F.try_parse_json(col), "$", "array<variant>")
    return F.zip_with(
        raw,
        var,
        lambda r, v: F.when(
            F.schema_of_variant(v) == "STRING", F.to_json(v)
        ).otherwise(F.coalesce(r, F.lit("null"))),
    )


# ---------------------------------------------------------------------------
# Driver-side single-file mode (compat; not for scale)
# ---------------------------------------------------------------------------


def pg_jsonl_lines(
    pg: DataFrame,
    value_converters: dict[str, ValueConverter] | None = None,
) -> Iterator[str]:
    """Yield JSONL lines on the driver, unserializing property values with
    per-key converters (default JSON). Mirrors reference
    src/ketl/io/core.py:160-187 including key order."""
    converters = value_converters or {}
    edge_t = str(PGElementType.EDGE)
    for row in pg.toLocalIterator():
        props: dict[str, list] = {}
        for pk, pvals in (row["properties"] or {}).items():
            conv = converters.get(pk, DEFAULT_CONVERTER)
            props[pk] = [conv.unserialize(v) for v in pvals]
        entry: dict = {
            "type": row["type"],
            "id": row["id"],
            "labels": list(row["labels"] or []),
        }
        if row["type"] == edge_t:
            entry["from"] = row["from"]
            entry["to"] = row["to"]
        entry["properties"] = props
        yield json.dumps(entry)


def write_pg_jsonl_single(
    pg: DataFrame,
    out: str | Path | IO[str],
    value_converters: dict[str, ValueConverter] | None = None,
) -> int:
    """Write all lines to one file/handle; returns the line count."""
    n = 0
    if hasattr(out, "write"):
        for line in pg_jsonl_lines(pg, value_converters):
            out.write(line + "\n")
            n += 1
        return n
    with open(out, "w", encoding="utf-8") as fh:
        for line in pg_jsonl_lines(pg, value_converters):
            fh.write(line + "\n")
            n += 1
    return n
