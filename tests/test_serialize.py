"""Serialization fidelity: the Column-side JSON literal encoding must match
``json.dumps`` semantics (reference src/ketl/core.py:160-183), including
drop-on-null/empty."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.core.serialize import (
    DEFAULT_CONVERTER,
    json_literal,
    raw_string,
)


def _encode(spark, value, dtype):
    df = spark.createDataFrame([(value,)], f"v {dtype}")
    return df.select(json_literal(F.col("v")).alias("s")).first()["s"]


@pytest.mark.parametrize(
    "value,dtype",
    [
        ("Alice", "string"),
        ("", "string"),
        (None, "string"),
        ('say "hi"\\maybe', "string"),
        ("tab\there\nnewline", "string"),
        (30, "int"),
        (30.5, "double"),
        (True, "boolean"),
        (-7, "long"),
    ],
)
def test_json_literal_matches_json_dumps(spark, value, dtype):
    got = _encode(spark, value, dtype)
    expected = DEFAULT_CONVERTER.serialize(value)
    assert got == expected


def test_json_literal_unicode_roundtrip(spark):
    # Python json.dumps escapes non-ASCII by default; Spark emits raw UTF-8.
    # Both are valid JSON encodings of the same value — parity is at the
    # json.loads level.
    got = _encode(spark, "héllo •", "string")
    assert json.loads(got) == "héllo •"


def test_raw_string_empty_to_null(spark):
    df = spark.createDataFrame([("",), ("x",), (None,)], "v string")
    got = [r["s"] for r in df.select(raw_string(F.col("v")).alias("s")).collect()]
    assert got == [None, "x", None]


def test_python_converter_roundtrip():
    for v in ["Alice", 30, 30.5, True, ["a", 1], {"k": "v"}]:
        assert DEFAULT_CONVERTER.unserialize(DEFAULT_CONVERTER.serialize(v)) == v
    assert DEFAULT_CONVERTER.serialize(None) is None
    assert DEFAULT_CONVERTER.serialize("") is None
