"""Property-based checks of the round-6 changes: the row-local flat PG
build must equal the aggregated build on ARBITRARY mapper structures and
row data (not just the keyed TPC-H fixtures) whenever the row-local
element contract holds, and ``pg_to_triples`` must be a true inverse of
``triples_to_pg`` on arbitrary triple multisets."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VALS = st.one_of(
    st.none(),
    st.text(
        alphabet="abcXYZ0189 _-|;,=[]\"\\", min_size=0, max_size=12
    ),
    st.integers(-1000, 1000),
    st.floats(-100, 100, allow_nan=False, allow_infinity=False),
)


@st.composite
def _rowlocal_cases(draw):
    """A source table with a unique pk plus a random mapper structure:
    1-4 property mappers over random columns (duplicate keys allowed),
    0-2 type mappers — the space the row-local contract quantifies over."""
    n_rows = draw(st.integers(1, 12))
    n_cols = draw(st.integers(1, 4))
    rows = [
        tuple([i] + [draw(_VALS) for _ in range(n_cols)])
        for i in range(n_rows)
    ]
    keys = draw(
        st.lists(
            st.sampled_from(["p", "q", "r"]), min_size=1, max_size=4
        )
    )
    cols = [
        draw(st.integers(0, n_cols - 1)) for _ in keys
    ]  # which column each mapper reads
    labels = draw(
        st.lists(st.sampled_from(["A", "B"]), min_size=0, max_size=2)
    )
    return rows, n_cols, list(zip(keys, cols)), labels


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_rowlocal_cases())
def test_rowlocal_equals_aggregated_build(spark, case):
    from pyspark.sql import functions as F

    from knetminer_etl_spark.pg.build import triples_to_pg_flat
    from knetminer_etl_spark.tabmap.compiler import DataFrameMapper
    from knetminer_etl_spark.tabmap.mappers import (
        ExprValueMapper,
        column_triple_mapper,
        type_triple_mapper,
    )

    rows, n_cols, mappers, labels = case
    schema = "pk long, " + ", ".join(f"c{i} string" for i in range(n_cols))
    df = spark.createDataFrame(
        [
            tuple(
                [r[0]] + [None if v is None else str(v) for v in r[1:]]
            )
            for r in rows
        ],
        schema,
    )
    dm = DataFrameMapper(
        ExprValueMapper(
            F.concat(F.lit("X:"), F.col("pk").cast("string"))
        ),
        [column_triple_mapper(f"c{c}", k) for k, c in mappers],
        [type_triple_mapper(lb) for lb in labels],
    )
    got = sorted(tuple(r) for r in dm.to_pg_flat(df).collect())
    want = sorted(
        tuple(r) for r in triples_to_pg_flat(dm.to_triples(df)).collect()
    )
    assert got == want


@st.composite
def _triple_sets(draw):
    ids = [f"N{i}" for i in range(draw(st.integers(1, 6)))] + ["E0"]
    rows = []
    for eid in ids:
        if eid.startswith("E"):
            rows += [
                (eid, "@type", "rel"),
                (eid, "@from", "N0"),
                (eid, "@to", "N0"),
            ]
        for _ in range(draw(st.integers(0, 4))):
            key = draw(st.sampled_from(["@type", "p", "q"]))
            val = draw(
                st.text(alphabet="abc|;,=[]", min_size=1, max_size=6)
            )
            rows.append((eid, key, val))
    return rows


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_triple_sets())
def test_pg_to_triples_roundtrip_property(spark, rows):
    from knetminer_etl_spark.pg.build import pg_to_triples, triples_to_pg

    df = spark.createDataFrame(
        rows, "id string, key string, value string"
    )
    pg = triples_to_pg(df)
    back = triples_to_pg(pg_to_triples(pg))
    a = sorted(map(str, pg.collect()))
    b = sorted(map(str, back.collect()))
    assert a == b
