"""Continuous KG maintenance (streaming/kg.py): a customer stream mapped
to triples and merged micro-batch-by-micro-batch must converge to
exactly the PG a full batch build produces — the rebuild-equivalence
contract that lets PG-JSONL export / the Neo4j loader consume the stored
graph at any point."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.testing import assertDataFrameEqual

from knetminer_etl_spark.pg.build import triples_to_pg
from knetminer_etl_spark.queries.kg import _customer_mapper
from knetminer_etl_spark.streaming.kg import read_kg, start_kg_stream

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(SF_DIR),
    reason="driver-generated parquet fixtures not present (CI)",
)


def _canon(df):
    return df.select(
        "id", "type", F.array_sort("labels").alias("labels"), "from", "to",
        F.expr(
            "to_json(map_from_entries(array_sort(map_entries("
            "transform_values(properties, (k, v) -> array_sort(v))))))"
        ).alias("props_json"),
    ).orderBy("id")


def test_streamed_kg_equals_batch_build(spark, tmp_path):
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    # three arrival chunks with OVERLAPPING ids (the same customer seen
    # again must set-merge, not duplicate)
    src = tmp_path / "arrivals"
    customer.filter("c_custkey % 3 = 0").write.parquet(f"{src}/b0.parquet")
    customer.filter("c_custkey % 3 = 1").write.parquet(f"{src}/b1.parquet")
    customer.filter("c_custkey % 3 >= 1").write.parquet(f"{src}/b2.parquet")

    stream = (
        spark.readStream.schema(customer.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    pg_path = str(tmp_path / "pg.parquet")
    q = start_kg_stream(
        stream, _customer_mapper(), pg_path, str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    expected = triples_to_pg(
        _customer_mapper().to_triples(
            customer.filter("c_custkey % 3 >= 0")  # all rows; dup arrivals collapse
        )
    )
    assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))


def test_restarted_stream_is_idempotent(spark, tmp_path):
    """Replaying the same files through a FRESH checkpoint (worst-case
    duplicate delivery) leaves the stored PG unchanged — the idempotent
    set-merge that underwrites exactly-once."""
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").limit(20)
    src = tmp_path / "arrivals"
    customer.write.parquet(f"{src}/b0.parquet")

    pg_path = str(tmp_path / "pg.parquet")
    for attempt in range(2):  # second run re-delivers everything
        stream = (
            spark.readStream.schema(customer.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = start_kg_stream(
            stream, _customer_mapper(), pg_path, str(tmp_path / f"ck{attempt}")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    expected = triples_to_pg(_customer_mapper().to_triples(customer))
    assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))


def test_merge_crash_window_recovery_and_transient_error_propagation(
    spark, tmp_path
):
    """The staged-swap merge must (a) recover a store stranded at the
    `._old` crash point (new store staged, old renamed away, final
    rename never happened), and (b) surface a real read failure instead
    of silently resetting the accumulated store to the current delta."""
    import os
    import shutil

    from knetminer_etl_spark.streaming.kg import merge_triples_batch

    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    mapper = _customer_mapper()
    pg_path = str(tmp_path / "pg.parquet")

    first = customer.filter("c_custkey % 2 = 0")
    second = customer.filter("c_custkey % 2 = 1")
    merge_triples_batch(spark, mapper.to_triples(first), pg_path)
    n_first = read_kg(spark, pg_path).count()

    # simulate the crash window: current store renamed to ._old, no new
    # store in place
    os.rename(pg_path, pg_path + "._old")
    merge_triples_batch(spark, mapper.to_triples(second), pg_path)
    merged = read_kg(spark, pg_path)
    # both batches present: recovery read ._old, then the swap landed
    assert merged.count() > n_first
    assert not os.path.exists(pg_path + "._old")
    assert not os.path.exists(pg_path + "._tmp")
    expected = triples_to_pg(mapper.to_triples(customer))
    assertDataFrameEqual(_canon(merged), _canon(expected))

    # a CORRUPT store must raise, not be silently overwritten
    shutil.rmtree(pg_path)
    os.makedirs(pg_path)
    with open(os.path.join(pg_path, "part-00000.parquet"), "w") as fh:
        fh.write("this is not parquet")
    before = set(os.listdir(pg_path))
    with pytest.raises(Exception):
        merge_triples_batch(spark, mapper.to_triples(second), pg_path)
        read_kg(spark, pg_path).count()  # force the lazy read if needed
    assert set(os.listdir(pg_path)) == before  # store untouched
