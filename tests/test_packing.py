from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import packing as PK


def _naive(df, key, ln):
    w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn("start_offset", F.coalesce(F.sum(ln).over(w), F.lit(0)))


def test_offsets_match_global_window(spark):
    df = spark.range(0, 500).withColumn("n", (F.col("id") * 7 % 13 + 1).cast("int"))
    got = {
        r["id"]: r["start_offset"]
        for r in PK.with_global_offsets(df, "id", "n", partitions=8).collect()
    }
    want = {r["id"]: r["start_offset"] for r in _naive(df, "id", "n").collect()}
    assert got == want


def test_offsets_independent_of_partition_count(spark):
    df = spark.range(0, 300).withColumn("n", (F.col("id") % 5 + 1).cast("int"))
    a = {r["id"]: r["start_offset"] for r in PK.with_global_offsets(df, "id", "n", 2).collect()}
    b = {r["id"]: r["start_offset"] for r in PK.with_global_offsets(df, "id", "n", 16).collect()}
    assert a == b


def test_pack_windows_span_and_zero_len(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, 60), (4, 10)], "id long, n int"
    )
    rows = {r["id"]: r for r in PK.with_pack_windows(df, "id", "n", 64, 2).collect()}
    # id=1: offsets 0..99 -> windows 0..1; id=2 empty; id=3 starts at 100 -> 1..2
    assert (rows[1]["first_window"], rows[1]["last_window"], rows[1]["n_windows"]) == (0, 1, 2)
    assert rows[2]["n_windows"] == 0 and rows[2]["first_window"] is None
    assert (rows[3]["first_window"], rows[3]["last_window"], rows[3]["n_windows"]) == (1, 2, 2)
    assert (rows[4]["first_window"], rows[4]["last_window"], rows[4]["n_windows"]) == (2, 2, 1)


def test_no_global_single_partition_sort(spark):
    df = spark.range(0, 100).withColumn("n", F.lit(1).cast("int"))
    plan = (
        PK.with_global_offsets(df, "id", "n", 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the scalable scan must not contain a partitionBy-less global window
    assert "Window [" not in plan or "SinglePartition" not in plan


def test_offsets_irregular_keys_vs_python_reference(spark):
    """Seeded irregular case: non-contiguous keys, shuffled arrival
    order, zero lengths, skewed sizes — offsets must equal a pure-Python
    exclusive prefix sum in key order at several partition counts."""
    import random

    rng = random.Random(82)
    keys = rng.sample(range(0, 100_000), 400)
    rows = [(k, rng.choice([0, 1, 3, 7, 1000, 25])) for k in keys]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id long, n int")
    acc, want = 0, {}
    for k, n in sorted(rows):
        want[k] = acc
        acc += n
    for parts in (1, 3, 32):
        got = {
            r["id"]: r["start_offset"]
            for r in PK.with_global_offsets(df, "id", "n", parts).collect()
        }
        assert got == want, f"partitions={parts}"
