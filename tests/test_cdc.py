from __future__ import annotations

from pyspark.sql import functions as F

from knetminer_etl_spark.operators import cdc


def test_latest_by_key_picks_newest_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("k1", 1, 10, "a"),
            ("k1", 2, 11, "b"),
            ("k1", 2, 12, "c"),  # same version, higher seq wins
            ("k2", 5, 1, "d"),
        ],
        "key string, version int, seq int, val string",
    )
    rows = {r["key"]: r for r in cdc.latest_by_key(df, ["key"], ["version", "seq"]).collect()}
    assert len(rows) == 2
    assert rows["k1"]["val"] == "c" and rows["k1"]["seq"] == 12
    assert rows["k2"]["val"] == "d"
    assert cdc.latest_by_key(df, ["key"], ["version", "seq"]).columns == df.columns


def test_latest_by_key_is_combining_aggregate_not_window(spark):
    df = spark.createDataFrame([("k", 1, 1, "v")], "key string, version int, seq int, val string")
    plan = (
        cdc.latest_by_key(df, ["key"], ["version", "seq"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan  # must be the partial-agg shape
    assert "partial_max" in plan or "HashAggregate" in plan


def test_merge_upsert_overwrites_and_inserts(spark):
    base = spark.createDataFrame(
        [("k1", 1, 1, "old"), ("k2", 1, 1, "keep")],
        "key string, version int, seq int, val string",
    )
    updates = spark.createDataFrame(
        [("k1", 2, 2, "new"), ("k3", 1, 1, "ins")],
        "key string, version int, seq int, val string",
    )
    got = {
        r["key"]: r["val"]
        for r in cdc.merge_upsert(base, updates, ["key"], ["version", "seq"]).collect()
    }
    assert got == {"k1": "new", "k2": "keep", "k3": "ins"}


def test_merge_upsert_tombstones(spark):
    base = spark.createDataFrame(
        [("k1", 1, 1, "a"), ("k2", 1, 1, "b")],
        "key string, version int, seq int, val string",
    )
    updates = spark.createDataFrame(
        [("k1", 2, 2, "x", True), ("k2", 0, 0, "stale-del", True)],
        "key string, version int, seq int, val string, deleted boolean",
    )
    out = cdc.merge_upsert(base, updates, ["key"], ["version", "seq"], delete_col="deleted")
    got = {r["key"]: r["val"] for r in out.collect()}
    # k1's tombstone is newest -> dropped; k2's tombstone is older than base -> kept
    assert got == {"k2": "b"}
    assert "deleted" not in out.columns
