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


def test_scd2_intervals_and_current(spark):
    rows = [
        ("u1", 100, 1, "bronze"),
        ("u1", 200, 2, "silver"),
        ("u1", 300, 3, "gold"),
        ("u2", 150, 4, "bronze"),
    ]
    df = spark.createDataFrame(rows, "key string, ts long, seq long, tier string")
    out = cdc.scd2(df, ["key"], "ts", order_by=["ts", "seq"]).collect()
    by = {(r["key"], r["ts"]): r for r in out}
    assert by[("u1", 100)]["valid_to"] == 200 and not by[("u1", 100)]["is_current"]
    assert by[("u1", 200)]["valid_to"] == 300
    assert by[("u1", 300)]["valid_to"] is None and by[("u1", 300)]["is_current"]
    assert by[("u2", 150)]["is_current"]


def test_scd2_noop_suppression(spark):
    rows = [
        ("u1", 100, 1, "a"),
        ("u1", 200, 2, "a"),   # no-op: suppressed
        ("u1", 300, 3, "b"),
        ("u1", 400, 4, "a"),   # back to a: a real change, kept
    ]
    df = spark.createDataFrame(rows, "key string, ts long, seq long, v string")
    out = sorted(
        cdc.scd2(df, ["key"], "ts", order_by=["ts", "seq"], dedup_consecutive=["v"]).collect(),
        key=lambda r: r["ts"],
    )
    assert [(r["ts"], r["v"], r["valid_to"]) for r in out] == [
        (100, "a", 300),  # interval extends over the suppressed row
        (300, "b", 400),
        (400, "a", None),
    ]


def test_scd2_collision_latest_wins_deterministic(spark):
    # two rows with the SAME (key, ts, seq): struct-max picks one winner
    rows = [("u1", 100, 1, "x"), ("u1", 100, 1, "y")]
    df = spark.createDataFrame(rows, "key string, ts long, seq long, v string")
    for _ in range(2):
        out = cdc.scd2(df, ["key"], "ts", order_by=["ts", "seq"]).collect()
        assert len(out) == 1 and out[0]["v"] == "y"


class TestSnapshotDiff:
    def test_all_change_kinds(self, spark):
        from knetminer_etl_spark.operators.cdc import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
            "id bigint, tag string, v bigint",
        )
        new = spark.createDataFrame(
            [(2, "b", 20), (3, "CHANGED", 30), (4, None, 40), (5, "e", 50)],
            "id bigint, tag string, v bigint",
        )
        got = {
            r["id"]: r["change"]
            for r in snapshot_diff(old, new, ["id"]).collect()
        }
        assert got == {
            1: "removed",
            2: "unchanged",
            3: "changed",
            4: "unchanged",  # NULL <=> NULL is unchanged
            5: "added",
        }

    def test_null_to_value_is_changed(self, spark):
        from knetminer_etl_spark.operators.cdc import snapshot_diff

        old = spark.createDataFrame([(1, None)], "id bigint, tag string")
        new = spark.createDataFrame([(1, "x")], "id bigint, tag string")
        assert snapshot_diff(old, new, ["id"]).collect()[0]["change"] == "changed"

    def test_compare_cols_subset(self, spark):
        from knetminer_etl_spark.operators.cdc import snapshot_diff

        old = spark.createDataFrame([(1, "a", 1)], "id bigint, tag string, v bigint")
        new = spark.createDataFrame([(1, "a", 999)], "id bigint, tag string, v bigint")
        only_tag = snapshot_diff(old, new, ["id"], compare_cols=["tag"])
        assert only_tag.collect()[0]["change"] == "unchanged"

    def test_missing_column_raises(self, spark):
        import pytest as _pytest

        from knetminer_etl_spark.operators.cdc import snapshot_diff

        old = spark.createDataFrame([(1, "a")], "id bigint, tag string")
        new = spark.createDataFrame([(1,)], "id bigint")
        with _pytest.raises(ValueError, match="no shared non-key"):
            snapshot_diff(old, new, ["id"])
        # presence-only diff is the explicit escape hatch
        got = snapshot_diff(old, new, ["id"], compare_cols=[]).collect()
        assert got[0]["change"] == "unchanged"
        # a column named in compare_cols but missing on one side raises
        with _pytest.raises(ValueError, match="absent"):
            snapshot_diff(old, new, ["id"], compare_cols=["tag"])
