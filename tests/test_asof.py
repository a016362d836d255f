from __future__ import annotations

import datetime as dt

import pytest

from knetminer_etl_spark.operators.asof import asof_join


def T(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, T(10), "c1"), (1, T(20), "c2"), (2, T(5), "c3"), (3, T(9), "c4")],
        "user long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, T(8), 1.0), (1, T(15), 2.0), (1, T(20), 3.0), (2, T(9), 9.0)],
        "user long, ts timestamp, v double",
    )
    return left, right


class TestAsofJoin:
    def test_latest_at_or_before(self, spark, sides):
        left, right = sides
        got = {
            (r["user"], r["name"]): r["v_right"]
            for r in asof_join(left, right, on="ts", by="user").collect()
        }
        assert got[(1, "c1")] == 1.0  # ts=10 → error at 8
        assert got[(1, "c2")] == 3.0  # inclusive: ts=20 matches right at 20
        assert got[(2, "c3")] is None  # right at 9 is after left 5
        assert got[(3, "c4")] is None  # key with no right rows

    def test_left_rows_preserved(self, spark, sides):
        left, right = sides
        assert asof_join(left, right, on="ts", by="user").count() == left.count()

    def test_tolerance_excludes_stale(self, spark, sides):
        left, right = sides
        got = {
            (r["user"], r["name"]): r["v_right"]
            for r in asof_join(
                left, right, on="ts", by="user", tolerance_secs=1
            ).collect()
        }
        assert got[(1, "c1")] is None  # 10-8=2s > 1s tolerance
        assert got[(1, "c2")] == 3.0  # exact-time match stays
