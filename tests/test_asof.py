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


class TestDirections:
    @pytest.fixture()
    def sides(self, spark):
        left = spark.createDataFrame(
            [("k", 10), ("k", 25), ("k", 40), ("q", 5)],
            "by string, ts long",
        )
        right = spark.createDataFrame(
            [("k", 8, 1.0), ("k", 20, 2.0), ("k", 30, 3.0), ("q", 50, 9.0)],
            "by string, ts long, v double",
        )
        return left, right

    def _got(self, df):
        return {
            (r["by"], r["ts"]): (r["ts_right"], r["v_right"])
            for r in df.collect()
        }

    def test_forward(self, spark, sides):
        from knetminer_etl_spark.operators.asof import asof_join

        left, right = sides
        got = self._got(asof_join(left, right, by="by", direction="forward"))
        assert got[("k", 10)] == (20, 2.0)
        assert got[("k", 25)] == (30, 3.0)
        assert got[("k", 40)] == (None, None)  # nothing at/after 40
        assert got[("q", 5)] == (50, 9.0)

    def test_nearest_with_backward_tie(self, spark, sides):
        from knetminer_etl_spark.operators.asof import asof_join

        left, right = sides
        got = self._got(asof_join(left, right, by="by", direction="nearest"))
        assert got[("k", 10)] == (8, 1.0)  # dist 2 beats 10
        assert got[("k", 25)] == (20, 2.0)  # tie (5 vs 5) -> backward
        assert got[("k", 40)] == (30, 3.0)
        assert got[("q", 5)] == (50, 9.0)  # only forward exists

    def test_forward_equal_ts_is_inclusive(self, spark):
        from knetminer_etl_spark.operators.asof import asof_join

        left = spark.createDataFrame([("k", 20)], "by string, ts long")
        right = spark.createDataFrame(
            [("k", 20, 7.0)], "by string, ts long, v double"
        )
        got = self._got(asof_join(left, right, by="by", direction="forward"))
        assert got[("k", 20)] == (20, 7.0)

    def test_nearest_tolerance(self, spark, sides):
        from knetminer_etl_spark.operators.asof import asof_join

        left, right = sides
        got = self._got(
            asof_join(left, right, by="by", direction="nearest", tolerance_secs=3)
        )
        assert got[("k", 10)] == (8, 1.0)  # dist 2 <= 3
        assert got[("k", 25)] == (None, None)  # dist 5 > 3
        assert got[("q", 5)] == (None, None)  # dist 45 > 3

    def test_directions_match_pandas_merge_asof(self, spark):
        import pandas as pd

        from knetminer_etl_spark.operators.asof import asof_join

        rng_l = [(i * 7 + 3) % 100 for i in range(40)]
        rng_r = [(i * 13 + 1) % 100 for i in range(25)]
        lpdf = pd.DataFrame({"ts": sorted(set(rng_l))})
        rpdf = pd.DataFrame(
            {"ts": sorted(set(rng_r)), "v": [float(x) for x in sorted(set(rng_r))]}
        )
        left = spark.createDataFrame(lpdf.assign(by="k"), "ts long, by string")
        right = spark.createDataFrame(
            rpdf.assign(by="k"), "ts long, v double, by string"
        )
        for direction in ("backward", "forward", "nearest"):
            want = pd.merge_asof(lpdf, rpdf, on="ts", direction=direction)
            got = (
                asof_join(left, right, by="by", direction=direction)
                .orderBy("ts")
                .toPandas()
            )
            for (_, w), (_, g) in zip(want.iterrows(), got.iterrows()):
                assert w["ts"] == g["ts"]
                gv = g["v_right"]
                if pd.isna(w["v"]):
                    assert pd.isna(gv), (direction, w["ts"])
                else:
                    assert gv == w["v"], (direction, w["ts"], gv, w["v"])

    def test_invalid_direction_raises(self, spark, sides):
        from knetminer_etl_spark.operators.asof import asof_join

        left, right = sides
        with pytest.raises(ValueError, match="direction"):
            asof_join(left, right, by="by", direction="sideways")
