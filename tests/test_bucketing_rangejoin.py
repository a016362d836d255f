from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators.rangejoin import range_join
from knetminer_etl_spark.runtime.bucketing import (
    join_is_shuffle_free,
    read_table,
    write_bucketed,
)


class TestBucketing:
    @pytest.fixture(autouse=True, scope="class")
    def _cleanup_tables(self, spark):
        yield
        for t in ("bk_a", "bk_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    def test_bucketed_join_skips_shuffle(self, spark, tmp_path):
        a = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        write_bucketed(a, "bk_a", "k", num_buckets=4, sort_cols="k")
        write_bucketed(b, "bk_b", "k", num_buckets=4, sort_cols="k")
        # force a non-broadcast join so co-location (not broadcast) is
        # what makes it shuffle-free
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = read_table(spark, "bk_a").join(read_table(spark, "bk_b"), "k")
            assert joined.count() == 1000
            assert join_is_shuffle_free(joined)
            # same join on unbucketed frames DOES shuffle
            assert not join_is_shuffle_free(a.join(b, "k"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_bucketed_agg_skips_shuffle(self, spark, tmp_path):
        agg = read_table(spark, "bk_a").groupBy("k").agg(F.sum("va"))
        assert join_is_shuffle_free(agg)


class TestRangeJoin:
    def T(self, s: int) -> dt.datetime:
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    @pytest.fixture()
    def data(self, spark):
        points = spark.createDataFrame(
            [(i, self.T(i * 500)) for i in range(20)], "pid long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [
                (100, self.T(0), self.T(1200)),
                (200, self.T(1000), self.T(1400)),
                (300, self.T(9000), self.T(9600)),
            ],
            "iid long, start timestamp, end timestamp",
        )
        return points, intervals

    def naive(self, points, intervals):
        return points.crossJoin(intervals).filter(
            (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
        )

    def test_matches_naive_cross_join(self, spark, data):
        points, intervals = data
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, bucket_secs=600).collect()
        )
        want = sorted(
            (r["pid"], r["iid"]) for r in self.naive(points, intervals).collect()
        )
        assert got == want and len(got) > 0

    def test_left_keeps_unmatched_points(self, spark, data):
        points, intervals = data
        left = range_join(points, intervals, bucket_secs=600, how="left")
        matched_pids = {
            r["pid"] for r in self.naive(points, intervals).collect()
        }
        rows = left.collect()
        assert {r["pid"] for r in rows} == set(range(20))  # every point present
        for r in rows:
            if r["pid"] not in matched_pids:
                assert r["iid"] is None

    def test_bucket_width_irrelevant_to_result(self, spark, data):
        points, intervals = data
        a = sorted(
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, bucket_secs=100).collect()
        )
        b = sorted(
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, bucket_secs=7200).collect()
        )
        assert a == b
