from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.runtime.joins import salted_join, split_skew_join
from knetminer_etl_spark.runtime.workflow import Pipeline


class TestPipeline:
    def build(self, tmp_path, calls):
        p = Pipeline(tmp_path, "t")

        @p.stage("numbers")
        def numbers(spark, inputs):
            calls.append("numbers")
            return spark.range(100).withColumnRenamed("id", "n")

        @p.stage("evens", deps=["numbers"])
        def evens(spark, inputs):
            calls.append("evens")
            return inputs["numbers"].filter(F.col("n") % 2 == 0)

        @p.stage("stats", deps=["evens"])
        def stats(spark, inputs):
            calls.append("stats")
            return inputs["evens"].agg(F.sum("n").alias("total"))

        return p

    def test_runs_in_order_then_skips(self, spark, tmp_path):
        calls: list[str] = []
        p = self.build(tmp_path, calls)
        r1 = p.run(spark)
        assert [s.name for s in r1] == ["numbers", "evens", "stats"]
        assert all(s.ran for s in r1)
        assert p.load(spark, "stats").first()["total"] == 2450

        r2 = p.run(spark)
        assert not any(s.ran for s in r2)  # all checkpoints reused
        assert calls == ["numbers", "evens", "stats"]  # fns not re-invoked

    def test_force_reruns_downstream(self, spark, tmp_path):
        calls: list[str] = []
        p = self.build(tmp_path, calls)
        p.run(spark)
        r = p.run(spark, force=["evens"])
        ran = {s.name for s in r if s.ran}
        assert ran == {"evens", "stats"}  # numbers untouched

    def test_targets_compute_only_needed(self, spark, tmp_path):
        calls: list[str] = []
        p = self.build(tmp_path, calls)
        r = p.run(spark, targets=["evens"])
        assert {s.name for s in r} == {"numbers", "evens"}

    def test_unknown_dep_rejected(self, tmp_path):
        p = Pipeline(tmp_path)
        with pytest.raises(ValueError):

            @p.stage("x", deps=["nope"])
            def x(spark, inputs):
                return None


class TestSkewJoins:
    def test_salted_join_matches_plain(self, spark):
        big = spark.createDataFrame(
            [(k, i) for i in range(50) for k in ("hot", f"k{i % 5}")],
            "key string, v int",
        )
        small = spark.createDataFrame(
            [("hot", 1), ("k0", 2), ("k3", 3)], "key string, w int"
        )
        plain = sorted(
            (r["key"], r["v"], r["w"])
            for r in big.join(small, "key").collect()
        )
        salted = sorted(
            (r["key"], r["v"], r["w"])
            for r in salted_join(big, small, "key", salt_buckets=4).collect()
        )
        assert salted == plain

    def test_split_skew_join_matches_plain(self, spark):
        big = spark.createDataFrame(
            [("hot", i) for i in range(200)] + [(f"k{i}", i) for i in range(20)],
            "key string, v int",
        )
        small = spark.createDataFrame(
            [("hot", 1)] + [(f"k{i}", i) for i in range(20)], "key string, w int"
        )
        plain = sorted(
            (r["key"], r["v"], r["w"]) for r in big.join(small, "key").collect()
        )
        split = sorted(
            (r["key"], r["v"], r["w"])
            for r in split_skew_join(big, small, "key", hot_min_count=100).collect()
        )
        assert split == plain


def test_stage_results_carry_observed_row_counts(spark, tmp_path):
    from knetminer_etl_spark.runtime.workflow import Pipeline

    pipe = Pipeline(tmp_path / "obs_pipe")

    @pipe.stage("src")
    def src(spark_, inputs):
        return spark_.range(7).toDF("id")

    @pipe.stage("doubled", deps=["src"])
    def doubled(spark_, inputs):
        return inputs["src"].selectExpr("id * 2 AS id")

    results = {r.name: r for r in pipe.run(spark)}
    assert results["src"].n_rows == 7
    assert results["doubled"].n_rows == 7
    # reused stages report no count (nothing was recomputed)
    rerun = {r.name: r for r in pipe.run(spark)}
    assert rerun["src"].ran is False and rerun["src"].n_rows is None
