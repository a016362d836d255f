"""UDTF surface + observed metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from knetminer_etl_spark.functions import (
    SplitTextUDTF,
    observed,
    pipeline_counters,
    register_udtfs,
)
from knetminer_etl_spark.operators.text import chunk_documents


class TestSplitTextUDTF:
    def test_matches_column_chunker(self, spark):
        rows = [
            (1, "one two three four five six seven eight nine ten"),
            (2, "single"),
            (3, ""),
            (4, None),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        register_udtfs(spark)
        docs.createOrReplaceTempView("udtf_docs")
        via_udtf = spark.sql(
            "SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text "
            "FROM udtf_docs d, LATERAL split_text(d.text, 4, 3) c"
        )
        via_cols = chunk_documents(docs, window=4, stride=3)
        assert sorted(map(tuple, via_udtf.collect())) == sorted(
            map(tuple, via_cols.collect())
        )

    def test_lateral_preserves_outer_columns(self, spark):
        register_udtfs(spark)
        spark.createDataFrame(
            [(7, "a b c d e")], "doc_id long, text string"
        ).createOrReplaceTempView("udtf_docs2")
        got = spark.sql(
            "SELECT doc_id, chunk_idx FROM udtf_docs2, "
            "LATERAL split_text(text, 2, 2)"
        ).collect()
        assert {(r["doc_id"], r["chunk_idx"]) for r in got} == {
            (7, 0), (7, 1), (7, 2)
        }


class TestObservedMetrics:
    def test_counters_ride_the_action(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, None)], "id long, v string"
        )
        out, obs = pipeline_counters(df, null_cols=["v"])
        out.write.mode("overwrite").parquet(str(tmp_path / "o"))
        assert obs.get == {"n_rows": 3, "n_null_v": 2}

    def test_custom_metrics(self, spark):
        df = spark.range(10)
        out, obs = observed(
            df, {"total": F.sum("id"), "big": F.count_if(F.col("id") > 7)}
        )
        out.collect()
        assert obs.get == {"total": 45, "big": 2}


class TestGroupedAggUDFs:
    def test_weighted_median_in_groupby(self, spark):
        from knetminer_etl_spark.functions.udafs import weighted_median_agg

        rows = [
            ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 100.0, 0.1),
            ("b", 5.0, 10.0), ("b", 50.0, 1.0),
        ]
        df = spark.createDataFrame(rows, "k string, v double, w double")
        got = {
            r["k"]: r["wm"]
            for r in df.groupBy("k")
            .agg(weighted_median_agg("v", "w").alias("wm"))
            .collect()
        }
        # a: total w=2.1, half=1.05 -> cum reaches 1.05 at v=2.0
        assert got["a"] == 2.0
        # b: half=5.5 -> first v with cum>=5.5 is 5.0
        assert got["b"] == 5.0

    def test_trimmed_mean_matches_manual(self, spark):
        from knetminer_etl_spark.functions.udafs import trimmed_mean

        vals = list(map(float, range(1, 21))) + [1000.0]  # one outlier
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.agg(trimmed_mean("v").alias("t")).first()["t"]
        import statistics

        s = sorted(vals)
        k = int(len(s) * 0.1)
        assert abs(got - statistics.mean(s[k : len(s) - k])) < 1e-9

    def test_weighted_median_over_window(self, spark):
        from pyspark.sql import Window

        from knetminer_etl_spark.functions.udafs import weighted_median_agg

        df = spark.createDataFrame(
            [("a", 1.0, 1.0), ("a", 3.0, 1.0), ("b", 9.0, 1.0)],
            "k string, v double, w double",
        )
        w = Window.partitionBy("k")
        got = {
            (r["k"], r["v"]): r["wm"]
            for r in df.withColumn(
                "wm", weighted_median_agg("v", "w").over(w)
            ).collect()
        }
        assert got[("a", 1.0)] == 1.0 and got[("a", 3.0)] == 1.0
        assert got[("b", 9.0)] == 9.0
