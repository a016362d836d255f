"""Checkpointing, unions, config interpolation, session defaults."""

from __future__ import annotations

import pytest

from knetminer_etl_spark.core.config import interpolate_env, load_config
from knetminer_etl_spark.runtime import checkpoint


class TestCheckpoint:
    def test_save_load_roundtrip(self, spark, tmp_path):
        df = spark.range(100).withColumnRenamed("id", "n")
        out = tmp_path / "ck"
        checkpoint.save(df, out)
        assert checkpoint.is_done(out)
        back = checkpoint.load(str(out), spark)
        assert back.count() == 100

    def test_load_accepts_success_path(self, spark, tmp_path):
        df = spark.range(10)
        out = tmp_path / "ck2"
        checkpoint.save(df, out)
        back = checkpoint.load(checkpoint.df_check_path(out), spark)
        assert back.count() == 10

    def test_df_path_strips_marker(self):
        assert checkpoint.df_path("/a/b/_SUCCESS") == "/a/b"
        assert checkpoint.df_path("/a/b") == "/a/b"

    def test_tuned_partitions_small_df(self, spark):
        df = spark.range(1000)
        want = checkpoint.tuned_partitions(df)
        assert want == 1  # tiny data → single ~256MiB-target file

    def test_union_all(self, spark):
        a = spark.createDataFrame([(1, "x")], "n int, s string")
        b = spark.createDataFrame([(2,)], "n int")
        got = checkpoint.union_all(a, b).collect()
        assert {(r["n"], r["s"]) for r in got} == {(1, "x"), (2, None)}


class TestConfig:
    def test_interpolation(self, monkeypatch):
        monkeypatch.setenv("KETL_X", "42")
        assert interpolate_env("a=${KETL_X} b=${MISSING:7}") == "a=42 b=7"
        with pytest.raises(KeyError):
            interpolate_env("${DEFINITELY_NOT_SET_XYZ}")

    def test_load_config_yaml(self, tmp_path, monkeypatch):
        monkeypatch.setenv("DATA_DIR", "/data")
        f = tmp_path / "c.yaml"
        f.write_text("input: ${DATA_DIR}/in.tsv\nbatch: ${BATCH:2500}\n")
        cfg = load_config(f)
        assert cfg == {"input": "/data/in.tsv", "batch": 2500}

    def test_load_config_literal_text(self):
        assert load_config("a: 1") == {"a": 1}


class TestSessionDefaults:
    def test_aqe_and_utc(self, spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


class TestPartitionedSave:
    def test_partition_pruning_at_planning_time(self, spark, tmp_path):
        """A filter on the partition column must land in PartitionFilters
        (directory pruning), not in the data filters — the 100 TB lever:
        the scan only lists/reads the matching col=value directories."""
        import os

        from pyspark.sql import functions as F

        from knetminer_etl_spark.runtime import checkpoint as CP

        df = spark.range(1000).select(
            F.col("id"),
            (F.col("id") % 4).cast("string").alias("bucket"),
        )
        out = str(tmp_path / "part")
        CP.save_partitioned(df, out, ["bucket"])
        # hive layout on disk
        assert sorted(
            d for d in os.listdir(out) if d.startswith("bucket=")
        ) == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]

        back = spark.read.parquet(out).filter(F.col("bucket") == "2")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        # the partition predicate must appear in PartitionFilters, and the
        # row values must round-trip
        pf = plan.split("PartitionFilters")[1][:200]
        assert "bucket" in pf
        got = sorted(r["id"] for r in back.collect())
        assert got == [i for i in range(1000) if i % 4 == 2]

    def test_writer_preshuffles_on_partition_cols(self, spark, tmp_path):
        """One output file per partition directory (not one per input
        task x partition): the pre-shuffle routes each partition's rows
        to one task."""
        import glob

        from pyspark.sql import functions as F

        from knetminer_etl_spark.runtime import checkpoint as CP

        df = (
            spark.range(400)
            .repartition(8)  # many input tasks
            .select(F.col("id"), (F.col("id") % 2).cast("string").alias("p"))
        )
        out = str(tmp_path / "files")
        CP.save_partitioned(df, out, ["p"])
        for d in ("p=0", "p=1"):
            files = glob.glob(f"{out}/{d}/*.parquet")
            assert len(files) == 1, files


def test_group_agg_partitions_ignores_unknown_stats_sentinel(spark):
    """RDD-backed relations report Long.MaxValue sizeInBytes; the sizing
    must treat that as 'stats unavailable' and fall back to the input's
    real partition count — not silently hit the 4096 cap and aggregate
    two rows through thousands of empty tasks."""
    from knetminer_etl_spark.runtime.checkpoint import group_agg_partitions

    tiny = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    n = group_agg_partitions(tiny)
    assert n <= max(int(spark.conf.get("spark.sql.shuffle.partitions")),
                    tiny.rdd.getNumPartitions())
    # parquet-backed plans have real stats and keep the byte-based sizing
    import tempfile

    d = tempfile.mkdtemp() + "/t"
    spark.range(0, 1000).write.parquet(d)
    n2 = group_agg_partitions(spark.read.parquet(d))
    assert 1 <= n2 <= 4096


class TestFormatRoundTrips:
    def test_orc_and_json_round_trip(self, spark, tmp_path):
        from knetminer_etl_spark.runtime import checkpoint as CP

        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, None, 2.5)], "id long, s string, v double"
        )
        for fmt in ("orc", "json"):
            p = str(tmp_path / fmt)
            CP.save(df, p, format=fmt)
            assert CP.is_done(p)
            back = CP.load(p, spark, format=fmt)
            got = sorted((r["id"], r["s"], r["v"]) for r in back.collect())
            assert got == [(1, "a", 1.5), (2, None, 2.5)]
