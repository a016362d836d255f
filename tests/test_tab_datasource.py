"""ketl_tab Python DataSource: mixed-dialect directory reads."""

from __future__ import annotations

import pytest

from knetminer_etl_spark.sources import register_tab_source


@pytest.fixture()
def drop_zone(tmp_path):
    (tmp_path / "a.tsv").write_text(
        "# export from system A\nid\tname\tscore\n1\talpha\t10\n2\tbeta\t20\n"
    )
    (tmp_path / "b.csv").write_text(
        "id,name,score\n# mid-file comment\n3,gamma,30\n"
    )
    (tmp_path / "c.psv").write_text("id|name|extra\n4|delta|x\n")
    return str(tmp_path)


class TestTabDataSource:
    def test_mixed_dialect_union_schema(self, spark, drop_zone):
        register_tab_source(spark)
        df = spark.read.format("ketl_tab").option("path", drop_zone).load()
        assert df.columns == ["id", "name", "score", "extra"]
        rows = {r["id"]: r for r in df.collect()}
        assert len(rows) == 4
        assert rows["1"]["name"] == "alpha" and rows["1"]["score"] == "10"
        assert rows["3"]["score"] == "30"  # csv dialect
        assert rows["4"]["extra"] == "x" and rows["4"]["score"] is None
        assert rows["1"]["extra"] is None  # missing column → NULL

    def test_one_partition_per_file(self, spark, drop_zone):
        register_tab_source(spark)
        df = spark.read.format("ketl_tab").option("path", drop_zone).load()
        assert df.rdd.getNumPartitions() == 3

    def test_filename_lineage_column(self, spark, drop_zone):
        register_tab_source(spark)
        df = (
            spark.read.format("ketl_tab")
            .option("path", drop_zone)
            .option("include_filename", "true")
            .load()
        )
        assert "_src_file" in df.columns
        srcs = {r["_src_file"].rsplit("/", 1)[-1] for r in df.collect()}
        assert srcs == {"a.tsv", "b.csv", "c.psv"}

    def test_comment_lines_skipped(self, spark, drop_zone):
        register_tab_source(spark)
        df = spark.read.format("ketl_tab").option("path", drop_zone).load()
        assert df.filter("name = 'gamma'").count() == 1  # after mid-file comment
        assert df.count() == 4  # no comment rows leaked

    def test_feeds_the_mapping_pipeline(self, spark, drop_zone):
        """End-to-end: custom source → triples, the reference's tab-file
        entry path re-expressed over the DataSource."""
        from pyspark.sql import functions as F

        from knetminer_etl_spark.tabmap.compiler import DataFrameMapper
        from knetminer_etl_spark.tabmap.mappers import (
            column_triple_mapper,
            type_triple_mapper,
        )

        register_tab_source(spark)
        df = spark.read.format("ketl_tab").option("path", drop_zone).load()
        m = DataFrameMapper(
            "id", [column_triple_mapper("name", "hasName")],
            [type_triple_mapper("Thing")],
        )
        triples = m.to_triples(df)
        got = {
            (r["id"], r["key"], r["value"]) for r in triples.collect()
        }
        assert ("1", "hasName", '"alpha"') in got
        assert ("4", "@type", "Thing") in got


class TestTabWriter:
    def test_write_read_round_trip(self, spark, tmp_path):
        register_tab_source(spark)
        out = str(tmp_path / "sink")
        df = spark.createDataFrame(
            [("1", "alpha", None), ("2", "beta", "x")], "id string, name string, note string"
        )
        df.write.format("ketl_tab").option("path", out).mode("append").save()
        import os

        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        back = spark.read.format("ketl_tab").option("path", out).load()
        rows = {r["id"]: (r["name"], r["note"]) for r in back.collect()}
        assert rows == {"1": ("alpha", None), "2": ("beta", "x")}

    def test_overwrite_replaces_previous_parts(self, spark, tmp_path):
        register_tab_source(spark)
        out = str(tmp_path / "sink2")
        one = spark.createDataFrame([("1", "a")], "id string, v string").coalesce(1)
        two = spark.createDataFrame([("9", "z")], "id string, v string").coalesce(1)
        one.write.format("ketl_tab").option("path", out).mode("append").save()
        two.write.format("ketl_tab").option("path", out).mode("overwrite").save()
        back = spark.read.format("ketl_tab").option("path", out).load()
        assert {r["id"] for r in back.collect()} == {"9"}
