from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import text as TX


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog."),
        (2, "the the the a a of and to in is"),  # stopword soup
        (3, "12345 67890 11111"),  # digit soup
        (4, ""),  # empty
        (5, "Der Hund ist nicht ein Tier und das ist gut."),  # German-ish
        (6, "  spaced   out\ttokens \n here  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestStats:
    def test_token_count_handles_whitespace(self, spark, docs):
        got = {
            r["doc_id"]: r["n_tokens"]
            for r in TX.text_stats(docs).select("doc_id", "n_tokens").collect()
        }
        assert got[1] == 9
        assert got[4] == 0
        assert got[6] == 4

    def test_quality_orders_sensibly(self, spark, docs):
        got = {
            r["doc_id"]: r["quality_score"]
            for r in TX.text_stats(docs).select("doc_id", "quality_score").collect()
        }
        assert got[1] > got[3]  # real sentence beats digit soup
        assert got[4] == 0.0

    def test_bpe_ish_counts_exceed_whitespace_for_long_words(self, spark):
        df = spark.createDataFrame(
            [(1, "internationalization compartmentalization")], "id long, text string"
        )
        got = df.select(
            TX.token_count(F.col("text")).alias("ws"),
            TX.bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).first()
        assert got["bpe"] > got["ws"]


class TestLanguageId:
    def test_en_and_de_detected(self, spark, docs):
        got = {
            r["doc_id"]: r["lang_pred"]
            for r in TX.language_id(docs).collect()
        }
        assert got[1] == "en"
        assert got[5] == "de"
        assert got[3] == "und"

    def test_cjk_rule(self, spark):
        df = spark.createDataFrame([(1, "这是一个中文句子")], "id long, text string")
        assert TX.language_id(df).first()["lang_pred"] == "zh"


class TestShingles:
    def test_word_shingles(self, spark):
        df = spark.createDataFrame([(1, "a b c d")], "id long, text string")
        got = df.select(TX.word_shingles(F.col("text"), 3).alias("s")).first()["s"]
        assert sorted(got) == ["a b c", "b c d"]

    def test_short_doc_single_shingle(self, spark):
        df = spark.createDataFrame([(1, "a b")], "id long, text string")
        got = df.select(TX.word_shingles(F.col("text"), 3).alias("s")).first()["s"]
        assert got == ["a b"]

    def test_normalize_strips_punct_case(self, spark):
        df = spark.createDataFrame([(1, "  Hello,   WORLD!! ")], "id long, text string")
        got = df.select(TX.normalize_text(F.col("text")).alias("s")).first()["s"]
        assert got == "hello world"

    def test_fingerprint_ignores_formatting(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello, World!"), (2, "hello   world"), (3, "other text")],
            "id long, text string",
        )
        fps = [
            r["fp"]
            for r in df.select(TX.fingerprint64(F.col("text")).alias("fp"))
            .orderBy("id")
            .collect()
        ]
        assert fps[0] == fps[1] != fps[2]
