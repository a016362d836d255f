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


class TestQualityRules:
    def test_rules_and_reasons(self, spark):
        long_good = " ".join(["the quick brown fox and a dog"] * 5)  # 35 toks, stopwords
        df = spark.createDataFrame(
            [
                (1, long_good),
                (2, "tiny doc"),  # too_short + low_stopwords
                (3, " ".join(["12345 678 90"] * 12)),  # digit_soup (+ low_stopwords)
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in TX.quality_rules(df).collect()}
        assert rows[1]["passes"] and rows[1]["fail_reasons"] == []
        assert not rows[2]["passes"]
        assert "too_short" in rows[2]["fail_reasons"]
        assert "digit_soup" in rows[3]["fail_reasons"]

    def test_quality_filter_keeps_schema(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        out = TX.quality_filter(df)
        assert out.columns == ["doc_id", "text"]
        assert out.count() == 0  # the one doc fails


class TestRedactPII:
    def test_redaction_and_counts(self, spark):
        txt = "mail a@b.com or visit https://x.org/y?z=1 call +1 (555) 010-1234 ip 10.0.0.1 end"
        df = spark.createDataFrame([(1, txt)], "id long, text string")
        cnt = TX.pii_counts(F.col("text"))
        row = df.select(
            TX.redact_pii(F.col("text")).alias("red"),
            cnt["url"].alias("u"), cnt["email"].alias("e"),
            cnt["ip"].alias("i"), cnt["phone"].alias("p"),
        ).first()
        assert row["u"] == 1 and row["e"] == 1 and row["i"] == 1 and row["p"] == 1
        assert row["red"] == "mail <EMAIL> or visit <URL> call <PHONE> ip <IP> end"

    def test_url_embedded_email_counts_once(self, spark):
        df = spark.createDataFrame(
            [(1, "see https://x.org/mail/a@b.com only")], "id long, text string"
        )
        cnt = TX.pii_counts(F.col("text"))
        row = df.select(cnt["url"].alias("u"), cnt["email"].alias("e")).first()
        assert row["u"] == 1 and row["e"] == 0
