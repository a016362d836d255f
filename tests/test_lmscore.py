from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators import lmscore as LM


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "xqzv qwpf zzyx glorp"),  # gibberish: all OOV-ish
        (4, "the the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_train_counts_and_tiebreak(spark, corpus):
    vocab = {r["token"]: r["n"] for r in LM.unigram_train(corpus).collect()}
    assert vocab["the"] == 8
    assert vocab["sat"] == 2 and vocab["on"] == 2
    top = LM.unigram_train(corpus, vocab_size=3).collect()
    assert [r["token"] for r in top][0] == "the"
    # ties at n=2 break alphabetically
    assert [r["token"] for r in top][1:] == ["on", "sat"]


def test_scores_match_hand_computation(spark, corpus):
    vocab = LM.unigram_train(corpus)
    vdict = {r["token"]: r["n"] for r in vocab.collect()}
    N, V = sum(vdict.values()), len(vdict)
    got = {r["doc_id"]: r for r in LM.lm_score(corpus, vocab).collect()}
    for doc_id, text in [(1, "the cat sat on the mat"), (4, "the the the the")]:
        toks = text.split()
        want = sum(
            math.log((vdict.get(t, 0) + 1.0) / (N + V + 1.0)) for t in toks
        ) / len(toks)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert abs(got[doc_id]["avg_logprob"] - want) < 1e-5, doc_id


def test_gibberish_scores_below_fluent_and_filter_drops_it(spark, corpus):
    vocab = LM.unigram_train(corpus)
    got = {r["doc_id"]: r["avg_logprob"] for r in LM.lm_score(corpus, vocab).collect()}
    assert got[3] < got[1] and got[3] < got[2] and got[3] < got[4]
    floor = (got[3] + min(got[1], got[2], got[4])) / 2
    kept = {r["doc_id"] for r in LM.lm_quality_filter(corpus, vocab, floor).collect()}
    assert kept == {1, 2, 4}


def test_oov_capped_vocab_smoothing(spark, corpus):
    # with a 2-token vocab, everything else takes the unseen slot
    vocab = LM.unigram_train(corpus, vocab_size=2)
    vdict = {r["token"]: r["n"] for r in vocab.collect()}
    N, V = sum(vdict.values()), 2
    got = {r["doc_id"]: r for r in LM.lm_score(corpus, vocab).collect()}
    want = math.log(1.0 / (N + V + 1.0))  # all-OOV doc
    assert abs(got[3]["avg_logprob"] - want) < 1e-5


def test_score_plan_broadcasts_vocab(spark, corpus):
    vocab = LM.unigram_train(corpus)
    plan = (
        LM.lm_score(corpus, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles to join


class TestBigramLM:
    def test_hand_computed_scores(self, spark):
        import math

        from knetminer_etl_spark.operators.lmscore import (
            bigram_score,
            bigram_train,
            unigram_train,
        )

        corpus = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
        )
        uni = unigram_train(corpus, vocab_size=10)     # a:3, b:3 -> V=2
        bi = bigram_train(corpus, table_size=10)       # (a,b):3, (b,a):1
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
            for r in bigram_score(corpus, uni, bi).collect()
        }
        # p(b|a) = (3+1)/(3+2+1) = 4/6; p(a|b) = (1+1)/(3+3) = 2/6
        pab, pba = math.log(4 / 6), math.log(2 / 6)
        assert got[1][0] == 3
        assert abs(got[1][1] - round((2 * pab + pba) / 3, 6)) < 1e-9
        assert got[2] == (1, round(pab, 6))

    def test_gibberish_scores_below_fluent(self, spark):
        from knetminer_etl_spark.operators.lmscore import (
            bigram_score,
            bigram_train,
            unigram_train,
        )

        fluent = "the cat sat on the mat and the dog sat on the rug"
        rows = [(i, fluent) for i in range(5)] + [(99, "zq xv qq vv zz xx")]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        uni = unigram_train(corpus, vocab_size=100)
        bi = bigram_train(corpus, table_size=100)
        got = {r["doc_id"]: r["avg_logprob"] for r in bigram_score(corpus, uni, bi).collect()}
        assert got[99] < got[0]

    def test_single_token_docs_emit_no_row(self, spark):
        from knetminer_etl_spark.operators.lmscore import (
            bigram_score,
            bigram_train,
            unigram_train,
        )

        corpus = spark.createDataFrame(
            [(1, "hello"), (2, "hello world")], "doc_id long, text string"
        )
        uni = unigram_train(corpus, vocab_size=10)
        bi = bigram_train(corpus, table_size=10)
        ids = {r["doc_id"] for r in bigram_score(corpus, uni, bi).collect()}
        assert ids == {2}
