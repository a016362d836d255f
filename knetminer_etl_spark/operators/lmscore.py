"""Unigram language-model quality scoring (the CCNet-style LM filter).

Web-corpus curation ranks documents by how "language-like" they are
under a reference LM and drops the worst tail (CCNet buckets by KenLM
perplexity). A full KenLM needs native libs; the distributed skeleton —
train a model as a bounded table, broadcast it, score at scan speed —
is identical for any n-gram order, so this module implements the
unigram case end-to-end and real pipelines swap the probability table:

* **train** (:func:`unigram_train`): one map-side-combined token count
  aggregate, capped to the top-``V`` vocabulary (deterministic
  tie-break) — the model is ``V+1`` add-one-smoothed probabilities, a
  bounded table whatever the corpus size.
* **score** (:func:`lm_score`): explode tokens, broadcast-join the
  vocab table (out-of-vocabulary tokens take the smoothed unseen
  probability), average log-prob per document — fact rows never
  shuffle; only the per-doc aggregate does.
* **filter** (:func:`lm_quality_filter`): keep documents above a
  log-prob floor — the "drop the gibberish tail" step.

Scores are averages of ``ln`` terms; both engines' libm agree to ~1
ulp, so scores are emitted rounded to 6 dp (the repo's established
float-oracle contract, same as cosine scores). Training counts and
vocabulary choice are exact-integer and deterministic.

No counterpart in the reference; north-star corpus-quality extension
alongside text.quality_rules (rule-based) — this is the statistical
complement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"),
    )


def unigram_train(
    corpus: DataFrame,
    text_col: str = "text",
    vocab_size: int = 10_000,
) -> DataFrame:
    """(token, n) for the top-``vocab_size`` tokens (count desc, token
    asc tie-break) plus the grand totals needed for smoothing, as a
    small DataFrame: one aggregation over the exploded tokens, then a
    TakeOrdered — the model table is bounded by ``V`` regardless of
    corpus size."""
    return (
        corpus.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"))
        .groupBy("_tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("_tok"))
        .limit(vocab_size)
        .select(F.col("_tok").alias("token"), "n")
    )


def lm_score(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    total_tokens: int | None = None,
    vocab_size: int | None = None,
) -> DataFrame:
    """(id, n_tokens, avg_logprob): mean add-one-smoothed unigram
    log-probability per document.

    ``p(tok) = (n_tok + 1) / (N + V + 1)`` with ``N`` the total count
    mass in the vocab table and ``V`` its size (the +1 slot is the
    shared unseen token; OOV tokens get ``1/(N+V+1)``). ``N``/``V``
    default to aggregates of ``vocab`` computed driver-side (the table
    is small by construction); pass them explicitly to pin a model
    trained elsewhere. The vocab join is broadcast — scoring never
    shuffles the corpus, only the per-doc (sum, count) aggregate.
    """
    if total_tokens is None or vocab_size is None:
        agg = vocab.agg(
            F.sum("n").alias("N"), F.count("*").alias("V")
        ).first()
        total_tokens = total_tokens if total_tokens is not None else int(agg["N"] or 0)
        vocab_size = vocab_size if vocab_size is not None else int(agg["V"])
    denom = float(total_tokens + vocab_size + 1)
    toks = _doc_tokens(docs, id_col, text_col)
    joined = toks.join(
        F.broadcast(vocab.withColumnRenamed("token", "_tok")), "_tok", "left"
    )
    logp = F.log((F.coalesce(F.col("n"), F.lit(0)) + F.lit(1.0)) / F.lit(denom))
    return (
        joined.groupBy("_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "avg_logprob")
    )


def lm_quality_filter(
    docs: DataFrame,
    vocab: DataFrame,
    min_avg_logprob: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents scoring at or above the floor — the LM-filter step.
    The score join is on the doc id (scores are one row per doc)."""
    scores = lm_score(docs, vocab, id_col, text_col)
    return docs.join(
        scores.filter(F.col("avg_logprob") >= min_avg_logprob).select(id_col),
        id_col,
    )


def vocab_sql(text_col: str, vocab_size: int, table: str = "documents") -> str:
    """DuckDB twin of :func:`unigram_train` (same tokenizer contract as
    queries/sketches.py)."""
    toks = (
        f"list_filter(string_split_regex(trim(lower({text_col})), '\\s+'),"
        " x -> x <> '')"
    )
    return f"""
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({toks}) AS token FROM {table})
  GROUP BY token
  ORDER BY n DESC, token ASC
  LIMIT {vocab_size}
"""


# ---------------------------------------------------------------------------
# Bigram LM (conditional probabilities, same bounded-table discipline)
# ---------------------------------------------------------------------------


def bigram_train(
    corpus: DataFrame,
    text_col: str = "text",
    table_size: int = 50_000,
) -> DataFrame:
    """(w1, w2, n) for the top-``table_size`` adjacent token pairs
    (count desc, (w1, w2) asc tie-break) — the bigram model table, one
    map-side-combined aggregate over narrow zip_with pair expansion
    (no window, no shuffle of the corpus beyond the count agg)."""
    toks = tokens(F.lower(F.col(text_col)))
    pairs = F.expr(
        "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1), "
        "(a, b) -> named_struct('w1', a, 'w2', b))"
    )
    return (
        corpus.select(toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
        .limit(table_size)
    )


def bigram_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int | None = None,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob): mean add-one-smoothed conditional
    log-probability ``ln p(w_i | w_{i-1})`` per document, with

        p(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V + 1)

    ``c(w1)`` the context's unigram count (0 for out-of-vocab contexts)
    and ``V`` the unigram vocabulary size — unseen pairs and contexts
    degrade gracefully to the smoothed floor. Both model tables
    broadcast; the corpus never shuffles except the per-doc aggregate.
    Documents with fewer than 2 tokens yield no row (no bigrams to
    score) — the same convention as SQL aggregation over zero rows.
    """
    if vocab_size is None:
        vocab_size = unigrams.count()
    toks = tokens(F.lower(F.col(text_col)))
    pairs = F.expr(
        "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1), "
        "(a, b) -> named_struct('w1', a, 'w2', b))"
    )
    exploded = (
        docs.select(F.col(id_col).alias("_id"), toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select("_id", F.explode(pairs).alias("p"))
        .select("_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    joined = exploded.join(
        F.broadcast(bigrams.withColumnRenamed("n", "_nbi")), ["w1", "w2"], "left"
    ).join(
        F.broadcast(
            unigrams.select(F.col("token").alias("w1"), F.col("n").alias("_nuni"))
        ),
        "w1",
        "left",
    )
    logp = F.log(
        (F.coalesce(F.col("_nbi"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("_nuni"), F.lit(0)) + F.lit(float(vocab_size + 1)))
    )
    return (
        joined.groupBy("_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
        )
        .select(F.col("_id").alias(id_col), "n_bigrams", "avg_logprob")
    )


def bigram_sql(text_col: str, table_size: int, table: str = "documents") -> str:
    """DuckDB twin of :func:`bigram_train`."""
    toks = (
        f"list_filter(string_split_regex(trim(lower({text_col})), '\\s+'),"
        " x -> x <> '')"
    )
    return f"""
  SELECT p['w1'] AS w1, p['w2'] AS w2, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT unnest([{{'w1': t[i], 'w2': t[i+1]}}
                   for i in generate_series(1, len(t) - 1)]) AS p
    FROM (SELECT {toks} AS t FROM {table}) WHERE len(t) >= 2
  )
  GROUP BY 1, 2
  ORDER BY n DESC, w1 ASC, w2 ASC
  LIMIT {table_size}
"""
