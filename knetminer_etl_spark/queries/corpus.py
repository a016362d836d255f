"""Corpus-preparation queries: deterministic sampling/splitting, quality
filtering, PII redaction, and context-window packing over ``documents``.

These are the dataset-curation steps of an LLM training-data pipeline,
each expressed as narrow Column arithmetic (no shuffle until the final
small aggregate) and each with an exact DuckDB oracle — sampling and
splitting use md5-derived hash buckets that both engines compute
bit-identically (see operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling as SP


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SEED = "s42"


def doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-hash train/val/test split (80/10/10) of the document corpus,
    summarized per split × source.

    The split is a narrow map (no shuffle) and depends only on
    (doc_id, seed) — stable under reruns, repartitioning, and corpus
    growth, the property that prevents train/test leakage across
    dataset versions. The only shuffle is the final small aggregate.
    """
    docs = SP.hash_split(
        _docs(spark, sf_dir), "doc_id", _SPLIT_WEIGHTS, seed=_SPLIT_SEED
    )
    return (
        docs.groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "source")
    )


DOC_SPLIT_COUNTS_SQL = f"""
SELECT split, source, count(*) AS n_docs, sum(n_chars) AS total_chars
FROM (
  SELECT {SP.split_sql("doc_id", _SPLIT_WEIGHTS, _SPLIT_SEED)} AS split, source, n_chars
  FROM documents
)
GROUP BY split, source
ORDER BY split, source
"""


# ---------------------------------------------------------------------------
# Stratified sampling (language rebalancing)
# ---------------------------------------------------------------------------

_STRAT_FRACTIONS = {"en": 0.5, "zh": 1.0, "de": 0.25}
_STRAT_DEFAULT = 0.1
_STRAT_SEED = "strat42"


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (keep 50% en, all zh,
    25% de, 10% of everything else) — the language-rebalancing step of a
    pretraining mix, as one narrow CASE-threshold filter per row.
    """
    kept = SP.stratified_hash_sample(
        _docs(spark, sf_dir),
        "doc_id",
        "lang",
        _STRAT_FRACTIONS,
        default_fraction=_STRAT_DEFAULT,
        seed=_STRAT_SEED,
    )
    return kept.select("doc_id", "lang", "source").orderBy("doc_id")


def _strat_thresh_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{name}' THEN {int(round(f * SP.N_BUCKETS))}"
        for name, f in _STRAT_FRACTIONS.items()
    )
    return f"CASE {cases} ELSE {int(round(_STRAT_DEFAULT * SP.N_BUCKETS))} END"


DOC_STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {SP.bucket_sql("doc_id", _STRAT_SEED)} < ({_strat_thresh_sql()})
ORDER BY doc_id
"""


QUERIES = {
    "doc_split_counts": doc_split_counts,
    "doc_stratified_sample": doc_stratified_sample,
}

ORACLES = {
    "doc_split_counts": DOC_SPLIT_COUNTS_SQL,
    "doc_stratified_sample": DOC_STRATIFIED_SAMPLE_SQL,
}
