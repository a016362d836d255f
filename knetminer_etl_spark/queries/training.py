"""Training-data layout queries: deterministic sharding and
temperature-based mixture rebalancing over ``documents``.

Both are narrow-map assignments on the md5-derived key hash
(operators/sampling.py) that DuckDB reproduces bit-identically, so the
"global shuffle + shard" and "multilingual rebalance" steps of an LLM
data pipeline are oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import catalog as CAT

from ..operators import sampling as SP

_N_SHARDS = 16
_SHARD_SEED = "shard42"
_MIX_TARGET = 250
_MIX_ALPHA = 0.5
_MIX_SEED = "mix42"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CAT.read_parquet(spark, f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Shard manifest
# ---------------------------------------------------------------------------


def doc_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to one of 16 output shards plus a
    deterministic within-shard order key (a stable pseudo-random
    permutation — the training "global shuffle" without a global
    sort), then summarize each shard.

    Assignment is a narrow map; the only shuffle is the 16-row
    manifest aggregate. Writing the real layout is
    ``repartition(n, shard).sortWithinPartitions(order)`` — both
    partition-local. ``first_doc`` pins the permutation itself (not
    just shard sizes) under the oracle hash.
    """
    docs = SP.assign_shards(
        _docs(spark, sf_dir), "doc_id", _N_SHARDS, seed=_SHARD_SEED
    )
    ord_key = F.concat(
        F.lpad(F.col("shard_order").cast("string"), 7, "0"),
        F.lit(":"),
        F.col("doc_id").cast("string"),
    )
    return (
        docs.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min(ord_key).alias("first_doc"),
        )
        .orderBy("shard")
    )


def _shard_manifest_sql() -> str:
    shard = SP.bucket_sql("doc_id", _SHARD_SEED, _N_SHARDS)
    order = SP.bucket_sql("doc_id", f"{_SHARD_SEED}:order")
    return f"""
SELECT {shard} AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(lpad(CAST({order} AS VARCHAR), 7, '0') || ':'
           || CAST(doc_id AS VARCHAR)) AS first_doc
FROM documents
GROUP BY 1
ORDER BY shard
"""


DOC_SHARD_MANIFEST_SQL = _shard_manifest_sql()


# ---------------------------------------------------------------------------
# Temperature mixture
# ---------------------------------------------------------------------------


def doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 language rebalance toward 250 documents: each
    language's keep-rate targets ``250 * sqrt(n_l)/Σ sqrt(n)``
    (capped at 1) — the standard multilingual upweighting of
    low-resource sources — with per-document membership decided by the
    deterministic key hash.

    The fraction table is a tiny distributed aggregate broadcast back;
    documents never leave their partitions until the final per-language
    count.
    """
    docs = _docs(spark, sf_dir)
    kept = SP.temperature_sample(
        docs, "doc_id", "lang", _MIX_TARGET, _MIX_ALPHA, seed=_MIX_SEED
    )
    orig = docs.groupBy("lang").agg(F.count("*").alias("n_orig"))
    return (
        orig.join(
            kept.groupBy("lang").agg(F.count("*").alias("n_kept")),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_orig",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )


def _temperature_mix_sql() -> str:
    bucket = SP.bucket_sql("doc_id", _MIX_SEED)
    w = f"CAST(floor({SP._root_sql('CAST(n_orig AS DOUBLE)', _MIX_ALPHA)} * 1000000.0) AS BIGINT)"
    return f"""
WITH counts AS (
  SELECT lang, count(*) AS n_orig FROM documents GROUP BY lang
),
fr AS (
  SELECT lang, n_orig,
         least(1.0, {float(_MIX_TARGET)!r}
               * ({w}::DOUBLE / (sum({w}) OVER ())::DOUBLE)
               / CAST(n_orig AS DOUBLE)) AS keep_frac
  FROM counts
)
SELECT fr.lang, fr.n_orig,
       CAST(count(*) FILTER (WHERE {bucket} < floor(keep_frac * 1000000))
            AS BIGINT) AS n_kept
FROM documents d
JOIN fr ON d.lang = fr.lang
GROUP BY fr.lang, fr.n_orig
ORDER BY fr.lang
"""


DOC_TEMPERATURE_MIX_SQL = _temperature_mix_sql()


QUERIES = {
    "doc_shard_manifest": doc_shard_manifest,
    "doc_temperature_mix": doc_temperature_mix,
}

ORACLES = {
    "doc_shard_manifest": DOC_SHARD_MANIFEST_SQL,
    "doc_temperature_mix": DOC_TEMPERATURE_MIX_SQL,
}
