"""Similarity search over embedding columns.

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set against the corpus, dot products via higher-order functions
  (JVM-side, no UDF), rank with a window. The correctness baseline.
* :func:`lsh_topk` — sign-LSH bucketed approximate top-k: corpus and
  queries hashed into 2^n_planes buckets (multi-probe: a query also
  probes buckets at Hamming distance 1), exact scoring inside buckets
  only. The 100 TB path: scoring work drops by ~the bucket count, and
  the bucket join shuffles on bucket id instead of cross-joining.

Scores are computed in double precision with sequential fold order —
deterministic and oracle-reproducible; ties break by corpus id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import fan_out


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: ``(query_id, neighbor_id, cosine, rank)``; self-matches (same
    id) are excluded. The query side is broadcast — use for query sets
    that fit in memory (the usual case); otherwise use :func:`lsh_topk`.
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), _dvec(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _sign_bucket(vec: Column, n_planes: int) -> Column:
    """Deterministic sign-LSH bucket id from seeded pseudo-random planes."""
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    dim_idx,
                    lambda x, i: x
                    * (
                        (
                            F.pmod(F.xxhash64(i.cast("string"), F.lit(p)), F.lit(2001))
                            .cast("double")
                            - 1000.0
                        )
                        / 1000.0
                    ),
                ),
                F.lit(0.0).cast("double"),
                lambda acc, t: acc + t,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    return sum((b * (1 << p) for p, b in enumerate(bits)), F.lit(0))


def sign_bucket_md5(vec: Column, n_planes: int) -> Column:
    """Sign-LSH bucket with **md5-derived** plane coefficients — slower
    than the hash-fold or matmul variants but SQL-reproducible: DuckDB
    computes coef(i,p) = (('0x'||substr(md5(i||','||p),1,15))::BIGINT
    % 2001 - 1000)/1000.0 identically, so bucketed ANN results can be
    oracle-checked end to end."""
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    dim_idx,
                    lambda x, i: x
                    * (
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            i.cast("string"), F.lit(f",{p}")
                                        )
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % 2001
                        ).cast("double")
                        - 1000.0
                    )
                    / 1000.0,
                ),
                F.lit(0.0).cast("double"),
                lambda acc, t: acc + t,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(n_planes)
    ]
    return sum((b * (1 << p) for p, b in enumerate(bits)), F.lit(0))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    n_planes: int = 6,
    multiprobe: bool = True,
    bucket_fn=None,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within LSH buckets.

    Queries probe their own bucket plus (``multiprobe``) every bucket at
    Hamming distance 1 — recall rises steeply for ~n_planes× extra probes
    while still scoring a tiny corpus fraction. Queries with fewer than k
    in-bucket neighbors simply return fewer rows (standard ANN contract).
    ``bucket_fn(vec_col, n_planes) -> Column`` overrides the bucketing
    (default: seeded hash-fold planes; :func:`sign_bucket_md5` for an
    oracle-reproducible variant). Recall vs the exact baseline is
    asserted in tests/test_similarity.py.
    """
    bucketer = bucket_fn or _sign_bucket
    qid = query_id_col or id_col
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("_cv")
    )
    c = c.withColumn("_cn", _norm(F.col("_cv"))).withColumn(
        "_bkt", bucketer(F.col("_cv"), n_planes)
    )
    q = queries.select(
        F.col(qid).alias("query_id"), _dvec(F.col(vec_col)).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv"))).withColumn(
        "_qbkt", bucketer(F.col("_qv"), n_planes)
    )
    if multiprobe:
        probes = F.array(
            F.col("_qbkt"),
            *[
                F.col("_qbkt").bitwiseXOR(F.lit(1 << p))
                for p in range(n_planes)
            ],
        )
        q = q.select(
            "query_id", "_qv", "_qn", F.explode(probes).alias("_bkt")
        )
    else:
        q = q.withColumnRenamed("_qbkt", "_bkt")

    scored = (
        c.join(q, on="_bkt")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
