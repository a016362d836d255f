"""Scalar quantization (int8-style) for embedding columns.

Compresses an ``array<float>`` embedding to per-dimension integer codes
— the standard memory/IO trade for vector search at scale (FAISS
``SQ8``): 4× smaller than float32, distances computed on dequantized
values with bounded error.

Shape: training is ONE tiny aggregate (per-dimension min/max collected
to the driver — 2×dim doubles, the same driver-held-parameter shape as
the k-means centroids); encode/decode are **narrow maps** with the
min/scale vectors inlined as literals — no join, no shuffle, 100 TB
encodes at scan speed. Everything is deterministic double arithmetic
(`floor(x + 0.5)` rounding, not engine-specific `round`), so a SQL
oracle reproduces codes and reconstructed distances bit-for-bit.

No counterpart in the reference; north-star similarity-search
extension alongside :mod:`.similarity`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _dvec


_WIDE_AGG_MAX_DIM = 256


def sq_train(
    corpus: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxes) over the corpus — the quantizer
    parameters (2×dim doubles held on the driver, like k-means
    centroids).

    Two plans by dimensionality: up to ``_WIDE_AGG_MAX_DIM`` dims, ONE
    wide aggregate (2×dim agg expressions, no shuffle rows beyond the
    partial states); above that, posexplode + groupBy(dimension index) —
    thousands of agg expressions would blow up driver-side analysis, while
    the exploded aggregate's map-side partials keep the shuffle at dim
    rows per partition whatever the corpus size."""
    head = corpus.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if head is None:
        raise ValueError("sq_train: empty corpus (no non-NULL vectors)")
    dim = len(head[0])
    v = corpus.filter(F.col(vec_col).isNotNull()).select(
        _dvec(F.col(vec_col)).alias("_v")
    )
    if dim <= _WIDE_AGG_MAX_DIM:
        row = v.agg(
            *[F.min(F.col("_v")[i]).alias(f"mn{i}") for i in range(dim)],
            *[F.max(F.col("_v")[i]).alias(f"mx{i}") for i in range(dim)],
        ).first()
        mins = [row[f"mn{i}"] for i in range(dim)]
        maxes = [row[f"mx{i}"] for i in range(dim)]
        return mins, maxes
    # high-dim path: one narrow explode + a dim-keyed aggregate
    stats = (
        v.select(F.posexplode("_v").alias("_i", "_x"))
        .groupBy("_i")
        .agg(F.min("_x").alias("mn"), F.max("_x").alias("mx"))
        .collect()
    )
    mins = [0.0] * dim
    maxes = [0.0] * dim
    for r in stats:
        mins[r["_i"]] = r["mn"]
        maxes[r["_i"]] = r["mx"]
    return mins, maxes


def _scales(mins: list[float], maxes: list[float], levels: int) -> list[float]:
    return [(mx - mn) / (levels - 1) for mn, mx in zip(mins, maxes)]


def sq_encode(
    vec: Column, mins: list[float], maxes: list[float], bits: int = 8
) -> Column:
    """array<int> codes in [0, 2^bits-1]: ``floor((x-min)/scale + 0.5)``,
    clamped. A zero-width dimension encodes as 0."""
    levels = 1 << bits
    scales = _scales(mins, maxes, levels)
    dim_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    mn = F.array(*[F.lit(float(m)) for m in mins])
    sc = F.array(*[F.lit(float(s)) for s in scales])
    return F.zip_with(
        _dvec(vec),
        dim_idx,
        lambda x, i: F.when(F.element_at(sc, i + 1) == 0.0, F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (x - F.element_at(mn, i + 1)) / F.element_at(sc, i + 1)
                        + F.lit(0.5)
                    ),
                    F.lit(0),
                ),
                F.lit(levels - 1),
            ).cast("int")
        ),
    )


def sq_decode(
    codes: Column, mins: list[float], maxes: list[float], bits: int = 8
) -> Column:
    """array<double> reconstruction: ``min + code*scale`` per dimension."""
    levels = 1 << bits
    scales = _scales(mins, maxes, levels)
    dim_idx = F.sequence(F.lit(0), F.size(codes) - 1)
    mn = F.array(*[F.lit(float(m)) for m in mins])
    sc = F.array(*[F.lit(float(s)) for s in scales])
    return F.zip_with(
        codes,
        dim_idx,
        lambda c, i: F.element_at(mn, i + 1)
        + c.cast("double") * F.element_at(sc, i + 1),
    )


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact-cosine top-k against the **quantized** corpus (queries stay
    full-precision — the asymmetric-distance setup ANN systems use).

    Same output contract as :func:`.similarity.cosine_topk`; the scores
    differ from the exact baseline only by the reconstruction error,
    which tests bound against the exact result."""
    from .similarity import cosine_topk

    mins, maxes = sq_train(corpus, vec_col)
    recon = corpus.withColumn(
        vec_col, sq_decode(sq_encode(F.col(vec_col), mins, maxes, bits), mins, maxes, bits)
    )
    return cosine_topk(recon, queries, k, id_col, vec_col, query_id_col)
