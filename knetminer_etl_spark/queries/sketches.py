"""Sketch queries: approximate distinct counts and frequencies with
EXACT oracles.

The sketches (operators/sketch.py) hash with the md5-derived 60-bit
integer both engines compute bit-identically, so the DuckDB twin
rebuilds the *same registers / counters* and the *same estimate* —
the driver hash-checks approximation algorithms exactly, not "within
tolerance". Each query also emits the exact answer next to the
estimate so the sketch error is visible (and bounded in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import catalog as CAT

from ..operators import sketch as SK
from ..operators.text import tokens

_P = 8  # 2^8 = 256 HLL registers (~6.5% rse)
_RHO_MAX = SK.HASH_BITS - _P + 1
_CMS_D, _CMS_W = 4, 1024
_HH_K = 20


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CAT.read_parquet(spark, f"{sf_dir}/events.parquet")


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, token): lowercased whitespace tokens — narrow explode."""
    return (
        CAT.read_parquet(spark, f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.explode(tokens(F.lower(F.col("text")))).alias("token"),
        )
    )


# SQL twin of the tokenizer (same equivalence corpus.py's token_counts
# oracle already pins: Spark split(\s+) == DuckDB string_split_regex).
_TOKS_SQL = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"
)


# ---------------------------------------------------------------------------
# HyperLogLog distinct users per event type
# ---------------------------------------------------------------------------


def events_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type (HLL, p=8) next to the
    exact count.

    The register table is the scale path: per group the shuffle carries
    ≤256 pre-merged rows regardless of corpus size, and the identical
    ``max``-merge makes it a valid streaming / partial-union state.
    The exact branch exists only as the comparison column.
    """
    ev = _events(spark, sf_dir).select("event_type", "user_id")
    est = SK.hll_distinct(ev, "user_id", ["event_type"], p=_P)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        exact.join(est, "event_type")
        .select("event_type", "n_exact", "hll_est", "n_zero_reg")
        .orderBy("event_type")
    )


def _hll_sql() -> str:
    idx, rho = SK.hll_idx_rho_sql("user_id", "hll", _P)
    est = SK.hll_estimate_sql(1 << _P, _RHO_MAX)
    return f"""
WITH base AS (SELECT event_type, user_id FROM events),
regs AS (
  SELECT event_type, {idx} AS reg_idx, max({rho}) AS reg_rho
  FROM base GROUP BY 1, 2
),
est AS (
  SELECT event_type,
         sum(1::BIGINT << ({_RHO_MAX} - reg_rho)) AS _z_present,
         count(*) AS _n_present
  FROM regs GROUP BY 1
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM base GROUP BY 1
)
SELECT exact.event_type, n_exact, {est} AS hll_est,
       CAST({1 << _P} - _n_present AS INT) AS n_zero_reg
FROM exact JOIN est USING (event_type)
ORDER BY event_type
"""


EVENTS_DISTINCT_HLL_SQL = _hll_sql()


# ---------------------------------------------------------------------------
# Exact corpus heavy hitters
# ---------------------------------------------------------------------------


def doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global top-20 tokens (count desc, token asc tie-break).

    One map-side-combined aggregation over the exploded tokens, then a
    TakeOrdered top-k — the frequency table shuffles pre-merged, the
    sort never goes global.
    """
    return SK.heavy_hitters(_doc_tokens(spark, sf_dir), "token", k=_HH_K)


DOC_HEAVY_HITTERS_SQL = f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest({_TOKS_SQL}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT {_HH_K}
"""


# ---------------------------------------------------------------------------
# Count-min estimates for the heavy hitters
# ---------------------------------------------------------------------------


def doc_token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min (4×1024) frequency estimates for the exact top-10
    tokens, next to their true counts.

    The sketch is ONE bounded shuffle (≤ d·w counter rows, map-side
    combined); probes re-hash and broadcast-join against it. CMS never
    undercounts, so ``cms_est >= n_exact`` always — pinned in pytest,
    while the oracle pins the exact counter values.
    """
    # tokenize + count ONCE, pin, and derive BOTH the exact top-10 and
    # the sketch from the (token, n) table: a CMS counter is the sum of
    # the counts of the tokens hashing into it, so sketching weighted
    # distinct tokens yields bit-identical counters to sketching every
    # occurrence — while hashing |vocab| rows instead of |corpus tokens|
    # and scanning the corpus once instead of twice
    counts = (
        _doc_tokens(spark, sf_dir)
        .groupBy(F.col("token").cast("string").alias("token"))
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    top = (
        counts.orderBy(F.desc("n"), F.asc("token"))
        .limit(10)
        .withColumnRenamed("n", "n_exact")
    )
    sketch = SK.cms_table(counts, "token", depth=_CMS_D, width=_CMS_W, weight_col="n")
    est = SK.cms_lookup(sketch, top.select("token"), "token", _CMS_D, _CMS_W)
    return (
        top.join(est, "token")
        .select("token", "n_exact", F.col("cms_est").cast("long").alias("cms_est"))
        .orderBy("token")
    )


def _cms_sql() -> str:
    bucket = (
        f"(('0x' || substr(md5('cms:' || j || ':' || token), 1, 15))::BIGINT"
        f" & {_CMS_W - 1})"
    )
    return f"""
WITH toks AS (
  SELECT unnest({_TOKS_SQL}) AS token FROM documents
),
top AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n_exact
  FROM toks GROUP BY token
  ORDER BY n_exact DESC, token ASC LIMIT 10
),
sketch AS (
  SELECT j, {bucket} AS bucket, CAST(count(*) AS BIGINT) AS c
  FROM toks, (VALUES (0), (1), (2), (3)) AS hashes(j)
  GROUP BY 1, 2
),
probe AS (
  SELECT token, j, {bucket} AS bucket
  FROM top, (VALUES (0), (1), (2), (3)) AS hashes(j)
)
SELECT top.token, n_exact,
       (SELECT min(coalesce(c, 0)) FROM probe
        LEFT JOIN sketch USING (j, bucket)
        WHERE probe.token = top.token) AS cms_est
FROM top
ORDER BY token
"""


DOC_TOKEN_CMS_SQL = _cms_sql()


QUERIES = {
    "events_distinct_hll": events_distinct_hll,
    "doc_heavy_hitters": doc_heavy_hitters,
    "doc_token_cms": doc_token_cms,
}

ORACLES = {
    "events_distinct_hll": EVENTS_DISTINCT_HLL_SQL,
    "doc_heavy_hitters": DOC_HEAVY_HITTERS_SQL,
    "doc_token_cms": DOC_TOKEN_CMS_SQL,
}


# ---------------------------------------------------------------------------
# Histogram quantile sketch over event values
# ---------------------------------------------------------------------------

_H_LO, _H_HI, _H_BINS = 0.0, 500.0, 64
_H_QS = (0.5, 0.9, 0.99)


def events_value_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated quantile estimates from the 64-bin histogram sketch
    next to the exact percentiles — the mergeable-state quantile
    (bounded sum-merge counters, like CMS) whose per-bin error the
    comparison column makes visible. The sketch is one bounded
    shuffle; the estimate is computed over the 64-row table
    driver-side (the broadcast-parameter shape)."""
    from ..operators import sketch as SK

    ev = _events(spark, sf_dir).select("value")
    bins = [
        (r["bin"], r["n"])
        for r in SK.histogram_counts(ev, "value", _H_LO, _H_HI, _H_BINS).collect()
    ]
    ests = [
        (float(q), SK.hist_quantile(bins, _H_LO, _H_HI, _H_BINS, q))
        for q in _H_QS
    ]
    est_df = spark.createDataFrame(ests, "q double, hist_est double")
    # tie-safe floor(x*1e6+0.5) rounding, not round(): interpolated
    # percentiles land on exact decimal ties where Spark's HALF_UP and
    # DuckDB's float rounding disagree (the q2/EWMA divergence class)
    exact = ev.agg(
        *[
            (
                F.floor(F.expr(f"percentile(value, {q!r})") * 1e6 + F.lit(0.5))
                / 1e6
            ).alias(f"_x{i}")
            for i, q in enumerate(_H_QS)
        ]
    )
    exploded = exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        F.col(f"_x{i}").alias("exact_value"),
                    )
                    for i, q in enumerate(_H_QS)
                ]
            )
        ).alias("e")
    ).select("e.q", "e.exact_value")
    return est_df.join(exploded, "q").orderBy("q")


def _hist_sql() -> str:
    width = (_H_HI - _H_LO) / _H_BINS
    bin_expr = (
        f"CAST(least({_H_BINS - 1}, greatest(0, "
        f"floor((value - {_H_LO!r}) * {_H_BINS} / {_H_HI - _H_LO!r}))) AS INT)"
    )
    qs = ", ".join(f"{float(q)!r}::DOUBLE" for q in _H_QS)
    return f"""
WITH b AS (
  SELECT {bin_expr} AS bin, count(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
c AS (
  SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum,
         sum(n) OVER () AS total
  FROM b
),
pick AS (
  SELECT q, bin, n, cum, total,
         row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
  FROM (SELECT unnest([{qs}]) AS q) qs
  JOIN c ON c.cum >= q * c.total
),
est AS (
  SELECT q,
         {_H_LO!r} + (bin + (q * total - (cum - n)) / n) * {width!r} AS hist_est
  FROM pick WHERE rn = 1
),
exact AS (
  SELECT unnest([{qs}]) AS q,
         unnest([{", ".join(f"floor(quantile_cont(value, {float(q)!r}) * 1000000.0 + 0.5) / 1000000.0" for q in _H_QS)}]) AS exact_value
  FROM events
)
SELECT est.q, hist_est, exact_value
FROM est JOIN exact USING (q)
ORDER BY q
"""


EVENTS_HIST_QUANTILES_SQL = _hist_sql()

QUERIES.update({"events_value_hist_quantiles": events_value_hist_quantiles})
ORACLES.update({"events_value_hist_quantiles": EVENTS_HIST_QUANTILES_SQL})


# ---------------------------------------------------------------------------
# HLL set algebra: pairwise Jaccard between event-type user sets
# ---------------------------------------------------------------------------


def events_hll_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated Jaccard similarity between every pair of event types'
    user populations via HLL register algebra (union = register
    max-merge, inclusion-exclusion on the three estimates) — set
    similarity matrices over populations without ever joining raw
    members (operators/sketch.hll_pairwise_jaccard)."""
    ev = _events(spark, sf_dir).select("event_type", "user_id")
    return SK.hll_pairwise_jaccard(ev, "user_id", "event_type", p=_P).orderBy(
        "set_a", "set_b"
    )


def _hll_jaccard_sql() -> str:
    idx, rho = SK.hll_idx_rho_sql("user_id", "hll", _P)
    est = SK.hll_estimate_sql(1 << _P, _RHO_MAX)
    return f"""
WITH base AS (SELECT event_type, user_id FROM events),
regs AS (
  SELECT event_type, {idx} AS reg_idx, max({rho}) AS reg_rho
  FROM base GROUP BY 1, 2
),
sets AS (SELECT DISTINCT event_type AS s FROM base),
pairs AS (
  SELECT a.s AS set_a, b.s AS set_b
  FROM sets a JOIN sets b ON a.s < b.s
),
merged AS (
  SELECT set_a, set_b, reg_idx, max(reg_rho) AS reg_rho FROM (
    SELECT p.set_a, p.set_b, r.reg_idx, r.reg_rho
    FROM pairs p JOIN regs r ON r.event_type = p.set_a
    UNION ALL
    SELECT p.set_a, p.set_b, r.reg_idx, r.reg_rho
    FROM pairs p JOIN regs r ON r.event_type = p.set_b
  ) GROUP BY 1, 2, 3
),
est_u AS (
  SELECT set_a, set_b,
         sum(1::BIGINT << ({_RHO_MAX} - reg_rho)) AS _z_present,
         count(*) AS _n_present
  FROM merged GROUP BY 1, 2
),
eu AS (SELECT set_a, set_b, {est} AS est_union FROM est_u),
est_s AS (
  SELECT event_type,
         sum(1::BIGINT << ({_RHO_MAX} - reg_rho)) AS _z_present,
         count(*) AS _n_present
  FROM regs GROUP BY 1
),
es AS (SELECT event_type, {est} AS est FROM est_s)
SELECT set_a, set_b, sa.est AS est_a, sb.est AS est_b, est_union,
       floor((sa.est + sb.est - est_union) / est_union * 1000000.0 + 0.5)
         / 1000000.0 AS jaccard_est
FROM eu
JOIN es sa ON sa.event_type = set_a
JOIN es sb ON sb.event_type = set_b
ORDER BY set_a, set_b
"""


EVENTS_HLL_JACCARD_SQL = _hll_jaccard_sql()

QUERIES.update({"events_hll_jaccard": events_hll_jaccard})
ORACLES.update({"events_hll_jaccard": EVENTS_HLL_JACCARD_SQL})
