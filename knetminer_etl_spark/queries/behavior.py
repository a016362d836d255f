"""Behavioral / time-series queries over ``events``: gap-filled daily
series, time-weighted averages, ordered funnels, retention cohorts.

All timestamps are emitted as BIGINT epoch seconds (the registry
convention — both engines stringify them identically), and double
aggregates are rounded so partial-aggregation summation order cannot
flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import funnel as FN
from ..operators import timeseries as TS
from ..streaming import events as EV


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EV.load_events(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# Gap-filled daily purchase series (LOCF + linear interpolation)
# ---------------------------------------------------------------------------


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase value per user on each user's own [first, last]
    day spine — gap days carry NULL observations, filled by LOCF and by
    linear interpolation (`operators.timeseries.gap_fill`)."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    # bucket sums rounded to 6 dp BEFORE interpolation: partial-agg
    # summation order differs between engines. From there the interp
    # arithmetic is bit-identical IEEE ops on identical inputs in both
    # engines, so the outputs are emitted UNROUNDED — a final round()
    # would reintroduce divergence exactly on the decimal ties the
    # 6 dp inputs make common (Spark HALF_UP vs DuckDB float rounding
    # disagree on e.g. 5.21625 → .2163 / .2162). The 6 dp rounding
    # itself uses the tie-safe floor(x*1e6+0.5) form both engines
    # compute with the same IEEE ops (see the q2/EWMA divergence class).
    out = TS.gap_fill(
        ev,
        ["user_id"],
        "ts",
        "value",
        86_400,
        agg=F.floor(F.sum("value") * 1e6 + F.lit(0.5)) / 1e6,
    )
    return out.select(
        "user_id",
        F.col("bucket").cast("long").alias("bucket_s"),
        "v",
        "v_locf",
        "v_interp",
    ).orderBy("user_id", "bucket_s")


EVENTS_GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 * 86400 AS b,
         floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS v
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, 86400)) AS b FROM bounds
),
j AS (
  SELECT s.user_id, s.b, d.v
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.b = d.b
),
f AS (
  SELECT user_id, b, v,
    last_value(v IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
    last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(v IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY b
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY b
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM j
)
SELECT user_id, b AS bucket_s,
       v,
       locf AS v_locf,
       CASE WHEN v IS NOT NULL THEN v
            WHEN locf IS NOT NULL AND nv IS NOT NULL
                 THEN locf + (nv - locf) * (b - pt) / (nt - pt)
            ELSE locf END AS v_interp
FROM f
ORDER BY user_id, bucket_s
"""


# ---------------------------------------------------------------------------
# Time-weighted average value per (user, event_type)
# ---------------------------------------------------------------------------


def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean of `value` per user × event type (LOCF
    weighting: each observation counts for the interval it was
    current). Groups with a single observation have zero total weight
    and yield NULL."""
    out = TS.time_weighted_avg(
        _events(spark, sf_dir),
        ["user_id", "event_type"],
        "ts",
        "value",
        tiebreak_cols=["event_id"],
    )
    # explicit floor(x*1e4 + 0.5)/1e4 instead of round(): both engines run
    # the IDENTICAL double arithmetic, so decimal-tie handling cannot
    # diverge (Spark round is decimal HALF_UP, DuckDB rounds the float) —
    # the hash-fragility flagged for this query in round-2 advice
    def _r4(c):
        return F.floor(F.col(c) * 1e4 + F.lit(0.5)) / 1e4

    return out.select(
        "user_id",
        "event_type",
        _r4("twa").alias("twa"),
        _r4("span_seconds").alias("span_seconds"),
    ).orderBy("user_id", "event_type")


EVENTS_TWA_SQL = """
WITH d AS (
  SELECT user_id, event_type, value,
         lead(epoch(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) - epoch(ts) AS dt
  FROM events
)
SELECT user_id, event_type,
       floor(sum(value * dt) / sum(dt) * 1e4 + 0.5) / 1e4 AS twa,
       floor(sum(dt) * 1e4 + 0.5) / 1e4 AS span_seconds
FROM d
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# Ordered funnel: signup → view → click → purchase
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users reaching each stage of the strictly-ordered funnel
    (`t_{k+1} = min{ts : type = stage_{k+1}, ts > t_k}`), computed as a
    per-user sorted-array fold (`operators.funnel`); the oracle
    replicates the cascade with nested min-joins."""
    return FN.funnel_counts(
        _events(spark, sf_dir), "user_id", "ts", "event_type", _FUNNEL_STAGES
    )


EVENTS_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
  WHERE e.event_type = 'view' GROUP BY 1
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
  WHERE e.event_type = 'click' GROUP BY 1
),
t4 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN t3 ON e.user_id = t3.user_id AND e.ts > t3.t
  WHERE e.event_type = 'purchase' GROUP BY 1
),
counts(stage_idx, stage, n_users) AS (
  SELECT 1, 'signup', (SELECT count(*) FROM t1)
  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM t2)
  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM t3)
  UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM t4)
)
SELECT stage_idx, stage, n_users FROM counts
WHERE n_users > 0
ORDER BY stage_idx
"""


# ---------------------------------------------------------------------------
# Retention cohorts (daily)
# ---------------------------------------------------------------------------


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users grouped by first-activity day, counted
    per day-offset they returned on (distinct active days per user)."""
    out = FN.retention_cohorts(_events(spark, sf_dir), "user_id", "ts", 86_400)
    return out.select(
        F.col("cohort").cast("long").alias("cohort_s"),
        "period_offset",
        "n_users",
    ).orderBy("cohort_s", "period_offset")


EVENTS_RETENTION_SQL = """
WITH p AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS p
  FROM events
),
u AS (
  SELECT user_id, p, min(p) OVER (PARTITION BY user_id) AS cp FROM p
)
SELECT cp * 86400 AS cohort_s, p - cp AS period_offset, count(*) AS n_users
FROM u
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Rolling z-score anomalies
# ---------------------------------------------------------------------------

_Z_WIN = 20


def events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates more than 2σ from the rolling mean of
    the user's previous 20 observations (trailing window — the streaming
    anomaly shape, operators/timeseries.py:rolling_zscore). The explicit
    sum/sum-of-squares variance makes z bit-reproducible in SQL; rounded
    at 6dp with engine-identical floor arithmetic."""
    out = TS.rolling_zscore(
        _events(spark, sf_dir),
        ["user_id"],
        "ts",
        "value",
        n=_Z_WIN,
        tiebreak_cols=["event_id"],
    ).filter(F.abs(F.col("z")) > 2)
    return out.select(
        "user_id",
        "event_id",
        (F.floor(F.col("z") * 1e6 + F.lit(0.5)) / 1e6).alias("z"),
    ).orderBy("user_id", "event_id")


EVENTS_ANOMALIES_SQL = f"""
WITH w AS (
  SELECT user_id, event_id, value,
         count(value) OVER win AS cnt,
         sum(value) OVER win AS s1,
         sum(value * value) OVER win AS s2
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {_Z_WIN} PRECEDING AND 1 PRECEDING)
), st AS (
  SELECT user_id, event_id, value, cnt, s1 / cnt AS mean,
         (s2 - cnt * (s1 / cnt) * (s1 / cnt)) / (cnt - 1) AS var
  FROM w
), z AS (
  SELECT user_id, event_id, (value - mean) / sqrt(var) AS z
  FROM st WHERE cnt >= 2 AND var > 0
)
SELECT user_id, event_id, floor(z * 1e6 + 0.5) / 1e6 AS z
FROM z WHERE abs(z) > 2
ORDER BY user_id, event_id
"""


QUERIES = {
    "events_gap_fill": events_gap_fill,
    "events_time_weighted_avg": events_time_weighted_avg,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "events_anomalies": events_anomalies,
}

ORACLES = {
    "events_gap_fill": EVENTS_GAP_FILL_SQL,
    "events_time_weighted_avg": EVENTS_TWA_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_retention": EVENTS_RETENTION_SQL,
    "events_anomalies": EVENTS_ANOMALIES_SQL,
}


# ---------------------------------------------------------------------------
# Snapshot diff (incremental-build audit)
# ---------------------------------------------------------------------------


def events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two versions of the per-user activity table (events through
    Jan 15 vs through Jan 22): which users appeared, which changed,
    which sat still — operators/cdc.py:snapshot_diff, one full-outer
    key join with null-safe column comparison. Compared columns are
    exact integers (event count + max event id), immune to
    float-summation ordering."""
    from ..operators.cdc import snapshot_diff

    ev = _events(spark, sf_dir)

    def snap(cutoff: str) -> DataFrame:
        return (
            ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.max("event_id").alias("last_event_id"),
            )
        )

    return snapshot_diff(
        snap("2024-01-15"), snap("2024-01-22"), ["user_id"]
    ).orderBy("user_id")


EVENTS_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT user_id, count(*) AS n_events, max(event_id) AS last_event_id
  FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id
),
new AS (
  SELECT user_id, count(*) AS n_events, max(event_id) AS last_event_id
  FROM events WHERE ts < TIMESTAMP '2024-01-22 00:00:00' GROUP BY user_id
)
SELECT coalesce(old.user_id, new.user_id) AS user_id,
       CASE WHEN old.user_id IS NULL THEN 'added'
            WHEN new.user_id IS NULL THEN 'removed'
            WHEN old.n_events IS NOT DISTINCT FROM new.n_events
             AND old.last_event_id IS NOT DISTINCT FROM new.last_event_id
            THEN 'unchanged'
            ELSE 'changed' END AS change
FROM old FULL OUTER JOIN new ON old.user_id = new.user_id
ORDER BY user_id
"""

QUERIES.update({"events_snapshot_diff": events_snapshot_diff})
ORACLES.update({"events_snapshot_diff": EVENTS_SNAPSHOT_DIFF_SQL})


# ---------------------------------------------------------------------------
# Nearest-match as-of join
# ---------------------------------------------------------------------------


def events_asof_nearest_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the error closest in time for the same user
    within ±10 minutes (operators/asof.py, direction='nearest' — the
    full pandas merge_asof surface; one exchange, ties prefer the
    earlier/backward error). Oracle = a per-click LATERAL top-1 by
    absolute distance with the same tie order."""
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    return (
        asof_join(
            clicks,
            errors,
            on="ts",
            by="user_id",
            direction="nearest",
            tolerance_secs=600,
        )
        .select("event_id", "user_id", "ts_right", F.col("value_right"))
        .orderBy("event_id")
    )


EVENTS_ASOF_NEAREST_SQL = """
WITH c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
e AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'error'
)
SELECT c.event_id, c.user_id, x.r_ts AS ts_right, x.v AS value_right
FROM c LEFT JOIN LATERAL (
  SELECT e.ts AS r_ts, e.value AS v
  FROM e
  WHERE e.user_id = c.user_id
    AND abs(epoch(e.ts) - epoch(c.ts)) <= 600
  ORDER BY abs(epoch(e.ts) - epoch(c.ts)), e.ts
  LIMIT 1
) x ON TRUE
ORDER BY event_id
"""

QUERIES.update({"events_asof_nearest_error": events_asof_nearest_error})
ORACLES.update({"events_asof_nearest_error": EVENTS_ASOF_NEAREST_SQL})


# ---------------------------------------------------------------------------
# Per-user EWMA (recursive smoothing)
# ---------------------------------------------------------------------------


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of purchase
    values (α=0.3, event_id tie-break) — the recursive smoothing a
    window function cannot express (operators/timeseries.ewma); the
    oracle replays the identical recurrence via a recursive CTE."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return TS.ewma(
        ev, ["user_id"], "ts", "value", alpha=0.3, tiebreak_cols=["event_id"]
    ).orderBy("user_id", "ts", "event_id")


EVENTS_EWMA_SQL = """
WITH RECURSIVE erows AS (
  SELECT user_id, ts, event_id, value::DOUBLE AS value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
),
walk(user_id, rn, y) AS (
  SELECT user_id, rn, value FROM erows WHERE rn = 1
  UNION ALL
  SELECT r.user_id, r.rn,
         CAST('0.3' AS DOUBLE) * r.value + CAST('0.7' AS DOUBLE) * w.y
  FROM walk w JOIN erows r ON r.user_id = w.user_id AND r.rn = w.rn + 1
)
SELECT r.user_id, r.ts, r.event_id, r.value,
       floor(w.y * 1000000.0 + 0.5) / 1000000.0 AS ewma
FROM erows r JOIN walk w USING (user_id, rn)
ORDER BY user_id, ts, event_id
"""

QUERIES.update({"events_ewma": events_ewma})
ORACLES.update({"events_ewma": EVENTS_EWMA_SQL})


# ---------------------------------------------------------------------------
# Weighted median per user (grouped-agg pandas UDF, oracle-checked)
# ---------------------------------------------------------------------------


def events_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lower weighted median of purchase values under
    deterministic pseudo-weights (event_id % 5 + 1) — oracle coverage
    for the GROUPED_AGG pandas-UDF surface (functions/udafs.py): the
    Python aggregation must agree with a pure-SQL cumulative-weight
    formulation. The median is an exact data value, so the comparison
    is float-rounding-free."""
    from ..functions.udafs import weighted_median

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("value").alias("v"),
            ((F.col("event_id") % 5) + 1).cast("double").alias("wt"),
        )
    )
    return (
        ev.groupBy("user_id")
        .agg(weighted_median(F.col("v"), F.col("wt")).alias("wmedian"))
        .orderBy("user_id")
    )


EVENTS_WEIGHTED_MEDIAN_SQL = """
WITH w AS (
  SELECT user_id, value AS v, CAST(event_id % 5 + 1 AS DOUBLE) AS wt
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, v,
         sum(wt) OVER (PARTITION BY user_id ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum,
         sum(wt) OVER (PARTITION BY user_id) AS tot
  FROM w
)
SELECT user_id, min(v) AS wmedian
FROM c WHERE cum >= tot / 2.0
GROUP BY user_id
ORDER BY user_id
"""

QUERIES.update({"events_weighted_median": events_weighted_median})
ORACLES.update({"events_weighted_median": EVENTS_WEIGHTED_MEDIAN_SQL})
