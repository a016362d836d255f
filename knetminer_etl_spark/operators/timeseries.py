"""Time-series regularization: date spines, gap filling (LOCF / linear
interpolation), and time-weighted averages.

The hypertable-style operations an event pipeline needs before
resampling or feature extraction: turn an irregular event stream into a
regular per-key grid, carry observations forward across gaps, and
average values weighted by how long they were current rather than by
how often they were sampled.

No counterpart in the reference (its ETL is table-shaped, not
time-shaped); modeled on the TimescaleDB `time_bucket_gapfill` /
`locf` / `interpolate` / `time_weight` surface, re-expressed as Spark
Column arithmetic.

Scale shape (``gap_fill``): ONE sized exchange on the keys —
``HashPartitioning(keys)`` satisfies the (keys, bucket) grouping, the
per-key map assembly, and the LOCF/interp window alike, so all three
clustered operators share a single shuffle (asserted in
tests/test_timeseries.py), sized for group count per
``runtime.checkpoint.group_agg_partitions``. Per-key state
(`map<bucket, value>` + bounds) is bounded by the spine length, the
same bound the *output* must satisfy per key; spine explosion
(`sequence` + `explode_outer`) and fill are narrow.

A spine is per-key (each key's own [min, max] bucket range), which is
what dashboards and feature matrices want; keys with one observation
yield a single-cell spine. Empty-input keys cannot appear (no rows, no
bounds) — matching SQL `generate_series` oracle semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column, step_seconds: int) -> Column:
    """Floor ``ts`` to a ``step_seconds`` grid (timestamp-typed).

    Floor *division* (not ``%``, which truncates toward zero): pre-1970
    timestamps have negative epochs, where remainder-based flooring
    rounds up instead of down and diverges from SQL ``time_bucket`` /
    ``to_timestamp(floor(epoch / step) * step)`` oracles."""
    return F.timestamp_seconds(
        F.floor(ts.cast("long") / F.lit(step_seconds)).cast("long")
        * F.lit(step_seconds)
    )


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    agg: str | Column = "sum",
) -> DataFrame:
    """Regularize an event stream onto a per-key time grid and fill gaps.

    Aggregates ``value_col`` per (keys, bucket) with ``agg`` — either a
    function name (sum/avg/max/min/count) or a ready aggregate Column
    (e.g. ``F.round(F.sum("v"), 6)``, which pins the observation values
    against summation-order float drift before they feed the
    interpolation) — explodes each key's [min, max] bucket spine, and
    returns one row per (keys, bucket) with:

    * ``v`` — the aggregated observation, NULL on gap buckets;
    * ``v_locf`` — last observation carried forward;
    * ``v_interp`` — linear interpolation between the neighbouring
      observations (LOCF at the trailing edge, NULL before the first
      observation — TimescaleDB `interpolate` semantics).
    """
    from ..runtime.checkpoint import group_agg_partitions

    bucket = time_bucket(F.col(ts_col), step_seconds).alias("bucket")
    agg_col = getattr(F, agg)(value_col) if isinstance(agg, str) else agg
    # ONE sized exchange on the keys: HashPartitioning(keys) satisfies the
    # (keys, bucket) grouping, the per-key map assembly, AND the LOCF
    # window — three clustered operators over a single shuffle, sized for
    # group count (collect buffers are per-group objects; see
    # runtime.checkpoint.group_agg_partitions / SCALE.md)
    per_bucket = (
        df.repartition(group_agg_partitions(df), *keys)
        .groupBy(*keys, bucket)
        .agg(agg_col.alias("v"))
    )

    per_key = per_bucket.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("_m"),
        F.min("bucket").alias("_lo"),
        F.max("bucket").alias("_hi"),
    )
    step = F.expr(f"INTERVAL {step_seconds} SECONDS")
    spine = per_key.select(
        *keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("bucket"),
        F.col("_m"),
    ).select(*keys, "bucket", F.element_at("_m", F.col("bucket")).alias("v"))

    w = Window.partitionBy(*keys).orderBy("bucket")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_ts = F.when(F.col("v").isNotNull(), F.col("bucket").cast("long"))
    prev_v = F.last("v", ignorenulls=True).over(back)
    prev_t = F.last(obs_ts, ignorenulls=True).over(back)
    next_v = F.first("v", ignorenulls=True).over(fwd)
    next_t = F.first(obs_ts, ignorenulls=True).over(fwd)
    t = F.col("bucket").cast("long")

    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t),
        )
        .otherwise(prev_v)  # trailing edge: carry forward; leading: NULL
    )
    return spine.select(
        *keys,
        "bucket",
        "v",
        prev_v.alias("v_locf"),
        interp.alias("v_interp"),
    )


def time_weighted_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Duration-weighted mean of ``value_col`` per key group.

    Each observation is weighted by how long it stayed current (the
    interval to the next observation, last-observation-carried-forward
    semantics); the final observation of a key carries zero weight, as
    in TimescaleDB's `time_weight('locf', ...)` over a closed interval.
    Keys with a single observation (total weight 0) return NULL.

    One window pass (shuffle on keys) + one aggregate that reuses the
    window's partitioning — the `lead` is computed per key slice, never
    materializing a self-join.

    ``tiebreak_cols`` pins the order of equal timestamps (ties carry
    zero weight themselves, but which *neighbour* gets the non-zero
    interval depends on their order — pass a unique id for
    deterministic, oracle-reproducible results).
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak_cols)
    t = F.col(ts_col).cast("double")
    dt = F.lead(t).over(w) - t
    weighted = df.select(
        *keys, (F.col(value_col) * dt).alias("_wv"), dt.alias("_dt")
    )
    return weighted.groupBy(*keys).agg(
        (F.sum("_wv") / F.sum("_dt")).alias("twa"),
        F.sum("_dt").alias("span_seconds"),
    )


def rolling_zscore(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    n: int = 20,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key rolling z-score: each observation against the mean/stddev
    of its ``n`` PRECEDING observations (trailing window, the streaming
    anomaly-detection shape — the current value never contaminates its
    own baseline). Rows with fewer than 2 preceding observations or a
    zero-variance window get NULL ``z``.

    One window pass (single shuffle on keys; each reducer sorts only its
    key slice). The variance comes from explicit sum/sum-of-squares
    arithmetic — ``(Σv² − n·mean²)/(n−1)`` — evaluated in frame order,
    NOT from ``stddev_samp``: both engines then run the identical IEEE
    operation sequence, so results are bit-reproducible against a SQL
    oracle (`stddev_samp`'s internal update algorithm differs between
    engines).

    ``tiebreak_cols``: pass a unique id to pin equal-timestamp order.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, *tiebreak_cols)
        .rowsBetween(-n, -1)
    )
    v = F.col(value_col).cast("double")
    cnt = F.count(value_col).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    # when-guarded divisions: empty / single-element frames would raise
    # under ANSI mode (divide-by-zero), not yield NULL
    mean = F.when(cnt > 0, s1 / cnt)
    var = F.when(cnt >= 2, (s2 - cnt * mean * mean) / (cnt - 1))
    std = F.sqrt(var)
    z = F.when((cnt >= 2) & (std > 0), (v - mean) / std)
    return df.withColumns(
        {
            "roll_n": cnt.cast("int"),
            "roll_mean": mean,
            "roll_std": std,
            "z": z,
        }
    )


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key exponentially-weighted moving average, one output row per
    input row: ``y_0 = x_0``, ``y_i = α·x_i + (1−α)·y_{i−1}`` in
    (ts, tiebreaks) order — pandas ``ewm(alpha).mean()`` with
    ``adjust=False``.

    The recursion is what rules out plain window functions (no
    `lag(y)` of a column being defined); the closed form (a power-series
    sum) evaluates in a different float order and drifts from the
    recurrence. Shape: ONE shuffle on the keys — collect each key's
    series as a sorted array, run the recurrence as a sequential
    higher-order fold (exact float-op order, oracle-reproducible via a
    recursive CTE), posexplode back to rows. Per-key state is the series
    array — the same per-key bound the output itself must satisfy (the
    gap_fill contract; a key with a trillion events needs pre-bucketing
    regardless of engine).

    ``tiebreak_cols``: pass a unique id to pin equal-timestamp order.
    Output: keys + (ts_col, tiebreaks…, value_col, ewma).
    """
    from ..runtime.checkpoint import group_agg_partitions

    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    tb = list(tiebreak_cols)
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("_ts"),
                *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
                F.col(value_col).cast("double").alias("_x"),
            )
        )
    )
    per_key = (
        df.repartition(group_agg_partitions(df), *keys)
        .groupBy(*keys)
        .agg(ordered.alias("_s"))
    )
    # sequential fold producing the running series: acc is the array of
    # smoothed values; element i uses exactly a*x + (1-a)*y_prev
    fold = F.expr(
        "aggregate(_s, CAST(array() AS ARRAY<DOUBLE>), "
        f"(acc, e) -> CASE WHEN size(acc) = 0 THEN array(e._x) "
        f"ELSE concat(acc, array(CAST('{a!r}' AS DOUBLE) * e._x "
        f"+ CAST('{1.0 - a!r}' AS DOUBLE) * element_at(acc, -1))) END)"
    )
    exploded = per_key.select(
        *keys, F.posexplode(F.arrays_zip(F.col("_s"), fold.alias("_y")))
    ).select(
        *keys,
        F.col("col._s._ts").alias(ts_col),
        *[
            F.col(f"col._s._tb{i}").alias(c) for i, c in enumerate(tb)
        ],
        F.col("col._s._x").alias(value_col),
        # floor(y*1e6 + 0.5)/1e6, not round(): decimal HALF_UP vs float
        # rounding diverge on exact 6-dp ties (caught by the sf0.1 sweep)
        (F.floor(F.col("col._y") * 1e6 + F.lit(0.5)) / 1e6).alias("ewma"),
    )
    return exploded
