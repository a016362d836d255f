"""Structured-Streaming operators over event streams.

The reference has no Spark streaming surface (SURVEY.md §2.9) — its only
"streaming" is an asyncio JSONL→Neo4j batch loader. These operators are
the engine's streaming extension, designed so every aggregation has a
**batch twin** with identical semantics: the batch twin is what the
DuckDB oracle checks, and the streaming variant reuses the same column
expressions with ``readStream`` + watermarks.

Scale notes: watermarks bound state; tumbling windows shuffle once on
(window, key); `dropDuplicatesWithinWatermark` keeps the dedup state
windowed. For exactly-once file sinks use checkpointed ``writeStream``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: on-disk schema: parquet TIMESTAMP(NANOS). Spark 4.1+ reads it as
#: TIMESTAMP_NTZ (micro-truncated); ``_nanos_to_ts`` reinterprets the
#: NTZ wall-clock in the session timezone (pinned UTC). On ≤4.0 the
#: batch reader honoured ``spark.sql.legacy.parquet.nanosAsLong``
#: (int64 nanos) instead — both arrivals are normalized below.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _nanos_to_ts(df: DataFrame) -> DataFrame:
    """Normalize the on-disk ``ts`` to a session-tz TIMESTAMP.

    Parquet TIMESTAMP(NANOS) arrives differently per Spark version:
    ≤4.0 honours ``spark.sql.legacy.parquet.nanosAsLong`` (int64
    nanos — converted exactly with integer division; a double roundtrip
    would lose precision above 2^53 ns), 4.1+ ignores that conf and
    reads TIMESTAMP_NTZ. The NTZ wall-clock is reinterpreted in the
    session timezone (pinned UTC by the registry), which reproduces the
    epoch-nanos semantics bit-for-bit."""
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch events source with normalized timestamp column."""
    return _nanos_to_ts(spark.read.parquet(path))


# ---------------------------------------------------------------------------
# Batch twins (oracle-checkable)
# ---------------------------------------------------------------------------


def tumbling_agg(
    events: DataFrame,
    window_minutes: int = 5,
    key: str = "event_type",
) -> DataFrame:
    """Tumbling-window count/sum per key. Window start is emitted as epoch
    seconds (bigint) so batch, streaming, and SQL oracles agree exactly."""
    w = F.window("ts", f"{window_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            F.col(key),
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window_minutes: int = 10,
    slide_minutes: int = 5,
    key: str = "event_type",
) -> DataFrame:
    w = F.window("ts", f"{window_minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            F.col(key),
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key: str = "user_id",
) -> DataFrame:
    """Batch sessionization: lag + gap>threshold + running sum → session id.

    Output: one row per session ``(user, session_start epoch, n_events,
    duration_secs)``. Streaming twin: :func:`stream_session_agg` via
    ``session_window`` (same gap semantics: a session extends while
    consecutive events are < gap apart).
    """
    w = Window.partitionBy(key).orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = events.withColumn(
        "_new", F.when(gap.isNull() | (gap >= gap_minutes * 60), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "_sess", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(key, "_sess")
        .agg(
            F.min(F.col("ts").cast("long")).alias("session_start"),
            F.count("*").alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_secs"
            ),
        )
        .select(key, "session_start", "n_events", "duration_secs")
    )


def user_activity_rollup(events: DataFrame) -> DataFrame:
    """Per-user daily rollup with per-type pivot counts — the hypertable-
    style continuous-aggregate twin."""
    return (
        events.groupBy(
            F.col("user_id"), F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        )
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            "n_events",
            "sum_value",
            "n_click",
            "n_view",
            "n_error",
        )
    )


# ---------------------------------------------------------------------------
# Streaming variants
# ---------------------------------------------------------------------------


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source event stream (parquet file, dir, or glob).

    Point it at the events data specifically (a dir of event files or a
    glob like ``…/events*``; a bare file path fails — basePath must be a
    directory) —
    a directory containing OTHER tables' parquet files would be read with
    this schema and surface as null-keyed rows. In production swap for the
    Kafka source — every operator below is source-agnostic.
    """
    return _nanos_to_ts(
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_tumbling_agg(
    events: DataFrame,
    window_minutes: int = 5,
    key: str = "event_type",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of :func:`tumbling_agg`: watermarked, append-mode
    capable; late events beyond the watermark are dropped, state is
    evicted per watermark advance."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{window_minutes} minutes").alias("w"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            F.col(key),
            "n_events",
            "sum_value",
        )
    )


def stream_session_agg(
    events: DataFrame,
    gap_minutes: int = 30,
    key: str = "user_id",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming sessionization via ``session_window`` (state-backed,
    watermark-bounded)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), F.col(key)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.col(key),
            "n_events",
        )
    )


def stream_interval_join(
    clicks: DataFrame,
    errors: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Streaming twin of the batch range join (clicks matched to errors
    whose trailing ``window`` contains them): a **stream-stream join**
    with an event-time range condition. Both sides are watermarked;
    Spark derives each side's state retention from the time constraint,
    so join state is bounded and evicted as the watermark advances — the
    scale-correct shape for unbounded interval matching.

    ``how="left_outer"`` emits unmatched clicks too (NULL ``e_ts``) —
    outer results materialize only once the watermark proves no future
    match can arrive, the semantics that make streaming outer joins
    correct rather than racy. Output: (user_id, c_ts, e_ts).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    ).withWatermark("c_ts", watermark)
    r = errors.select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    ).withWatermark("e_ts", watermark)
    return c.join(
        r,
        F.expr(
            f"c_user = e_user AND c_ts >= e_ts - INTERVAL {window}"
            " AND c_ts <= e_ts"
        ),
        how,
    ).select(F.col("c_user").alias("user_id"), "c_ts", "e_ts")


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with watermark-bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_hll_registers(
    events: DataFrame,
    key_col: str = "user_id",
    window_minutes: int = 60,
    watermark: str = "30 minutes",
    p: int = 8,
    seed: str = "hll",
) -> DataFrame:
    """Streaming twin of :func:`..operators.sketch.hll_registers` over
    tumbling event-time windows: approximate distinct keys per window.

    The HLL register (max leading-zero rank per bucket) IS the streaming
    state — a plain ``max`` aggregate, so state is bounded at ``2^p``
    rows per open window whatever the key cardinality (a streaming
    ``countDistinct`` would hold every key). Emitted register tables
    max-merge across windows / restarts / backfills into the same
    estimates the batch operator produces (equivalence pinned in
    tests/test_streaming.py; collapse with
    :func:`..operators.sketch.hll_estimate`)."""
    from ..operators.sketch import hll_idx_rho

    idx, rho = hll_idx_rho(F.col(key_col), seed, p)
    return (
        events.withWatermark("ts", watermark)
        .select(F.col("ts"), idx.alias("reg_idx"), rho.alias("reg_rho"))
        .groupBy(
            F.window("ts", f"{window_minutes} minutes").alias("w"),
            F.col("reg_idx"),
        )
        .agg(F.max("reg_rho").alias("reg_rho"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "reg_idx",
            "reg_rho",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
) -> None:
    """Drive a bounded file-source stream to completion synchronously into
    an in-memory table (test/dev harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
