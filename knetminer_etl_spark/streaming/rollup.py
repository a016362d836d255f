"""Continuous aggregate (hypertable-rollup-style) maintained incrementally.

A streaming job keeps a day-level per-user rollup parquet up to date:
each micro-batch is partially aggregated, merged with the affected days'
existing rollup rows, and those day partitions are atomically overwritten
(`partitionOverwriteMode=dynamic`). Exactly-once comes from the pairing
of the streaming checkpoint (offsets) with idempotent partition
overwrites — replaying a batch rewrites the same partitions to the same
contents.

Scale notes: the merge touches only the partitions named in the incoming
batch (partition pruning on the read side, dynamic overwrite on the
write side); state lives in parquet, not executor memory, so rollup
cardinality is unbounded. This is the emulation of `MERGE INTO` for
environments without a lakehouse table format — swap `_merge_batch` for
a Delta/Iceberg MERGE when available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEYS = ["day", "user_id"]


def _batch_rollup(batch: DataFrame) -> DataFrame:
    return (
        batch.groupBy(
            F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def _merge_batch(spark: SparkSession, delta: DataFrame, rollup_path: str) -> None:
    # driver-held day list: bounded by DAYS TOUCHED PER MICRO-BATCH (a
    # near-real-time stream touches 1-2 days; even a month-long backfill
    # epoch is ~31 strings), not by stream or store size — the partition-
    # pruning filter below is why the merge reads only touched days
    days = [r["day"] for r in delta.select("day").distinct().collect()]
    if not days:
        return
    try:
        existing = spark.read.parquet(rollup_path).filter(F.col("day").isin(days))
    except Exception:  # first batch: no rollup yet
        existing = None
    merged = delta
    if existing is not None:
        merged = (
            delta.unionByName(existing)
            .groupBy(*ROLLUP_KEYS)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
    if existing is not None:
        # materialize before writing: the merged plan reads the same path
        # it is about to overwrite
        merged = merged.localCheckpoint(eager=True)
    (
        merged.repartition(1, "day")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(rollup_path)
    )


def start_rollup_stream(
    events_stream: DataFrame,
    rollup_path: str,
    checkpoint_path: str,
    query_name: str = "user_daily_rollup",
):
    """Start the incremental rollup; returns the StreamingQuery."""
    spark = events_stream.sparkSession

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        _merge_batch(spark, _batch_rollup(batch), rollup_path)

    return (
        events_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return spark.read.parquet(rollup_path).select(
        "user_id",
        # partition-value inference reads the day dir names back as dates
        F.col("day").cast("string").alias("day"),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )
