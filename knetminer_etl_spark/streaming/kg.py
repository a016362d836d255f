"""Continuous knowledge-graph maintenance: a streaming source mapped to
triples and set-merged into a stored property-graph relation, micro-batch
by micro-batch.

This closes the loop between the product pipeline (tabmap → triples →
PG, the reference's batch flow) and Structured Streaming: the stored PG
is always the same relation a full batch rebuild over all data seen so
far would produce (``merge_pg`` is rebuild-equivalent by construction —
pg/build.py:324, pinned by the ``kg_pg_incremental`` oracle), so
downstream consumers (PG-JSONL export, the Neo4j loader) never see a
partially-aggregated graph.

Scale shape — the write cost tracks the DELTA, not the store: the PG is
stored hash-bucketed on id (``bucket = pmod(xxhash64(id), n_buckets)``
partition directories), each batch aggregates only its own triples
(delta-sized shuffle), reads back ONLY the bucket partitions its ids
hash into (partition pruning), set-merges, and dynamic-partition-
overwrites only those buckets (the streaming/rollup.py recipe). A
store of B buckets absorbing a delta touching t of them rewrites t/B
of its bytes; raise ``n_buckets`` with store size to keep per-bucket
bytes bounded (measured numbers in SCALE.md "Continuous KG").

Exactly-once: the streaming checkpoint records source offsets, and the
merge is idempotent — re-merging a replayed batch set-unions the same
labels/properties and ``greatest``-folds the same endpoints into the
same stored rows, so a replayed epoch overwrites its touched buckets
with identical content. A crash mid-commit (some bucket partitions
swapped, some not) is healed by the replay for the same reason. No
renames, no local-FS assumption: existence is probed through the Hadoop
FileSystem API and the overwrite goes through Spark's committer, so the
store may live on HDFS/S3 as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pg.build import merge_pg, triples_to_pg
from ..runtime.fs import fs_exists

PG_COLUMNS = ["id", "type", "labels", "from", "to", "properties"]

# default bucket count for the stored PG. Size so one bucket's rows fit
# a comfortable task (store_bytes / n_buckets ≲ a few hundred MB); the
# value is a layout constant of the store — changing it requires a
# rewrite, so pick for the target store size up front.
N_BUCKETS = 64


def _bucket_of(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("id")), F.lit(n_buckets)).alias("bucket")


def merge_triples_batch(
    spark: SparkSession,
    triples: DataFrame,
    pg_path: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Merge one batch of triples into the bucketed PG store at
    ``pg_path`` (parquet, partitioned by ``bucket``).

    Per batch: aggregate the delta (delta-sized), find which buckets its
    ids hash into (≤ ``n_buckets`` — bounded driver state, the
    rollup-day-list pattern), read ONLY those bucket partitions from the
    store, ``merge_pg``, and dynamic-partition-overwrite only the
    touched buckets. The merged relation is materialized
    (``localCheckpoint``) before the write because its plan reads the
    same partitions it is about to overwrite. Existence is PROBED
    through the Hadoop FileSystem (never inferred from a read failure —
    a transient FS error must propagate, not silently reset the store
    to the current delta), and probed on the FS Spark resolves the path
    to, so a scheme-less path on an HDFS-default cluster behaves the
    same as in local mode."""
    delta = (
        triples_to_pg(triples)
        .withColumn("bucket", _bucket_of(n_buckets))
        .localCheckpoint(eager=True)  # reused: bucket list + merge input
    )
    touched = sorted(
        r["bucket"] for r in delta.select("bucket").distinct().collect()
    )  # bounded by n_buckets
    if not touched:
        return
    if fs_exists(spark, pg_path):
        existing = (
            spark.read.parquet(pg_path)
            .filter(F.col("bucket").isin([int(b) for b in touched]))
            .select(*PG_COLUMNS)
        )
        merged = merge_pg(existing, delta.select(*PG_COLUMNS)).withColumn(
            "bucket", _bucket_of(n_buckets)
        )
        # materialize before writing: the plan reads the partitions it
        # is about to overwrite
        merged = merged.localCheckpoint(eager=True)
    else:  # first batch: nothing stored yet
        merged = delta
    (
        merged.repartition(len(touched), "bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(pg_path)
    )


def start_kg_stream(
    stream_df: DataFrame,
    mapper,
    pg_path: str,
    checkpoint_dir: str,
    n_buckets: int = N_BUCKETS,
):
    """Start the continuous KG build: ``mapper.to_triples`` over each
    micro-batch, set-merged into ``pg_path``. Returns the
    StreamingQuery (caller stops it / awaits termination)."""

    def _batch(batch: DataFrame, _epoch: int) -> None:
        merge_triples_batch(
            batch.sparkSession, mapper.to_triples(batch), pg_path, n_buckets
        )

    return (
        stream_df.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_kg(spark: SparkSession, pg_path: str) -> DataFrame:
    """The current stored PG relation (bucket layout column dropped)."""
    return spark.read.parquet(pg_path).select(*PG_COLUMNS)
