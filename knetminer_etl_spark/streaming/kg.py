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

Exactly-once: the streaming checkpoint records source offsets, and the
merge is idempotent — re-merging a replayed batch set-unions the same
labels/properties and ``greatest``-folds the same endpoints into the
same stored rows.

Scale shape: each batch aggregates ONLY its own triples (delta-sized
shuffle) and joins the stored PG once. At 100 TB, store the PG bucketed
by id hash and swap the full-file rewrite for dynamic partition
overwrite of the delta-touched buckets (the streaming/rollup.py
pattern) or a lakehouse MERGE — the merge logic is unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..pg.build import merge_pg, triples_to_pg


def _resolve_store(pg_path: str) -> str | None:
    """The directory holding the current PG store, or None on the very
    first batch. Existence is PROBED, never inferred from a read
    failure — a transient read error (FS hiccup, corrupt footer,
    permissions) must propagate, not silently reset the accumulated
    store to the current delta. ``._old`` covers the crash window of
    :func:`merge_triples_batch`'s swap (new store staged, old renamed
    away, final rename not yet done)."""
    if os.path.exists(pg_path):
        return pg_path
    old = pg_path.rstrip("/") + "._old"
    if os.path.exists(old):
        return old
    return None


def merge_triples_batch(
    spark: SparkSession, triples: DataFrame, pg_path: str
) -> None:
    """Merge one batch of triples into the PG relation stored at
    ``pg_path`` (parquet).

    The merged result is staged to a sibling ``._tmp`` directory and
    swapped in with two renames (current → ``._old``, staged → current)
    so a write that dies mid-batch never leaves a half-written store:
    every crash point leaves a complete store at ``pg_path`` or at
    ``._old`` (which :func:`_resolve_store` recovers on the next
    batch). Local-FS renames; on an object store or HDFS swap this for
    the FileSystem rename API or a lakehouse MERGE (see module
    docstring — the merge logic is unchanged)."""
    delta = triples_to_pg(triples)
    existing_path = _resolve_store(pg_path)
    if existing_path is None:  # first batch: nothing stored yet
        merged = delta
    else:
        existing = spark.read.parquet(existing_path)
        merged = merge_pg(existing, delta)
    tmp = pg_path.rstrip("/") + "._tmp"
    old = pg_path.rstrip("/") + "._old"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)  # reads old, writes new dir
    # swap ordering invariant: a COMPLETE durable store exists at every
    # crash point — ``._old`` is only removed after the new store holds
    # the canonical path (a crash in between re-merges the replayed
    # batch idempotently on recovery)
    if os.path.exists(pg_path):
        shutil.rmtree(old, ignore_errors=True)
        os.rename(pg_path, old)
    os.rename(tmp, pg_path)
    shutil.rmtree(old, ignore_errors=True)


def start_kg_stream(
    stream_df: DataFrame,
    mapper,
    pg_path: str,
    checkpoint_dir: str,
):
    """Start the continuous KG build: ``mapper.to_triples`` over each
    micro-batch, set-merged into ``pg_path``. Returns the
    StreamingQuery (caller stops it / awaits termination)."""

    def _batch(batch: DataFrame, _epoch: int) -> None:
        merge_triples_batch(batch.sparkSession, mapper.to_triples(batch), pg_path)

    return (
        stream_df.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_kg(spark: SparkSession, pg_path: str) -> DataFrame:
    """The current stored PG relation."""
    return spark.read.parquet(pg_path)
