"""Context-window packing: place every document in the global token
stream and compute which fixed-size training windows it spans.

LLM pretraining concatenates the corpus into one token stream and chops
it into ``window_size``-token sequences; a document starting at global
offset *s* with *n* tokens lands in windows ``floor(s/w)`` through
``floor((s+n-1)/w)``. The hard part at scale is the **global exclusive
cumulative sum** of token counts in key order: the naive
``Window.orderBy(key)`` with no partitionBy collapses 100 TB into ONE
reducer.

This implements the standard two-phase scan instead:

1. ``repartitionByRange(key)`` so partitions hold disjoint ordered key
   ranges; pin the partitioning (``localCheckpoint``) because range
   boundaries come from sampling and must not be redrawn between the two
   passes;
2. per-partition totals (tiny: one row per partition) are collected,
   prefix-summed on the driver, and broadcast back as per-partition base
   offsets;
3. the per-row offset is base + a *partition-local* running sum — a
   window partitioned by partition id, so every reducer sorts only its
   own slice.

Cost: one range shuffle + one scan for totals + one broadcast join —
independent of corpus size per reducer. Deterministic in the key order
regardless of partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pack_pid"


def with_global_offsets(
    df: DataFrame,
    key_col: str,
    len_col: str,
    partitions: int | None = None,
    offset_col: str = "start_offset",
) -> DataFrame:
    """Add each row's exclusive cumulative sum of ``len_col`` in global
    ``key_col`` order, without a global single-reducer sort window."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        # pin the input projection first: the RangePartitioner's
        # sampling pass executes the child in full, so an expensive
        # projection under it (per-row tokenization) would be computed
        # twice — once to sample, once to shuffle. The pinned relation
        # is (key, len)-narrow for every current caller, so the extra
        # storage is bytes per row.
        df.localCheckpoint(eager=False)
        .repartitionByRange(n, F.col(key_col))
        .withColumn(_PID, F.spark_partition_id())
        # pin: range boundaries are sampled; the totals pass and the
        # final pass must see the identical partition assignment
        .localCheckpoint(eager=False)
    )
    totals = {
        r[_PID]: r["t"]
        for r in ranged.groupBy(_PID).agg(F.sum(len_col).alias("t")).collect()
    }
    bases, acc = [], 0
    for pid in sorted(totals):
        bases.append((pid, acc))
        acc += totals[pid] or 0
    base_df = df.sparkSession.createDataFrame(bases, f"{_PID} int, __pack_base long")
    w = (
        Window.partitionBy(_PID)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(len_col).over(w), F.lit(0))
    return (
        ranged.join(F.broadcast(base_df), _PID)
        .withColumn(offset_col, (F.col("__pack_base") + local).cast("long"))
        .drop(_PID, "__pack_base")
    )


def with_pack_windows(
    df: DataFrame,
    key_col: str,
    len_col: str,
    window_size: int,
    partitions: int | None = None,
) -> DataFrame:
    """Add ``start_offset``, ``first_window``, ``last_window``,
    ``n_windows`` for packing into ``window_size``-token sequences.
    Zero-length rows occupy no window (``n_windows = 0``, markers null).
    """
    if window_size <= 0:
        raise ValueError(f"window_size must be positive, got {window_size}")
    out = with_global_offsets(df, key_col, len_col, partitions)
    start = F.col("start_offset")
    n = F.col(len_col)
    first = F.floor(start / window_size)
    last = F.floor((start + n - 1) / window_size)
    has = n > 0
    return out.withColumns(
        {
            "first_window": F.when(has, first).cast("long"),
            "last_window": F.when(has, last).cast("long"),
            "n_windows": F.when(has, last - first + 1).otherwise(F.lit(0)).cast("long"),
        }
    )
