"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to cluster parallelism when the input arrived
    under-split (e.g. one small parquet file → one partition).

    CPU-heavy per-row operators (shingling, hashing, vector math) are
    otherwise serialized on a single core regardless of cluster size —
    small *bytes* do not mean small *compute*. At real scale inputs
    arrive well-split and this is a no-op; the round-robin shuffle on the
    small under-split input is cheap relative to the compute it unlocks.
    """
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
