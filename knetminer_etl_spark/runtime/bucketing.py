"""Bucketed-table helpers: co-located, shuffle-free joins.

For fact tables repeatedly joined on the same key (orders⋈lineitem on
orderkey, triples on id), bucketing pays the shuffle once at write time:
`bucketBy(n, key)` hash-partitions files so later equi-joins/aggs on the
key read co-located buckets and skip the exchange entirely (verify with
`.explain` — no `Exchange` above the scans, `SortMergeJoin` directly on
bucketed scans).

Bucketed tables must live in the session catalog (`saveAsTable`) — plain
`parquet(path)` writes don't carry bucket metadata. Choose bucket counts
≈ target parallelism and keep them EQUAL on both join sides (or an
integer ratio with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sort-merged-ready) catalog table."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*scols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the physical plan repartitions nothing (no hash/range
    shuffle exchange) — i.e. the join/agg runs on bucket-co-located (or
    broadcast) inputs. Introspection helper for tests/tuning."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return (
        "Exchange hashpartitioning" not in plan
        and "Exchange rangepartitioning" not in plan
    )
