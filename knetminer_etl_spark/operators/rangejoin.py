"""Range (interval) join: points matched to containing intervals.

Spark compiles a plain ``l.ts BETWEEN r.start AND r.end`` join with no
equi-key to BroadcastNestedLoopJoin — O(|L|·|R|), hopeless at scale. The
standard fix is **interval bucketing**: quantize time into fixed-width
buckets, explode each interval into the buckets it overlaps, tag each
point with its bucket, equi-join on (keys…, bucket), then apply the
exact range predicate. The nested loop becomes a hash join whose cost is
|L| + Σ interval-spans/bucket_width, with the bucket width trading
replication factor against candidate precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | list[str] | None = None,
    bucket_secs: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= ts <= end``), optionally within ``by`` keys.

    ``how='inner'`` keeps matched points; ``'left'`` keeps unmatched
    points with NULL interval columns.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    p_bucket = F.floor(F.col(point_ts).cast("long") / bucket_secs)
    i_buckets = F.sequence(
        F.floor(F.col(start_col).cast("long") / bucket_secs),
        F.floor(F.col(end_col).cast("long") / bucket_secs),
    )
    p = points.withColumn("_bkt", p_bucket)
    i = intervals.withColumn("_bkt", F.explode(i_buckets))
    cond = (
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    joined = p.join(i, on=[*by_cols, "_bkt"], how="inner").filter(cond).drop("_bkt")
    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        unmatched = p.drop("_bkt").join(
            matched.select(*points.columns).dropDuplicates(points.columns),
            on=points.columns,
            how="left_anti",
        )
        for c in intervals.columns:
            if c not in points.columns:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(intervals.schema[c].dataType)
                )
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r} (inner|left)")
