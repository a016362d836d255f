"""As-of (most-recent-match) join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches to each left row the right row with
the greatest ``right.ts ≤ left.ts`` within the same ``by`` key (the
time-series "last known value" join; DuckDB/kdb ``ASOF JOIN``,
pandas ``merge_asof``).

Implementation is pure DataFrame ops — union the tagged sides, sort
within each key by (ts, side-order), and carry the latest right-side
values forward with a ``last(ignorenulls)`` running window; left rows
then project their carried values. One shuffle (window partition by
key), no UDF, no per-group pandas — scales to any key cardinality and
skew is bounded by per-key row counts.

Tolerance (max staleness) is a post-filter on the carried timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance_secs: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right[on] <= left[on]`` (same ``by`` keys), NULL when none.

    ``value_cols`` defaults to every right column except ``on``/``by``.
    Ties on ``right[on]`` resolve to the row last in (deterministic)
    sort order of the carried struct — dedupe the right side first if
    tie semantics matter.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    vals = value_cols or [c for c in right.columns if c not in {on, *by_cols}]

    carried = F.struct(
        F.col(on).alias("_r_ts"), *[F.col(c).alias(c) for c in vals]
    )
    r = right.select(
        *by_cols,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts before left at equal ts (<=)
        carried.alias("_rv"),
    )
    l = left.select(
        "*",
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("_last_rv", F.last("_rv", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1)
    if tolerance_secs is not None:
        out = out.withColumn(
            "_last_rv",
            F.when(
                F.col("_last_rv").isNotNull()
                & (
                    F.col("_ts").cast("long")
                    - F.col("_last_rv")["_r_ts"].cast("long")
                    <= tolerance_secs
                ),
                F.col("_last_rv"),
            ),
        )
    projections = [F.col(c) for c in left.columns]
    projections.append(F.col("_last_rv._r_ts").alias(f"{on}{suffix}"))
    projections += [F.col(f"_last_rv.{c}").alias(f"{c}{suffix}") for c in vals]
    return out.select(*projections)
