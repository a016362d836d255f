"""As-of (most-recent-match) join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches to each left row the right row with
the greatest ``right.ts ≤ left.ts`` within the same ``by`` key (the
time-series "last known value" join; DuckDB/kdb ``ASOF JOIN``,
pandas ``merge_asof``), with ``direction`` covering the full pandas
surface: ``backward`` (default), ``forward`` (earliest right row at or
after), ``nearest`` (closer of the two; ties prefer backward).

Implementation is pure DataFrame ops — union the tagged sides, sort
within each key by (ts, side-order), and carry right-side values across
with a running ``last(ignorenulls)`` (backward) / ``first(ignorenulls)``
(forward) window; left rows then project their carried values. ONE
shuffle for any direction (the windows share the key partitioning;
``nearest`` adds a second partition-local sort, no extra exchange), no
UDF, no per-group pandas — scales to any key cardinality and skew is
bounded by per-key row counts.

Tolerance (max staleness / lookahead) is a post-filter on the carried
timestamp distance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance_secs: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the matched right row per
    ``direction`` (same ``by`` keys), NULL when none (or when the match
    is further than ``tolerance_secs``).

    ``value_cols`` defaults to every right column except ``on``/``by``.
    Ties on ``right[on]`` resolve to the row last (backward) / first
    (forward) in the deterministic carried-struct sort order — dedupe
    the right side first if tie semantics matter. ``nearest`` prefers
    the backward match on equal distance (pandas semantics).
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    vals = value_cols or [c for c in right.columns if c not in {on, *by_cols}]

    carried = F.struct(
        F.col(on).alias("_r_ts"), *[F.col(c).alias(c) for c in vals]
    )
    # two side orders: backward scans need right BEFORE left at equal ts
    # (so <= is inclusive), forward scans need right AFTER left.
    r = right.select(
        *by_cols,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_sb"),
        F.lit(1).alias("_sf"),
        F.lit(0).alias("_is_left"),
        carried.alias("_rv"),
    )
    l = left.select(
        "*",
        F.col(on).alias("_ts"),
        F.lit(1).alias("_sb"),
        F.lit(0).alias("_sf"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    part = Window.partitionBy(*by_cols)
    filled = unioned
    if direction in ("backward", "nearest"):
        wb = part.orderBy(F.col("_ts"), F.col("_sb")).rowsBetween(
            Window.unboundedPreceding, 0
        )
        filled = filled.withColumn(
            "_b_rv", F.last("_rv", ignorenulls=True).over(wb)
        )
    if direction in ("forward", "nearest"):
        wf = part.orderBy(F.col("_ts"), F.col("_sf")).rowsBetween(
            0, Window.unboundedFollowing
        )
        filled = filled.withColumn(
            "_f_rv", F.first("_rv", ignorenulls=True).over(wf)
        )

    if direction == "backward":
        picked: Column = F.col("_b_rv")
    elif direction == "forward":
        picked = F.col("_f_rv")
    else:
        b, f = F.col("_b_rv"), F.col("_f_rv")
        ts = F.col("_ts").cast("long")
        b_d = ts - b["_r_ts"].cast("long")
        f_d = f["_r_ts"].cast("long") - ts
        picked = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(b_d <= f_d, b)  # tie -> backward, pandas-style
            .otherwise(f)
        )

    out = filled.filter(F.col("_is_left") == 1).withColumn("_m_rv", picked)
    if tolerance_secs is not None:
        dist = F.abs(
            F.col("_ts").cast("long") - F.col("_m_rv")["_r_ts"].cast("long")
        )
        out = out.withColumn(
            "_m_rv",
            F.when(
                F.col("_m_rv").isNotNull() & (dist <= tolerance_secs),
                F.col("_m_rv"),
            ),
        )
    projections = [F.col(c) for c in left.columns]
    projections.append(F.col("_m_rv._r_ts").alias(f"{on}{suffix}"))
    projections += [F.col(f"_m_rv.{c}").alias(f"{c}{suffix}") for c in vals]
    return out.select(*projections)
