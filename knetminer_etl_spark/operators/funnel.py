"""Behavioral event-sequence analytics: funnels and retention cohorts.

The two standard product-analytics reductions over an event stream.
Both are single-shuffle per-user folds: events group once on the user
key and everything sequential happens inside a per-user sorted array
with higher-order Column functions — no window self-joins, no Python,
no MATCH_RECOGNIZE engine needed.

Scale: per-user state is that user's (stage-relevant) event list —
the same bound any per-user sessionization carries. The funnel filter
keeps only the stage event types before the shuffle, so the exchange
moves the funnel-relevant slice, not the whole stream. No counterpart
in the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered-funnel depth per user.

    A user reaches stage *k+1* at the earliest event of type
    ``stages[k]`` *strictly after* the time they reached stage *k*
    (`t_{k+1} = min{ts : type = stages[k], ts > t_k}` — the greedy
    time-ordered fold computes exactly that cascade, which is what the
    SQL oracle replicates with k nested joins).

    Returns one row per user with ``deepest`` (0..len(stages)) and
    ``reached_ts`` (timestamp of the deepest stage, NULL at depth 0).
    """
    stage_arr = F.array(*[F.lit(s) for s in stages])
    events = df.filter(F.col(type_col).isin(list(stages))).select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    )
    from ..runtime.checkpoint import group_agg_partitions

    # sized exchange: the per-user event list is a collect buffer per
    # group (see runtime.checkpoint.group_agg_partitions / SCALE.md)
    per_user = (
        events.repartition(group_agg_partitions(events), "user")
        .groupBy("user")
        .agg(
            F.sort_array(F.collect_list(F.struct("ts", "etype"))).alias("evs")
        )
    )
    # fold state: (n stages reached, ts of the latest advancement)
    init = F.struct(
        F.lit(0).cast("int").alias("n"),
        F.lit(None).cast("timestamp").alias("t"),
    )
    step = (
        lambda acc, e: F.when(
            (acc["n"] < F.lit(len(stages)))
            & (e["etype"] == F.element_at(stage_arr, acc["n"] + 1))
            & (acc["t"].isNull() | (e["ts"] > acc["t"])),
            F.struct(
                (acc["n"] + 1).alias("n"), e["ts"].alias("t")
            ),
        ).otherwise(acc)
    )
    state = F.aggregate(F.col("evs"), init, step)
    return per_user.select(
        F.col("user"),
        state["n"].alias("deepest"),
        state["t"].alias("reached_ts"),
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Users reaching each funnel stage (depth ≥ k), one row per stage."""
    depth = funnel_stages(df, user_col, ts_col, type_col, stages)
    stage_arr = F.array(*[F.lit(s) for s in stages])
    reached = depth.filter(F.col("deepest") > 0).select(
        F.explode(F.sequence(F.lit(1), F.col("deepest"))).alias("stage_idx")
    )
    return (
        reached.groupBy("stage_idx")
        .agg(F.count("*").alias("n_users"))
        .select(
            "stage_idx",
            F.element_at(stage_arr, F.col("stage_idx")).alias("stage"),
            "n_users",
        )
        .orderBy("stage_idx")
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity
    period, counted per period offset they returned in.

    One shuffle on user (first-period + distinct activity periods in a
    single per-user aggregate), then a narrow explode and a small
    (cohort, offset) aggregate. Per-user state = that user's distinct
    activity periods, bounded by the observation span / bucket size.
    """
    # floor division, not cast-truncation: negative (pre-1970) epochs must
    # round down to match SQL floor(epoch / step) oracle semantics
    period = F.floor(F.col(ts_col).cast("long") / F.lit(bucket_seconds)).cast(
        "long"
    )
    from ..runtime.checkpoint import group_agg_partitions

    sel = df.select(F.col(user_col).alias("user"), period.alias("p"))
    per_user = (
        sel.repartition(group_agg_partitions(sel), "user")
        .groupBy("user")
        .agg(F.min("p").alias("cohort_p"), F.collect_set("p").alias("ps"))
    )
    exploded = per_user.select(
        "user",
        F.timestamp_seconds(F.col("cohort_p") * bucket_seconds).alias("cohort"),
        F.explode(
            F.transform(F.col("ps"), lambda p: p - F.col("cohort_p"))
        ).alias("period_offset"),
    )
    return (
        exploded.groupBy("cohort", "period_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort", "period_offset")
    )
