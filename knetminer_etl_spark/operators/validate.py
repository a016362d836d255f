"""Data validation and profiling (expectation checks over any relation).

ETL pipelines gate loads on data contracts — null-free keys, value
ranges, referential integrity (the reference ships one hard-coded case:
the dangling-endpoint check, ref: src/ketl — generalized here). Both
operators are single-pass:

* :func:`check` evaluates every rule as a conditional aggregate in ONE
  wide aggregation over one scan — adding rules adds expressions, not
  passes; the result is one row per rule (rule, n_violations, n_rows).
* :func:`profile` computes per-column stats (count/nulls/distinct/
  min/max) in one scan: the only multi-pass-looking piece, exact
  distinct counts, rides a single posexplode-free wide agg with one
  ``count(DISTINCT col)`` per column (Spark plans multi-distinct via
  expand — one logical pass; swap for HLL registers from
  operators.sketch when a 100 TB profile doesn't need exactness).
* :func:`expect` raises on contract breach — the pipeline gate.

Long-format outputs (one row per rule/column) keep results relation-
shaped so they can be written, unioned across runs, and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_violations, n_rows) per rule — a row VIOLATES a rule
    when the predicate is false OR null (a null check result is a
    failed check, the convention that makes ``col > 0`` catch nulls).
    One wide conditional aggregate, one scan, rows ordered by rule."""
    if not rules:
        raise ValueError("check: no rules given")
    aggs = [
        F.sum(
            F.when(F.coalesce(pred.cast("boolean"), F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(F.count("*").alias("_n"), *aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(name).cast("long").alias("n_violations"),
            )
            for name in rules
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("_r"), F.col("_n").cast("long"))
        .select("_r.rule", "_r.n_violations", F.col("_n").alias("n_rows"))
        .orderBy("rule")
    )


def expect(df: DataFrame, rules: dict[str, Column], max_violations: int = 0) -> DataFrame:
    """Gate: raise ``ValueError`` naming every breached rule when any
    rule's violation count exceeds ``max_violations``; otherwise return
    the check report (so pipelines can persist it)."""
    report = check(df, rules)
    bad = [
        (r["rule"], r["n_violations"])
        for r in report.collect()
        if r["n_violations"] > max_violations
    ]
    if bad:
        detail = ", ".join(f"{name}: {n}" for name, n in bad)
        raise ValueError(f"data contract breached — {detail}")
    return report


def referential_check(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """(rule, n_violations, n_rows) for foreign-key integrity: fact rows
    whose key has no match in dim (left_anti — the generalized
    dangling-endpoint check). NULL fact keys count as violations."""
    n_rows = fact.count()
    dangling = fact.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(), fact_key, "left_anti"
    ).count()
    spark = fact.sparkSession
    return spark.createDataFrame(
        [(f"{fact_key}_references_{dim_key}", dangling, n_rows)],
        "rule string, n_violations long, n_rows long",
    )


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_value, max_value) per
    column, min/max rendered as strings for a uniform schema (NULL for
    all-null columns). One wide aggregate over one scan."""
    names = df.columns if cols is None else cols
    if not names:
        raise ValueError("profile: no columns")
    aggs = []
    for c in names:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            F.countDistinct(col).alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_mn_{c}"),
            F.max(col).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(F.count("*").alias("_n"), *aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_nn_{c}").cast("long").alias("n_null"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_value"),
                F.col(f"_mx_{c}").alias("max_value"),
            )
            for c in names
        ]
    )
    return (
        wide.select(F.explode(rows).alias("_r"), F.col("_n").cast("long"))
        .select(
            "_r.column",
            F.col("_n").alias("n_rows"),
            "_r.n_null",
            "_r.n_distinct",
            "_r.min_value",
            "_r.max_value",
        )
        .orderBy("column")
    )
