"""Property-based checks of the round-5b plan batch: every rewrite was
justified as "identical output, cheaper plan" — these pin the identity
half on ARBITRARY inputs, not just the benchmark tables.

* weighted CMS over (item, count) == occurrence CMS over raw items
  (the doc_token_cms rewrite),
* the q21 two-level aggregate == the conditional-countDistinct form,
* pinned_sort == orderBy on computed columns.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_items = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy"]),
    min_size=1,
    max_size=40,
)


class TestWeightedCms:
    @given(items=_items)
    @settings(**_SETTINGS)
    def test_weighted_counts_equal_occurrence_sketch(self, spark, items):
        """cms_table(counts, weight_col="n") must produce bit-identical
        counters to cms_table(raw occurrences): a counter is the sum of
        the counts of the items hashing into it."""
        from knetminer_etl_spark.operators.sketch import cms_table

        raw = spark.createDataFrame([(i,) for i in items], "item string")
        occ = cms_table(raw, "item", depth=2, width=64)
        counts = raw.groupBy("item").agg(F.count("*").alias("n"))
        wtd = cms_table(counts, "item", depth=2, width=64, weight_col="n")
        key = lambda r: (r["cms_row"], r["cms_bucket"], r["cms_count"])  # noqa: E731
        assert sorted(map(key, occ.collect())) == sorted(map(key, wtd.collect()))


@st.composite
def _order_lines(draw):
    """(orderkey, suppkey, late) lines with repeated keys so both
    multi-supplier and multi-line-per-supplier shapes occur."""
    n = draw(st.integers(1, 25))
    return [
        (
            draw(st.integers(1, 6)),
            draw(st.integers(1, 4)),
            draw(st.booleans()),
        )
        for _ in range(n)
    ]


class TestQ21TwoLevelAggregate:
    @given(lines=_order_lines())
    @settings(**_SETTINGS)
    def test_two_level_equals_count_distinct_form(self, spark, lines):
        ld = spark.createDataFrame(
            lines, "l_orderkey int, l_suppkey int, late boolean"
        )
        supp_if = lambda cond: F.when(cond, F.col("l_suppkey"))  # noqa: E731
        expand = ld.groupBy("l_orderkey").agg(
            F.countDistinct(supp_if(F.col("late"))).alias("n_late_supp"),
            F.max(supp_if(F.col("late"))).alias("late_supp"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("late_lines"),
            F.countDistinct(supp_if(~F.col("late"))).alias("n_ontime_supp"),
            F.max(supp_if(~F.col("late"))).alias("some_ontime_supp"),
        )
        per_os = ld.groupBy("l_orderkey", "l_suppkey").agg(
            F.max(F.col("late").cast("int")).alias("has_late"),
            F.max((~F.col("late")).cast("int")).alias("has_ontime"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late_lines"),
        )
        two_level = per_os.groupBy("l_orderkey").agg(
            F.sum("has_late").alias("n_late_supp"),
            F.max(F.when(F.col("has_late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
            F.sum("n_late_lines").alias("late_lines"),
            F.sum("has_ontime").alias("n_ontime_supp"),
            F.max(F.when(F.col("has_ontime") == 1, F.col("l_suppkey"))).alias(
                "some_ontime_supp"
            ),
        )
        key = lambda r: tuple(  # noqa: E731
            None if v is None else int(v) for v in r
        )
        got = sorted(map(key, two_level.collect()))
        want = sorted(map(key, expand.collect()))
        assert got == want


class TestPinnedSortEquivalence:
    @given(
        rows=st.lists(
            st.tuples(st.integers(-50, 50), st.text("abc", max_size=4)),
            min_size=1,
            max_size=30,
        )
    )
    @settings(**_SETTINGS)
    def test_pinned_sort_equals_order_by(self, spark, rows):
        from knetminer_etl_spark.operators.util import pinned_sort

        df = spark.createDataFrame(rows, "k int, v string").withColumn(
            "h", F.md5(F.concat_ws(":", "k", "v"))
        )
        want = [tuple(r) for r in df.orderBy("k", "v", "h").collect()]
        got = [tuple(r) for r in pinned_sort(df, "k", "v", "h").collect()]
        assert got == want
