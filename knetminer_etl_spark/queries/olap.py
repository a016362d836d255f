"""OLAP SQL-surface breadth: multi-dimensional aggregation (CUBE /
GROUPING SETS with grouping ids) and the analytic-window suite
(running totals, lag deltas, percent_rank) — the warehouse shapes the
reference's consumers would otherwise need a separate OLAP engine for.

Scale: cube/grouping-sets expand each input row into one replica per
grouping set *after* a map-side partial aggregate (Spark's Expand sits
below the exchange, so the shuffle carries pre-combined per-set
partials, not row replicas × full fact). Windows partition on real
keys (customer), never a global ORDER BY over the whole relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analytics import _t


# ---------------------------------------------------------------------------
# CUBE: revenue by market segment × order year, all marginals
# ---------------------------------------------------------------------------


def segment_year_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over (mktsegment, order year): per-cell, per-margin and
    grand-total revenue with a grouping id distinguishing the levels."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        F.year("o_orderdate").alias("o_year"),
        "o_totalprice",
    )
    return (
        j.cube("c_mktsegment", "o_year")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("gid", "c_mktsegment", "o_year")
    )


SEGMENT_YEAR_CUBE_SQL = """
SELECT c_mktsegment,
       o_year,
       GROUPING(c_mktsegment) * 2 + GROUPING(o_year) AS gid,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM (
  SELECT c_mktsegment, year(o_orderdate) AS o_year, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
)
GROUP BY CUBE (c_mktsegment, o_year)
ORDER BY gid, c_mktsegment, o_year
"""


# ---------------------------------------------------------------------------
# GROUPING SETS: nation / (nation, year) / year revenue, no grand total
# ---------------------------------------------------------------------------


def nation_year_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets ((nation, year), (nation), (year)) — the
    asymmetric-marginals case CUBE cannot express without a filter,
    via the native `DataFrame.groupingSets` API."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            "o_totalprice",
        )
    )
    return (
        j.groupingSets(
            [["nation", "o_year"], ["nation"], ["o_year"]],
            "nation",
            "o_year",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("gid", "nation", "o_year")
    )


NATION_YEAR_GROUPING_SETS_SQL = """
SELECT nation,
       o_year,
       GROUPING(nation) * 2 + GROUPING(o_year) AS gid,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year, o_totalprice
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
GROUP BY GROUPING SETS ((nation, o_year), (nation), (o_year))
ORDER BY gid, nation, o_year
"""


# ---------------------------------------------------------------------------
# Analytic windows: per-customer order history features
# ---------------------------------------------------------------------------


def customer_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-history features in one window pass: sequence
    number, running revenue, days since previous order, and the order's
    percent_rank by price within the customer's history."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("cum_revenue"),
        # epoch-second difference / 86400 (timestamps are midnight, so
        # the quotient is the exact day count) — engine/timezone-proof,
        # unlike datediff's per-engine date-cast semantics (see q12)
        (
            (
                F.col("o_orderdate").cast("timestamp").cast("long")
                - F.lag(
                    F.col("o_orderdate").cast("timestamp").cast("long")
                ).over(w)
            )
            / 86400
        ).cast("long").alias("days_since_prev"),
        F.round(F.percent_rank().over(wp), 6).alias("price_pct_rank"),
    ).orderBy("o_custkey", "order_seq")


CUSTOMER_ORDER_WINDOWS_SQL = """
SELECT o_custkey,
       o_orderkey,
       row_number() OVER w AS order_seq,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_revenue,
       CAST((epoch(o_orderdate) - epoch(lag(o_orderdate) OVER w)) / 86400
            AS BIGINT) AS days_since_prev,
       round(percent_rank() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6)
         AS price_pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_seq
"""


QUERIES = {
    "segment_year_cube": segment_year_cube,
    "nation_year_grouping_sets": nation_year_grouping_sets,
    "customer_order_windows": customer_order_windows,
}

ORACLES = {
    "segment_year_cube": SEGMENT_YEAR_CUBE_SQL,
    "nation_year_grouping_sets": NATION_YEAR_GROUPING_SETS_SQL,
    "customer_order_windows": CUSTOMER_ORDER_WINDOWS_SQL,
}


# ---------------------------------------------------------------------------
# Z-order layout extents (operators/zorder.py)
# ---------------------------------------------------------------------------

_Z_DIMS = {"l_partkey": (0, 2047), "l_suppkey": (0, 127)}
_Z_BITS = 8


def lineitem_zorder_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleave (l_partkey, l_suppkey) into a 16-bit z-key and
    report each 256th-slice's per-dimension extents — the min/max file
    statistics a z-ordered layout would give every file, tight in BOTH
    dimensions at once (operators/zorder.py). The key is a narrow
    integer expression; the only shuffle is the 256-row extent
    aggregate."""
    from ..operators import zorder as Z

    l = _t(spark, sf_dir, "lineitem")
    keyed = Z.with_zorder_key(l, _Z_DIMS, bits=_Z_BITS)
    return (
        keyed.groupBy(
            F.shiftright(F.col("zkey"), _Z_BITS).cast("long").alias("z_slice")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
        .orderBy("z_slice")
    )


def _zorder_sql() -> str:
    from ..operators.zorder import zkey_sql

    zk = zkey_sql(_Z_DIMS, bits=_Z_BITS)
    return f"""
SELECT ({zk} >> {_Z_BITS}) AS z_slice,
       count(*) AS n_rows,
       min(l_partkey) AS part_lo, max(l_partkey) AS part_hi,
       min(l_suppkey) AS supp_lo, max(l_suppkey) AS supp_hi
FROM lineitem
GROUP BY 1
ORDER BY z_slice
"""


LINEITEM_ZORDER_SQL = _zorder_sql()

QUERIES.update({"lineitem_zorder_extents": lineitem_zorder_extents})
ORACLES.update({"lineitem_zorder_extents": LINEITEM_ZORDER_SQL})
