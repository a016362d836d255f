"""Analytic query catalog over the synthetic star schema.

Each query is ``fn(spark, sf_dir) -> DataFrame`` with a matching ANSI-SQL
oracle in ``ORACLES`` (DuckDB-runnable on the same parquet views). Column
names and rounding are aligned on both sides so the driver's
order-insensitive value-hash comparison is exact.

These exercise the engine's relational surface at benchmark scale:
pushed-down scans, partial aggregation, broadcast vs shuffle joins
(small dims broadcast), window top-k, date bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..runtime import catalog as CAT


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return CAT.read_parquet(spark, f"{sf_dir}/{name}.parquet")


# -- Q1-style pricing summary ------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# -- Q3-style shipping priority ---------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        # customer scales with SF: no explicit broadcast hint — let AQE pick
        # (a forced hint bypasses AQE's size check and OOMs at large SF).
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# -- Q5-style regional volume ------------------------------------------------


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    dims = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("n_nationkey", "n_name", "r_name")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q5_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


# -- Q6-style revenue delta --------------------------------------------------


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# -- Q10-style returned-items customer ranking -------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# -- window top-k per group --------------------------------------------------


def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue").desc(), F.col("c_custkey")
    )
    return (
        rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "revenue", "rnk")
    )


TOP_CUSTOMERS_SQL = """
SELECT c_mktsegment, c_custkey, c_name, revenue, rnk
FROM (
  SELECT c_mktsegment, c_custkey, c_name,
         round(sum(o_totalprice), 2) AS revenue,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY round(sum(o_totalprice), 2) DESC, c_custkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey, c_name
) t
WHERE rnk <= 3
"""


# -- date bucketing ----------------------------------------------------------


def orders_by_month_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month"),
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


ORDERS_BY_MONTH_SQL = """
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
       o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2
"""


# -- part stats (filter + distinct + multiple aggs) --------------------------


def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_retail"),
        )
    )


PART_TYPE_SQL = """
SELECT p_brand,
       count(DISTINCT p_partkey) AS n_parts,
       round(sum(l_quantity), 2) AS total_qty,
       round(avg(p_retailprice), 4) AS avg_retail
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# -- semi-join: orders with at least one late lineitem (EXISTS) -------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    late = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(late, o["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# -- anti-join: orders with no lineitems (NOT EXISTS) ------------------------


def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_anti")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_total"),
        )
    )


ORDERS_WITHOUT_LINEITEMS_SQL = """
SELECT o_orderstatus, count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_total
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderstatus
"""


# -- rollup: multi-level totals ---------------------------------------------


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "total",
            "n",
        )
    )


REVENUE_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 2) AS total,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# -- pivot: per-status totals as columns -------------------------------------


def segment_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0.0)).alias("total_f"),
            F.coalesce("O", F.lit(0.0)).alias("total_o"),
            F.coalesce("P", F.lit(0.0)).alias("total_p"),
        )
    )


SEGMENT_STATUS_PIVOT_SQL = """
SELECT c_mktsegment,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2), 0.0) AS total_f,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2), 0.0) AS total_o,
       coalesce(round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2), 0.0) AS total_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# -- conditional-share (Q14-style) -------------------------------------------


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_brand") == "Brand#1", rev).otherwise(F.lit(0.0))
    return (
        # part scales with SF: no broadcast hint — AQE decides at runtime.
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(F.sum(promo) * 100.0 / F.sum(rev), 4).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


Q14_SQL = """
SELECT round(sum(CASE WHEN p_brand = 'Brand#1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             * 100.0 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# -- HAVING (Q18-style large orders) -----------------------------------------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("total_qty", 2).alias("total_qty"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


Q18_SQL = """
SELECT o_orderkey, o_custkey,
       round(total_qty, 2) AS total_qty,
       round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
) b JOIN orders ON l_orderkey = o_orderkey
"""


# -- union across entity tables ----------------------------------------------


def account_balances_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return (
        c.unionByName(s)
        .groupBy("kind", "nationkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("acctbal"), 2).alias("total_bal"),
        )
    )


ACCOUNT_UNION_SQL = """
SELECT kind, nationkey, count(*) AS n, round(sum(acctbal), 2) AS total_bal
FROM (
  SELECT 'customer' AS kind, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier', s_nationkey, s_acctbal FROM supplier
) t
GROUP BY kind, nationkey
"""


# -- scalar subquery ---------------------------------------------------------


def above_avg_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal")).first()[0]
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        )
    )


ABOVE_AVG_SQL = """
SELECT c_mktsegment, count(*) AS n, round(min(c_acctbal), 2) AS min_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
GROUP BY c_mktsegment
"""


# -- distinct on subset ------------------------------------------------------


def distinct_order_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_orders"))
    )


DISTINCT_ORDER_SUPPLIERS_SQL = """
SELECT l_suppkey, count(*) AS n_orders
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) t
GROUP BY l_suppkey
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q4_order_priority": q4_order_priority,
    "orders_without_lineitems": orders_without_lineitems,
    "revenue_rollup": revenue_rollup,
    "segment_status_pivot": segment_status_pivot,
    "distinct_order_suppliers": distinct_order_suppliers,
    "q14_promo_share": q14_promo_share,
    "q18_large_orders": q18_large_orders,
    "account_balances_union": account_balances_union,
    "above_avg_balance_customers": above_avg_balance_customers,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_volume": q5_region_volume,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q10_returned_items": q10_returned_items,
    "top_customers_per_segment": top_customers_per_segment,
    "orders_by_month_priority": orders_by_month_priority,
    "part_type_stats": part_type_stats,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q4_order_priority": Q4_SQL,
    "orders_without_lineitems": ORDERS_WITHOUT_LINEITEMS_SQL,
    "revenue_rollup": REVENUE_ROLLUP_SQL,
    "segment_status_pivot": SEGMENT_STATUS_PIVOT_SQL,
    "distinct_order_suppliers": DISTINCT_ORDER_SUPPLIERS_SQL,
    "q14_promo_share": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "account_balances_union": ACCOUNT_UNION_SQL,
    "above_avg_balance_customers": ABOVE_AVG_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_region_volume": Q5_SQL,
    "q6_revenue_forecast": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "top_customers_per_segment": TOP_CUSTOMERS_SQL,
    "orders_by_month_priority": ORDERS_BY_MONTH_SQL,
    "part_type_stats": PART_TYPE_SQL,
}
