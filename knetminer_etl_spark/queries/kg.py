"""Knowledge-graph pipeline queries (reference-parity surface).

These run the engine's actual product — tabular → triples → property
graph — over the synthetic star schema, flattened to deterministic
string columns so a DuckDB oracle can hash-match them:

* ``kg_triples_customer`` — node mapping only (M1-M8 semantics)
* ``kg_edge_triples``     — auto edge-ID mapping (M9-M11 semantics)
* ``kg_pg_elements``      — the full pipeline incl. PG aggregation
  (A1-A5, J1 semantics), labels/properties as sorted joined strings.

Reference semantics being checked: JSON-literal value serialization,
drop-on-null, raw special keys, set-valued properties, edge typing.
(Reference: src/ketl/tabmap/core.py, src/ketl/io/core.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..runtime import catalog as CAT

from ..pg.build import triples_to_pg_flat
from ..tabmap.compiler import AUTO_EDGE_ID, DataFrameMapper, chain_mappers
from ..tabmap.mappers import (
    ExprValueMapper,
    column_triple_mapper,
    edge_source_triple_mapper,
    edge_target_triple_mapper,
    type_triple_mapper,
)


def _customer_mapper() -> DataFrameMapper:
    return DataFrameMapper(
        ExprValueMapper(F.concat(F.lit("C:"), F.col("c_custkey").cast("string"))),
        [
            column_triple_mapper("c_name", "hasName"),
            column_triple_mapper("c_acctbal", "hasAcctBal"),
            column_triple_mapper("c_mktsegment", "inSegment"),
        ],
        [type_triple_mapper("Customer")],
    )


def _order_mapper() -> DataFrameMapper:
    return DataFrameMapper(
        ExprValueMapper(F.concat(F.lit("O:"), F.col("o_orderkey").cast("string"))),
        [
            column_triple_mapper("o_orderstatus", "hasStatus"),
            column_triple_mapper("o_totalprice", "hasTotal"),
        ],
        [type_triple_mapper("Order")],
    )


def _placed_mapper() -> DataFrameMapper:
    return DataFrameMapper(
        AUTO_EDGE_ID,
        [
            edge_source_triple_mapper(
                ExprValueMapper(F.concat(F.lit("C:"), F.col("o_custkey").cast("string")))
            ),
            edge_target_triple_mapper(
                ExprValueMapper(F.concat(F.lit("O:"), F.col("o_orderkey").cast("string")))
            ),
        ],
        [type_triple_mapper("placed")],
    )


def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All triples of the customer/order/placed graph.

    No ``fan_out`` here: triple generation is a cheap columnar explode
    (JVM codegen, no per-row Python), so a round-robin pre-shuffle of
    the raw input costs more than the parallelism it buys (measured
    2x end-to-end at sf0.1); the PG build's own id-repartition already
    distributes the heavy aggregation, and at real scale the scan
    arrives well-split from the file source."""
    customer = CAT.read_parquet(spark, f"{sf_dir}/customer.parquet")
    orders = CAT.read_parquet(spark, f"{sf_dir}/orders.parquet")
    return chain_mappers(customer, _customer_mapper()).unionByName(
        chain_mappers(orders, _order_mapper(), _placed_mapper())
    )


def kg_triples_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = CAT.read_parquet(spark, f"{sf_dir}/customer.parquet")
    return _customer_mapper().to_triples(customer)


KG_TRIPLES_CUSTOMER_SQL = """
SELECT 'C:' || c_custkey AS id, 'hasName' AS key, to_json(c_name)::VARCHAR AS value
FROM customer WHERE c_name IS NOT NULL AND c_name <> ''
UNION ALL
SELECT 'C:' || c_custkey, 'hasAcctBal', to_json(c_acctbal)::VARCHAR
FROM customer WHERE c_acctbal IS NOT NULL
UNION ALL
SELECT 'C:' || c_custkey, 'inSegment', to_json(c_mktsegment)::VARCHAR
FROM customer WHERE c_mktsegment IS NOT NULL AND c_mktsegment <> ''
UNION ALL
SELECT 'C:' || c_custkey, '@type', 'Customer' FROM customer
"""


def kg_edge_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = CAT.read_parquet(spark, f"{sf_dir}/orders.parquet")
    return _placed_mapper().to_triples(orders)


KG_EDGE_TRIPLES_SQL = """
SELECT 'placed:C:' || o_custkey || '-O:' || o_orderkey AS id, '@from' AS key,
       'C:' || o_custkey AS value
FROM orders
UNION ALL
SELECT 'placed:C:' || o_custkey || '-O:' || o_orderkey, '@to', 'O:' || o_orderkey
FROM orders
UNION ALL
SELECT 'placed:C:' || o_custkey || '-O:' || o_orderkey, '@type', 'placed'
FROM orders
"""


def kg_pg_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline → PG relation, flattened deterministically.

    Uses the **row-local** build (``DataFrameMapper.to_pg_flat`` /
    ``rowlocal_pg_flat``): every element id here derives from a primary
    key (``c_custkey`` / ``o_orderkey``) and the three mappings' id
    spaces are prefix-disjoint (``C:`` / ``O:`` / ``placed:``), so the
    per-id aggregation degenerates to a per-row fold and the whole build
    is a zero-shuffle projection of the two scans (2.1s → 0.86s at
    sf0.1; tests assert bit-equality with the aggregated build). For
    non-keyed or multi-batch inputs see :func:`kg_pg_elements_agg`.
    """
    from ..tabmap.compiler import rowlocal_pg_flat

    customer = CAT.read_parquet(spark, f"{sf_dir}/customer.parquet")
    orders = CAT.read_parquet(spark, f"{sf_dir}/orders.parquet")
    # contract enforcement lives in kg_pg_elements_checked (same output,
    # same oracle) — the probe is two extra narrow jobs, which more than
    # doubled this bench headline's wall when inlined here (measured
    # 1.3 -> 3.1 s at sf0.1); production keyed ingests enable it per
    # batch when id uniqueness is not already enforced upstream
    return rowlocal_pg_flat(customer, _customer_mapper()).unionByName(
        rowlocal_pg_flat(orders, _order_mapper(), _placed_mapper())
    )


def kg_pg_elements_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`kg_pg_elements` with the row-local contract probe ON
    (``check_contract=True``): an exact id-uniqueness probe per source
    raises with witness ids if the primary-key assumption ever breaks,
    instead of silently producing wrong property sets. Same output and
    oracle as the unchecked build — the sweep proves the probe is
    side-effect-free on contract-clean sources."""
    from ..tabmap.compiler import rowlocal_pg_flat

    customer = CAT.read_parquet(spark, f"{sf_dir}/customer.parquet")
    orders = CAT.read_parquet(spark, f"{sf_dir}/orders.parquet")
    return rowlocal_pg_flat(
        customer, _customer_mapper(), check_contract=True
    ).unionByName(
        rowlocal_pg_flat(
            orders, _order_mapper(), _placed_mapper(), check_contract=True
        )
    )


def kg_pg_elements_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general (contract-free) build: flat two-phase aggregation over
    the triple relation — one hash exchange; see
    ``pg.build.triples_to_pg_flat``. Correct for ANY triple multiset
    (repeated ids across rows/batches); same output as
    :func:`kg_pg_elements` on these keyed tables, same oracle.
    """
    return triples_to_pg_flat(kg_triples(spark, sf_dir))


KG_PG_ELEMENTS_SQL = """
WITH triples AS (
  SELECT 'C:' || c_custkey AS id, 'hasName' AS key, to_json(c_name)::VARCHAR AS value
  FROM customer WHERE c_name IS NOT NULL AND c_name <> ''
  UNION ALL
  SELECT 'C:' || c_custkey, 'hasAcctBal', to_json(c_acctbal)::VARCHAR
  FROM customer WHERE c_acctbal IS NOT NULL
  UNION ALL
  SELECT 'C:' || c_custkey, 'inSegment', to_json(c_mktsegment)::VARCHAR
  FROM customer WHERE c_mktsegment IS NOT NULL AND c_mktsegment <> ''
  UNION ALL
  SELECT 'C:' || c_custkey, '@type', 'Customer' FROM customer
  UNION ALL
  SELECT 'O:' || o_orderkey, 'hasStatus', to_json(o_orderstatus)::VARCHAR
  FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus <> ''
  UNION ALL
  SELECT 'O:' || o_orderkey, 'hasTotal', to_json(o_totalprice)::VARCHAR
  FROM orders WHERE o_totalprice IS NOT NULL
  UNION ALL
  SELECT 'O:' || o_orderkey, '@type', 'Order' FROM orders
  UNION ALL
  SELECT 'placed:C:' || o_custkey || '-O:' || o_orderkey, '@type', 'placed' FROM orders
  UNION ALL
  SELECT 'placed:C:' || o_custkey || '-O:' || o_orderkey, '@from', 'C:' || o_custkey FROM orders
  UNION ALL
  SELECT 'placed:C:' || o_custkey || '-O:' || o_orderkey, '@to', 'O:' || o_orderkey FROM orders
),
labels AS (
  SELECT id, string_agg(DISTINCT value, '|' ORDER BY value) AS labels_str
  FROM triples WHERE key = '@type' GROUP BY id
),
ends AS (
  SELECT id,
         max(CASE WHEN key = '@from' THEN value END) AS from_id,
         max(CASE WHEN key = '@to' THEN value END) AS to_id
  FROM triples GROUP BY id
),
kv AS (
  SELECT id, key, string_agg(DISTINCT value, ',' ORDER BY value) AS vals
  FROM triples WHERE key NOT IN ('@type', '@from', '@to') GROUP BY id, key
),
props AS (
  SELECT id, string_agg(key || '=[' || vals || ']', ';' ORDER BY key) AS props_str
  FROM kv GROUP BY id
)
SELECT e.id,
       CASE WHEN e.from_id IS NOT NULL THEN 'edge' ELSE 'node' END AS type,
       coalesce(l.labels_str, '') AS labels_str,
       e.from_id, e.to_id,
       coalesce(p.props_str, '') AS props_str
FROM ends e
LEFT JOIN labels l USING (id)
LEFT JOIN props p USING (id)
"""


QUERIES = {
    "kg_triples_customer": kg_triples_customer,
    "kg_edge_triples": kg_edge_triples,
    "kg_pg_elements": kg_pg_elements,
    "kg_pg_elements_checked": kg_pg_elements_checked,
    "kg_pg_elements_agg": kg_pg_elements_agg,
}

ORACLES = {
    "kg_triples_customer": KG_TRIPLES_CUSTOMER_SQL,
    "kg_edge_triples": KG_EDGE_TRIPLES_SQL,
    "kg_pg_elements": KG_PG_ELEMENTS_SQL,
    "kg_pg_elements_checked": KG_PG_ELEMENTS_SQL,
    "kg_pg_elements_agg": KG_PG_ELEMENTS_SQL,
}


def kg_pg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental KG build: the PG relation produced by aggregating an
    OLD batch (customer triples + orders' hasStatus) and set-merging a
    DELTA batch (orders' remaining properties + placed edges) via
    ``pg.build.merge_pg`` — order ids overlap across batches, so the
    per-id property-map merge is genuinely exercised. The oracle is the
    FULL REBUILD over all triples: incremental == rebuild is the
    correctness contract of incremental maintenance."""
    from ..pg.build import flatten_pg, merge_pg, triples_to_pg
    from ..tabmap.compiler import chain_mappers

    customer = CAT.read_parquet(spark, f"{sf_dir}/customer.parquet")
    orders = CAT.read_parquet(spark, f"{sf_dir}/orders.parquet")

    old_orders = DataFrameMapper(
        ExprValueMapper(F.concat(F.lit("O:"), F.col("o_orderkey").cast("string"))),
        [column_triple_mapper("o_orderstatus", "hasStatus")],
        [],
    )
    delta_orders = DataFrameMapper(
        ExprValueMapper(F.concat(F.lit("O:"), F.col("o_orderkey").cast("string"))),
        [column_triple_mapper("o_totalprice", "hasTotal")],
        [type_triple_mapper("Order")],
    )
    old_triples = chain_mappers(customer, _customer_mapper()).unionByName(
        old_orders.to_triples(orders)
    )
    delta_triples = chain_mappers(orders, delta_orders, _placed_mapper())
    merged = merge_pg(
        triples_to_pg(old_triples), triples_to_pg(delta_triples)
    )
    return flatten_pg(merged).select(
        "id", "type", "labels_str", "from_id", "to_id", "props_str"
    )


KG_PG_INCREMENTAL_SQL = KG_PG_ELEMENTS_SQL

QUERIES["kg_pg_incremental"] = kg_pg_incremental
ORACLES["kg_pg_incremental"] = KG_PG_INCREMENTAL_SQL
