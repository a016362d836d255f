"""Graph-analytics queries over the constructed knowledge graph.

``dedup_components`` closes the loop between the dedup operators and the
graph layer: near-dup pairs become edges, connected components become
canonical document groups (the standard corpus-dedup clustering step).
Its oracle is a DuckDB *recursive CTE* computing min-reachable-id — the
same deterministic labeling the iterative Spark program converges to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..operators import graph as G
from .pipeline import _SHINGLES_CTE


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, component) for every document; component = min doc_id of its
    near-duplicate cluster (word-3-shingle Jaccard ≥ 0.5)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = DD.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
    return G.connected_components(
        pairs, "id_a", "id_b", nodes=docs, node_id="doc_id"
    )


DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE
{_SHINGLES_CTE},
jpairs AS (
  SELECT id_a, id_b
  FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
           count(*) AS inter
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
  ) p
  WHERE round(inter / (n_a + n_b - inter), 6) >= 0.5
),
gedges AS (
  SELECT id_a AS src, id_b AS dst FROM jpairs
  UNION
  SELECT id_b, id_a FROM jpairs
),
walk(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.comp FROM walk w JOIN gedges e ON e.src = w.id
)
SELECT id, min(comp) AS component FROM walk GROUP BY id
"""


def kg_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree relation of the customer-placed-order graph (prefixed ids)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = orders.select(
        F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("O:"), F.col("o_orderkey").cast("string")).alias("dst"),
    )
    return G.degrees(edges)


KG_DEGREES_SQL = """
WITH gedges AS (
  SELECT 'C:' || o_custkey AS src, 'O:' || o_orderkey AS dst FROM orders
),
o AS (SELECT src AS id, count(*) AS out_degree FROM gedges GROUP BY src),
i AS (SELECT dst AS id, count(*) AS in_degree FROM gedges GROUP BY dst)
SELECT coalesce(o.id, i.id) AS id,
       coalesce(out_degree, 0) AS out_degree,
       coalesce(in_degree, 0) AS in_degree,
       coalesce(out_degree, 0) + coalesce(in_degree, 0) AS degree
FROM o FULL OUTER JOIN i ON o.id = i.id
"""


def kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer/order graph (rows-only: float summation
    order across shuffles is engine-specific)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = orders.select(
        F.concat(F.lit("C:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("O:"), F.col("o_orderkey").cast("string")).alias("dst"),
    )
    return G.pagerank(edges, iterations=5)


QUERIES = {
    "dedup_components": dedup_components,
    "kg_degrees": kg_degrees,
    "kg_pagerank": kg_pagerank,
}

ORACLES = {
    "dedup_components": DEDUP_COMPONENTS_SQL,
    "kg_degrees": KG_DEGREES_SQL,
}
