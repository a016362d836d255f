"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``knetminer_etl_spark.queries`` (one entry per
implemented operator family from SURVEY.md §2 plus the scale
extensions); this module just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG pipeline (tabular → triples → property-graph
    relation) over sf0.001."""
    from knetminer_etl_spark.queries.kg import kg_pg_elements

    return kg_pg_elements(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from knetminer_etl_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from knetminer_etl_spark.queries import ORACLES

    return dict(ORACLES)
