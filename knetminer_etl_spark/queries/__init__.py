"""Query registry: every implemented query + its DuckDB oracle."""

from . import analytics, graph, kg, pipeline

QUERIES = {
    **analytics.QUERIES,
    **kg.QUERIES,
    **pipeline.QUERIES,
    **graph.QUERIES,
}
ORACLES = {
    **analytics.ORACLES,
    **kg.ORACLES,
    **pipeline.ORACLES,
    **graph.ORACLES,
}
