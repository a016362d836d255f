"""Query registry: every implemented query + its DuckDB oracle."""

from . import analytics, kg, pipeline

QUERIES = {**analytics.QUERIES, **kg.QUERIES, **pipeline.QUERIES}
ORACLES = {**analytics.ORACLES, **kg.ORACLES, **pipeline.ORACLES}
