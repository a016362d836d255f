"""Query registry: every implemented query + its DuckDB oracle.

Every registered callable is wrapped to pin the session confs its
results depend on — the caller may hand us any SparkSession (the
correctness driver builds its own), so required runtime confs cannot be
assumed from our session factory:

* ``spark.sql.legacy.parquet.nanosAsLong`` — events.parquet stores
  TIMESTAMP(NANOS), unreadable by the Spark parquet reader otherwise;
* ``spark.sql.session.timeZone=UTC`` — date_trunc/day-bucketing must
  agree with the (UTC-naive) DuckDB oracle.

Both are runtime-settable SQL confs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics,
    analytics2,
    behavior,
    corpus,
    graph,
    kg,
    olap,
    pipeline,
    sketches,
    training,
)

_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def _pin_confs(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        for k, v in _REQUIRED_CONFS.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # immutable in some environments; defaults then apply
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


QUERIES = {
    name: _pin_confs(fn)
    for name, fn in {
        **analytics.QUERIES,
        **analytics2.QUERIES,
        **kg.QUERIES,
        **pipeline.QUERIES,
        **graph.QUERIES,
        **corpus.QUERIES,
        **behavior.QUERIES,
        **olap.QUERIES,
        **sketches.QUERIES,
        **training.QUERIES,
    }.items()
}
ORACLES = {
    **analytics.ORACLES,
    **analytics2.ORACLES,
    **kg.ORACLES,
    **pipeline.ORACLES,
    **graph.ORACLES,
    **corpus.ORACLES,
    **behavior.ORACLES,
    **olap.ORACLES,
    **sketches.ORACLES,
    **training.ORACLES,
}
