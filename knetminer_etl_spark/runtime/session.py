"""SparkSession factory (reference src/ketl/spark/utils.py:239-262).

Defaults are scale-aware: AQE on (runtime re-plan, skew-join handling,
shuffle-partition coalescing), UTC session timezone (oracle-comparable
timestamps), Arrow enabled for the Pandas-UDF paths.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

_DEFAULT_CONF = {
    # parquet TIMESTAMP(NANOS) (unsupported by the Spark reader) surfaces
    # as raw int64 nanos; streaming/events loaders convert exactly via
    # integer division to micros (see streaming.events.load_events)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
}


def _resolve_master(master: str | None) -> str:
    """Explicit master, else ``$SPARK_MASTER`` (the URL
    scripts/slurm/spark-cluster-start.sh tracks for a standalone
    cluster), else ``local[N]`` with N from ``$SPARK_GRAFT_CPUS``."""
    if master is not None:
        return master
    env = os.environ.get("SPARK_MASTER")
    if env:
        return env
    return f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"


def get_session(
    app_name: str = "knetminer-etl-spark",
    master: str | None = None,
    conf: dict[str, Any] | None = None,
) -> SparkSession:
    """Build/get a session. ``master`` falls back to ``$SPARK_MASTER``
    (the URL scripts/slurm/spark-cluster-start.sh tracks for a
    standalone cluster), then to ``local[N]`` with N from
    ``$SPARK_GRAFT_CPUS`` (fallback: all cores)."""
    builder = SparkSession.builder.appName(app_name)
    master = _resolve_master(master)
    if master:
        builder = builder.master(master)
    merged = dict(_DEFAULT_CONF)
    if master and master.startswith("local"):
        n = os.cpu_count() or 8
        merged.setdefault("spark.sql.shuffle.partitions", str(n))
        merged.setdefault("spark.driver.memory", "8g")
        merged.setdefault("spark.ui.enabled", "false")
    if conf:
        merged.update(conf)
    for key, val in merged.items():
        builder = builder.config(key, str(val))
    return builder.getOrCreate()


def session_from_config(config: dict[str, Any]) -> SparkSession:
    """Session from a config dict: ``{app_name, master|remote, conf:{...}}``."""
    return get_session(
        app_name=config.get("app_name", "knetminer-etl-spark"),
        master=config.get("master"),
        conf=config.get("conf"),
    )


def release_pinned_rdds(spark: SparkSession) -> int:
    """Unpersist every persistent RDD in the session — the cleanup a
    long-lived session needs between independent jobs.

    ``localCheckpoint`` pins (which this engine uses to stop Catalyst
    re-deriving multi-referenced subplans) register persistent RDDs that
    are never released automatically; a session running many queries
    back-to-back (benchmark harness, notebook, service) accumulates them
    until executor storage pressure makes LATE queries pay earlier
    queries' memory (measured: the last scale-sweep query ran 2.7×
    slower than in a fresh session). Call between queries whose results
    have been fully materialized. Returns the number released.
    """
    jrdds = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in jrdds.values():
        jrdd.unpersist(False)
        n += 1
    return n


def release_pin(df) -> bool:
    """Unpersist the checkpoint RDD backing ONE ``localCheckpoint``'d
    DataFrame — the scoped counterpart of :func:`release_pinned_rdds`.

    A long-lived stream that pins every micro-batch (the per-epoch
    ``localCheckpoint(eager=True)`` pattern in ``streaming/dedupe``)
    otherwise accumulates pinned blocks per epoch until executor
    storage pressure degrades later batches. Call ONLY once the
    DataFrame's consumers have fully materialized: the pin is the DF's
    lineage, so touching it afterwards raises
    ``checkpointRDDBlockIdNotFound``. Returns False when the plan is
    not a direct ``LogicalRDD`` pin (nothing released)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False
