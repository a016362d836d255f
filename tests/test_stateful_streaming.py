from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from knetminer_etl_spark.streaming import events as EV
from knetminer_etl_spark.streaming.stateful import stream_running_totals

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(SF_DIR),
    reason="driver-generated parquet fixtures not present (CI)",
)


def test_running_totals_converge_to_batch(spark):
    stream = EV.read_event_stream(
        spark, f"{SF_DIR}/events*", max_files_per_trigger=1
    )
    out = stream_running_totals(stream)
    EV.run_stream_to_memory(out, "running_totals", output_mode="update")
    # update mode re-emits per trigger; the LAST row per user is the final state
    final = spark.sql(
        """
        SELECT user_id, n_events, sum_value, max_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM running_totals
        ) WHERE rn = 1
        """
    )
    batch = (
        EV.load_events(spark, f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.max("value").alias("max_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"]) for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"]) for r in batch.collect()}
    assert got == want


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python driver worker needs protobuf, "
    "not installed in this container",
)
def test_tws_running_totals_match_batch(spark):
    from knetminer_etl_spark.streaming.stateful import stream_running_totals_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = EV.read_event_stream(
            spark, f"{SF_DIR}/events*", max_files_per_trigger=1
        )
        out = stream_running_totals_tws(stream)
        EV.run_stream_to_memory(out, "running_totals_tws", output_mode="update")
        final = spark.sql(
            """
            SELECT user_id, n_events, sum_value, max_value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM running_totals_tws
            ) WHERE rn = 1
            """
        )
        batch = (
            EV.load_events(spark, f"{SF_DIR}/events.parquet")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
                F.max("value").alias("max_value"),
            )
        )
        got = {r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
               for r in final.collect()}
        want = {r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
                for r in batch.collect()}
        assert got == want
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_rolling_zscore_matches_batch(spark):
    from knetminer_etl_spark.operators import timeseries as TS
    from knetminer_etl_spark.streaming.stateful import stream_rolling_zscore

    stream = EV.read_event_stream(spark, f"{SF_DIR}/events*")
    out = stream_rolling_zscore(stream, n=10)
    EV.run_stream_to_memory(out, "stream_z", output_mode="update")
    got = {
        r["event_id"]: (None if r["z"] is None else round(r["z"], 9))
        for r in spark.sql("SELECT event_id, z FROM stream_z").collect()
    }

    batch = TS.rolling_zscore(
        EV.load_events(spark, f"{SF_DIR}/events.parquet"),
        ["user_id"],
        "ts",
        "value",
        n=10,
        tiebreak_cols=["event_id"],
    )
    want = {
        r["event_id"]: (None if r["z"] is None else round(r["z"], 9))
        for r in batch.select("event_id", "z").collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_stream_ewma_matches_batch(spark):
    from knetminer_etl_spark.operators import timeseries as TS
    from knetminer_etl_spark.streaming.stateful import stream_ewma

    stream = EV.read_event_stream(spark, f"{SF_DIR}/events*")
    out = stream_ewma(stream, alpha=0.3)
    EV.run_stream_to_memory(out, "stream_ewma_t", output_mode="update")
    got = {
        r["event_id"]: r["ewma"]
        for r in spark.sql("SELECT event_id, ewma FROM stream_ewma_t").collect()
    }

    batch = TS.ewma(
        EV.load_events(spark, f"{SF_DIR}/events.parquet"),
        ["user_id"],
        "ts",
        "value",
        alpha=0.3,
        tiebreak_cols=["event_id"],
    )
    want = {r["event_id"]: r["ewma"] for r in batch.collect()}
    assert len(got) == len(want)
    assert got == want
