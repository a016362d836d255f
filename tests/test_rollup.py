from __future__ import annotations

import pytest

import shutil

from pyspark.sql import functions as F

from knetminer_etl_spark.streaming import events as EV
from knetminer_etl_spark.streaming.rollup import read_rollup, start_rollup_stream

SF_DIR = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir("/root/testdata/sf0.001"),
    reason="driver-generated parquet fixtures not present (CI)",
)



def test_incremental_rollup_matches_batch(spark, tmp_path):
    # two files → two micro-batches touching overlapping days
    src = tmp_path / "stream"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")

    stream = EV.read_event_stream(spark, str(src), max_files_per_trigger=1)
    q = start_rollup_stream(
        stream, str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        # second batch arrives: same events again (every count doubles)
        shutil.copy(f"{SF_DIR}/events.parquet", src / "b.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["user_id"], r["day"]): (r["n_events"], r["sum_value"])
        for r in read_rollup(spark, str(tmp_path / "rollup")).collect()
    }
    batch = (
        EV.load_events(spark, f"{SF_DIR}/events.parquet")
        .groupBy(
            F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
            "user_id",
        )
        .agg(
            (F.count("*") * 2).alias("n_events"),
            F.round(F.sum("value") * 2, 4).alias("sum_value"),
        )
    )
    want = {
        (r["user_id"], r["day"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6
