"""Continuous (streaming) SEMANTIC dedup: per-batch incremental pairs
over a file-source embedding stream under frozen centroids, with
replay idempotence — the embedding twin of test_streaming_dedup.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.operators.dedup import semantic_dedup
from knetminer_etl_spark.streaming import dedupe as SD


def _corpus_rows():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(24, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(24)]
    # near-twins inside batch 1, inside batch 2, and across the boundary
    for new_id, src in ((100, 3), (101, 20), (102, 3)):
        v = base[src] + 0.002 * rng.normal(size=8)
        v = v / np.linalg.norm(v)
        rows.append((new_id, [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("semdedup")
    rows = _corpus_rows()
    schema = "vec_id long, embedding array<double>"
    batch1 = [r for r in rows if r[0] < 12 or r[0] == 100]
    batch2 = [r for r in rows if not (r[0] < 12 or r[0] == 100)]
    src = d / "vecs"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    full = spark.createDataFrame(rows, schema)
    # frozen model state: the draw an offline fit over the full corpus
    # would pin (what batch semantic_dedup computes internally)
    cents = [
        list(r["embedding"])
        for r in full.orderBy(
            F.md5(F.col("vec_id").cast("string")), "vec_id"
        ).limit(4).collect()
    ]
    return {
        "src": str(src),
        "index": str(d / "index"),
        "vecs": str(d / "store"),
        "pairs": str(d / "pairs"),
        "ckpt": str(d / "ckpt"),
        "full": full,
        "cents": cents,
    }


def test_stream_pairs_equal_full_banded_run(spark, paths):
    stream = SD.read_vector_stream(spark, paths["src"])
    q = SD.start_semantic_dedup_stream(
        stream,
        paths["index"],
        paths["vecs"],
        paths["pairs"],
        paths["ckpt"],
        paths["cents"],
        threshold=0.95,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed_dropped = {
        r["id_b"]
        for r in SD.read_semantic_pairs(spark, paths["pairs"]).collect()
    }
    full = semantic_dedup(
        paths["full"], threshold=0.95, centroids=paths["cents"], direct_max=0
    )
    full_dropped = {r["vec_id"] for r in full.collect() if not r["keep"]}
    assert streamed_dropped == full_dropped
    assert full_dropped  # the planted twins produced drops
    # cross-boundary twin found: 102 (batch 2) pairs with 3 (batch 1)
    pair_set = {
        (r["id_a"], r["id_b"])
        for r in SD.read_semantic_pairs(spark, paths["pairs"]).collect()
    }
    assert (3, 102) in pair_set


def test_replaying_an_epoch_is_idempotent(spark, paths):
    before = sorted(
        map(tuple, SD.read_semantic_pairs(spark, paths["pairs"]).collect())
    )
    batch2 = spark.read.parquet(paths["src"]).filter(
        ~((F.col("vec_id") < 12) | (F.col("vec_id") == 100))
    )
    SD.process_semantic_batch(
        spark,
        batch2,
        1,  # same epoch id: overwrite its own partitions
        paths["index"],
        paths["vecs"],
        paths["pairs"],
        paths["cents"],
        threshold=0.95,
    )
    after = sorted(
        map(tuple, SD.read_semantic_pairs(spark, paths["pairs"]).collect())
    )
    assert before == after
