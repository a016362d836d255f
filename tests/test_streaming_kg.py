"""Continuous KG maintenance (streaming/kg.py): a customer stream mapped
to triples and merged micro-batch-by-micro-batch must converge to
exactly the PG a full batch build produces — the rebuild-equivalence
contract that lets PG-JSONL export / the Neo4j loader consume the stored
graph at any point."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.testing import assertDataFrameEqual

from knetminer_etl_spark.pg.build import triples_to_pg
from knetminer_etl_spark.queries.kg import _customer_mapper
from knetminer_etl_spark.streaming.kg import read_kg, start_kg_stream

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(SF_DIR),
    reason="driver-generated parquet fixtures not present (CI)",
)


def _canon(df):
    return df.select(
        "id", "type", F.array_sort("labels").alias("labels"), "from", "to",
        F.expr(
            "to_json(map_from_entries(array_sort(map_entries("
            "transform_values(properties, (k, v) -> array_sort(v))))))"
        ).alias("props_json"),
    ).orderBy("id")


def test_streamed_kg_equals_batch_build(spark, tmp_path):
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    # three arrival chunks with OVERLAPPING ids (the same customer seen
    # again must set-merge, not duplicate)
    src = tmp_path / "arrivals"
    customer.filter("c_custkey % 3 = 0").write.parquet(f"{src}/b0.parquet")
    customer.filter("c_custkey % 3 = 1").write.parquet(f"{src}/b1.parquet")
    customer.filter("c_custkey % 3 >= 1").write.parquet(f"{src}/b2.parquet")

    stream = (
        spark.readStream.schema(customer.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    pg_path = str(tmp_path / "pg.parquet")
    q = start_kg_stream(
        stream, _customer_mapper(), pg_path, str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    expected = triples_to_pg(
        _customer_mapper().to_triples(
            customer.filter("c_custkey % 3 >= 0")  # all rows; dup arrivals collapse
        )
    )
    assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))


def test_restarted_stream_is_idempotent(spark, tmp_path):
    """Replaying the same files through a FRESH checkpoint (worst-case
    duplicate delivery) leaves the stored PG unchanged — the idempotent
    set-merge that underwrites exactly-once."""
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").limit(20)
    src = tmp_path / "arrivals"
    customer.write.parquet(f"{src}/b0.parquet")

    pg_path = str(tmp_path / "pg.parquet")
    for attempt in range(2):  # second run re-delivers everything
        stream = (
            spark.readStream.schema(customer.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = start_kg_stream(
            stream, _customer_mapper(), pg_path, str(tmp_path / f"ck{attempt}")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    expected = triples_to_pg(_customer_mapper().to_triples(customer))
    assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))


def _bucket_files(pg_path):
    """{bucket_dir: {filename: size}} — the store's per-bucket layout."""
    import os

    out = {}
    for name in os.listdir(pg_path):
        full = os.path.join(pg_path, name)
        if name.startswith("bucket=") and os.path.isdir(full):
            out[name] = {
                f: os.path.getsize(os.path.join(full, f))
                for f in os.listdir(full)
                if not f.startswith(".")
            }
    return out


def test_delta_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The scale contract of the bucketed store: merging a tiny delta
    must rewrite only the bucket partitions the delta's ids hash into —
    per-batch write bytes track the DELTA, not the accumulated store —
    while the merged content still equals a full batch rebuild."""
    from knetminer_etl_spark.streaming.kg import merge_triples_batch

    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    mapper = _customer_mapper()
    pg_path = str(tmp_path / "pg.parquet")

    first = customer.filter("c_custkey != 1")
    delta = customer.filter("c_custkey = 1")  # a handful of element ids
    merge_triples_batch(spark, mapper.to_triples(first), pg_path, n_buckets=16, mode="inplace")
    before = _bucket_files(pg_path)
    assert len(before) > 8  # the big batch populated most buckets

    merge_triples_batch(spark, mapper.to_triples(delta), pg_path, n_buckets=16, mode="inplace")
    after = _bucket_files(pg_path)
    changed = [b for b in before if after.get(b) != before[b]]
    # one customer row maps to a handful of ids → a handful of buckets;
    # everything else must be byte-identical (same files, same sizes)
    assert 0 < len(changed) <= 6
    assert len(changed) < len(before) // 2

    expected = triples_to_pg(mapper.to_triples(customer))
    assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))

    # replayed delta (crash-recovery / duplicate delivery at the merge
    # level): idempotent — rewrites its buckets with identical content
    merge_triples_batch(spark, mapper.to_triples(delta), pg_path, n_buckets=16, mode="inplace")
    assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))


def test_corrupt_store_raises_instead_of_resetting(spark, tmp_path):
    """A real read failure must surface, not be silently treated as
    'first batch' (which would reset the accumulated store to the
    current delta); the failed merge leaves the store untouched."""
    import os

    from knetminer_etl_spark.streaming.kg import merge_triples_batch

    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    mapper = _customer_mapper()
    pg_path = str(tmp_path / "pg.parquet")

    merge_triples_batch(
        spark,
        mapper.to_triples(customer.filter("c_custkey % 2 = 0")),
        pg_path,
        n_buckets=4,
        mode="inplace",
    )
    # corrupt every bucket partition so whichever buckets the next
    # delta touches, its store read hits the corruption
    for bucket, files in _bucket_files(pg_path).items():
        for f in files:
            with open(os.path.join(pg_path, bucket, f), "w") as fh:
                fh.write("this is not parquet")
    before = _bucket_files(pg_path)
    with pytest.raises(Exception):
        merge_triples_batch(
            spark,
            mapper.to_triples(customer.filter("c_custkey % 2 = 1")),
            pg_path,
            n_buckets=4,
            mode="inplace",
        )
    # merge materializes (localCheckpoint) before writing, so the
    # failure happened before any partition was replaced
    assert _bucket_files(pg_path) == before


def _tree_bytes(root, since=None):
    import glob as g
    import os

    total = 0
    for f in g.glob(f"{root}/**/*.parquet", recursive=True):
        if since is None or os.path.getmtime(f) >= since:
            total += os.path.getsize(f)
    return total


class TestAppendModeDeltaLog:
    """mode='append' (the default): per-epoch write bytes are O(delta)
    for ANY id distribution — the guarantee hash-bucketed in-place
    merging cannot give (a 150-id uniform delta touches ~59 of 64
    buckets; measured 81% of the store rewritten — SCALE.md)."""

    def test_epoch_writes_are_delta_sized(self, spark, tmp_path):
        import time

        from knetminer_etl_spark.streaming.kg import merge_triples_batch

        customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        mapper = _customer_mapper()
        pg_path = str(tmp_path / "pg")

        bulk = customer.filter("c_custkey % 50 != 0")
        delta = customer.filter("c_custkey % 50 = 0")  # ~2% of rows
        merge_triples_batch(
            spark, mapper.to_triples(bulk), pg_path, epoch_id=0
        )
        store = _tree_bytes(pg_path)
        mark = time.time()
        merge_triples_batch(
            spark,
            mapper.to_triples(delta),
            pg_path,
            epoch_id=1,
            # keep compaction out of this epoch so the append bound is
            # what's measured (compaction cost is amortized, tested below)
            compact_threshold=10.0,
            max_delta_batches=100,
        )
        written = _tree_bytes(pg_path, since=mark)
        # a ~2% delta must not rewrite a store-sized byte volume;
        # parquet per-file overhead dominates tiny files, so allow 25%
        assert written < store * 0.25, (written, store)

        expected = triples_to_pg(mapper.to_triples(customer))
        assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))

    def test_compaction_folds_and_clears_log(self, spark, tmp_path):
        import os

        from knetminer_etl_spark.streaming.kg import (
            compact_kg,
            merge_triples_batch,
            read_kg,
        )

        customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        mapper = _customer_mapper()
        pg_path = str(tmp_path / "pg")

        for i, pred in enumerate(
            ["c_custkey % 3 = 0", "c_custkey % 3 = 1", "c_custkey % 3 >= 1"]
        ):
            merge_triples_batch(
                spark,
                mapper.to_triples(customer.filter(pred)),
                pg_path,
                epoch_id=i,
                compact_threshold=10.0,
                max_delta_batches=100,
            )
        assert os.path.isdir(f"{pg_path}/delta")
        compact_kg(spark, pg_path, n_buckets=8)
        assert not os.path.exists(f"{pg_path}/delta")
        assert os.path.isdir(f"{pg_path}/base")

        expected = triples_to_pg(mapper.to_triples(customer))
        assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))

        # post-compaction appends keep merging correctly
        merge_triples_batch(
            spark,
            mapper.to_triples(customer.filter("c_custkey % 3 = 0")),
            pg_path,
            epoch_id=3,
            compact_threshold=10.0,
            max_delta_batches=100,
        )
        assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))

    def test_replayed_epoch_overwrites_its_own_partition(self, spark, tmp_path):
        from knetminer_etl_spark.streaming.kg import merge_triples_batch

        customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").limit(30)
        mapper = _customer_mapper()
        pg_path = str(tmp_path / "pg")

        kw = dict(compact_threshold=10.0, max_delta_batches=100)
        merge_triples_batch(
            spark, mapper.to_triples(customer), pg_path, epoch_id=7, **kw
        )
        # crash-replay of the SAME epoch: batch_id=7 is overwritten, not
        # appended twice
        merge_triples_batch(
            spark, mapper.to_triples(customer), pg_path, epoch_id=7, **kw
        )
        got = read_kg(spark, pg_path)
        expected = triples_to_pg(mapper.to_triples(customer))
        assertDataFrameEqual(_canon(got), _canon(expected))

    def test_unepoched_appends_never_overwrite_each_other(self, spark, tmp_path):
        """A non-streaming caller omitting epoch_id must APPEND to the
        delta log (next free batch_id), not dynamic-overwrite slot 0 and
        silently drop the prior uncompacted delta."""
        from knetminer_etl_spark.streaming.kg import merge_triples_batch

        customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").limit(60)
        mapper = _customer_mapper()
        pg_path = str(tmp_path / "pg")

        kw = dict(compact_threshold=10.0, max_delta_batches=100)
        for pred in ["c_custkey % 3 = 0", "c_custkey % 3 = 1", "c_custkey % 3 = 2"]:
            merge_triples_batch(
                spark, mapper.to_triples(customer.filter(pred)), pg_path, **kw
            )
        expected = triples_to_pg(mapper.to_triples(customer))
        assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))

        # and un-epoched merges interleave safely with epoched ones:
        # the auto id continues past the explicit one
        merge_triples_batch(
            spark,
            mapper.to_triples(customer.filter("c_custkey % 3 = 0")),
            pg_path,
            epoch_id=50,
            **kw,
        )
        merge_triples_batch(
            spark, mapper.to_triples(customer.filter("c_custkey % 3 = 1")), pg_path, **kw
        )
        assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))

    def test_auto_compaction_triggers_on_batch_count(self, spark, tmp_path):
        import os

        from knetminer_etl_spark.streaming.kg import merge_triples_batch

        customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").limit(40)
        mapper = _customer_mapper()
        pg_path = str(tmp_path / "pg")

        for i in range(3):
            merge_triples_batch(
                spark,
                mapper.to_triples(customer.filter(f"c_custkey % 3 = {i}")),
                pg_path,
                epoch_id=i,
                compact_threshold=1e9,  # never by bytes
                max_delta_batches=3,  # ...but by count on the 3rd epoch
            )
        assert not os.path.exists(f"{pg_path}/delta")  # log folded
        expected = triples_to_pg(mapper.to_triples(customer))
        assertDataFrameEqual(_canon(read_kg(spark, pg_path)), _canon(expected))
