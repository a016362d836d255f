"""End-to-end loader integration against the behavioral fake driver
(tests/resources/fake_neo4j_module.py): the full
:func:`load_pg_to_neo4j` path — Spark ``foreachPartition`` jobs, real
executor processes, UNWIND batching, two-pass ordering, retry, done-file
resume — everything the reference proves with testcontainers
(ref tests/ketl/io/neoloader/test_neoloader.py:34-787) except the
socket. Live-database parity tests are in test_neo4j_live.py (marked
``integration``; skip without a reachable DB)."""

from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

import knetminer_etl_spark.io.neo4j as N
from knetminer_etl_spark.core.model import PG_SCHEMA

RESOURCE = Path(__file__).parent / "resources" / "fake_neo4j_module.py"


@pytest.fixture(scope="session")
def fake_driver(spark, tmp_path_factory):
    """Install the fake ``neo4j`` module for the driver (sys.path) and
    every executor (addPyFile); yields nothing — state flows through the
    per-test record directory in the fake:// uri."""
    moddir = tmp_path_factory.mktemp("fake_neo4j")
    shutil.copy(RESOURCE, moddir / "neo4j.py")
    spark.sparkContext.addPyFile(str(moddir / "neo4j.py"))
    sys.path.insert(0, str(moddir))
    sys.modules.pop("neo4j", None)
    yield
    sys.path.remove(str(moddir))
    sys.modules.pop("neo4j", None)


def _records(dirpath: Path) -> list[dict]:
    recs = []
    for f in sorted(dirpath.glob("records_*.jsonl")):
        recs.extend(json.loads(l) for l in f.read_text().splitlines())
    return recs


def _pg_df(spark):
    rows = [
        ("G1", "node", ["Gene"], None, None, {"name": ['"gene one"'], "alias": ['"g1a"', '"g1b"']}),
        ("G2", "node", ["Gene", "Marker"], None, None, {"name": ['"gene two"'], "score": ["2.5"]}),
        ("P1", "node", ["Protein"], None, None, {}),
        ("encodes:G1-P1", "edge", ["encodes"], "G1", "P1", {"evidence": ['"exp"']}),
        ("encodes:G2-P1", "edge", ["encodes"], "G2", "P1", {}),
        ("regulates:G1-G2", "edge", ["regulates"], "G1", "G2", {"weight": ["0.7"]}),
    ]
    return spark.createDataFrame(rows, PG_SCHEMA)


def _load(spark, pg, dirpath: Path, **kwargs):
    cfg = N.Neo4jConfig(uri=f"fake://{dirpath}", batch_size=2, common_label="Node")
    N.load_pg_to_neo4j(pg, cfg, write_partitions=3, **kwargs)
    return cfg


class TestRoundTrip:
    def test_nodes_edges_and_index(self, spark, fake_driver, tmp_path):
        pg = _pg_df(spark)
        _load(spark, pg, tmp_path)
        recs = _records(tmp_path)

        # index created exactly once, on the common label
        idx = [r for r in recs if r["kind"] == "index"]
        assert len(idx) == 1 and "FOR (n:Node) ON (n.id)" in idx[0]["cypher"]

        # reconstruct the graph from the recorded UNWIND batches
        nodes = {}
        for r in recs:
            if r["kind"] == "nodes":
                for row in r["batch"]:
                    nodes[row["id"]] = (tuple(r["labels"]), row["properties"])
        edges = {}
        for r in recs:
            if r["kind"] == "edges":
                for row in r["batch"]:
                    edges[row["id"]] = (r["rel_type"], row["from"], row["to"], row["properties"])

        assert set(nodes) == {"G1", "G2", "P1"}
        # common label + sorted element labels, batches grouped by signature
        assert nodes["G1"][0] == ("Node", "Gene")
        assert nodes["G2"][0] == ("Node", "Gene", "Marker")
        # AUTO multi-value: singleton collapses, multi stays a deduped list
        assert nodes["G1"][1] == {"name": "gene one", "alias": ["g1a", "g1b"]}
        assert nodes["G2"][1] == {"name": "gene two", "score": 2.5}
        assert nodes["P1"][1] == {}

        assert edges == {
            "encodes:G1-P1": ("encodes", "G1", "P1", {"evidence": "exp"}),
            "encodes:G2-P1": ("encodes", "G2", "P1", {}),
            "regulates:G1-G2": ("regulates", "G1", "G2", {"weight": 0.7}),
        }

    def test_scale_smoke_counts_and_batching(self, spark, fake_driver, tmp_path):
        """25k nodes + 50k edges through the real executor path (the
        reference's scale smoke, ref test_neoloader.py:464-530)."""
        n_nodes, n_edges = 25_000, 50_000
        nodes = spark.range(n_nodes).select(
            F.concat(F.lit("N"), "id").alias("id"),
            F.lit("node").alias("type"),
            F.array(F.lit("Thing")).alias("labels"),
            F.lit(None).cast("string").alias("from"),
            F.lit(None).cast("string").alias("to"),
            F.create_map(
                F.lit("k"), F.array(F.concat(F.lit('"v'), "id", F.lit('"')))
            ).alias("properties"),
        )
        edges = spark.range(n_edges).select(
            F.concat(F.lit("E"), "id").alias("id"),
            F.lit("edge").alias("type"),
            F.array(F.lit("linksTo")).alias("labels"),
            F.concat(F.lit("N"), F.col("id") % n_nodes).alias("from"),
            F.concat(F.lit("N"), (F.col("id") * 7 + 1) % n_nodes).alias("to"),
            F.create_map(F.lit("w"), F.array((F.col("id") % 100).cast("string"))).alias("properties"),
        )
        pg = nodes.unionByName(edges)
        cfg = N.Neo4jConfig(uri=f"fake://{tmp_path}", batch_size=2500)
        N.load_pg_to_neo4j(pg, cfg, write_partitions=4)

        recs = _records(tmp_path)
        got_nodes = sum(len(r["batch"]) for r in recs if r["kind"] == "nodes")
        got_edges = sum(len(r["batch"]) for r in recs if r["kind"] == "edges")
        assert (got_nodes, got_edges) == (n_nodes, n_edges)
        # transactions bounded by batch_size, and batching actually used
        # (not row-at-a-time): every batch is full except at most one
        # per (partition, label-signature) tail
        sizes = [len(r["batch"]) for r in recs if r["kind"] in ("nodes", "edges")]
        assert max(sizes) <= 2500
        assert sum(1 for s in sizes if s < 2500) <= 2 * 4  # tails only

    def test_dangling_endpoint_fails_load(self, spark, fake_driver, tmp_path):
        pg = _pg_df(spark).unionByName(
            spark.createDataFrame(
                [("bad:G1-ZZ", "edge", ["bad"], "G1", "ZZ", {})], PG_SCHEMA
            )
        )
        with pytest.raises(Exception, match="dangling|1/0"):
            _load(spark, pg, tmp_path)


class TestResume:
    def test_done_markers_skip_completed_passes(self, spark, fake_driver, tmp_path):
        pg = _pg_df(spark)
        base = tmp_path / "load"
        _load(spark, pg, tmp_path, done_base_path=base)
        assert (tmp_path / "load.nodes").exists()
        assert (tmp_path / "load.edges").exists()

        # wipe the record dir, re-run: both passes must be skipped —
        # a re-CREATE would duplicate every element
        for f in tmp_path.glob("records_*.jsonl"):
            f.unlink()
        _load(spark, pg, tmp_path, done_base_path=base)
        kinds = {r["kind"] for r in _records(tmp_path)}
        assert kinds == {"index"}  # index re-create is idempotent (IF NOT EXISTS)

    def test_partial_resume_runs_only_missing_pass(self, spark, fake_driver, tmp_path):
        """Crash between the passes: nodes committed (marker written),
        edges not — the re-run must skip nodes and run edges."""
        pg = _pg_df(spark)
        base = tmp_path / "load"
        _load(spark, pg, tmp_path)  # seed node records for endpoint checks
        before = _records(tmp_path)
        n_node_recs = sum(1 for r in before if r["kind"] == "nodes")
        n_edge_recs = sum(1 for r in before if r["kind"] == "edges")
        N.write_done_marker(base, is_nodes=True, source="crash-test")

        _load(spark, pg, tmp_path, done_base_path=base)
        after = _records(tmp_path)
        assert sum(1 for r in after if r["kind"] == "nodes") == n_node_recs
        assert sum(1 for r in after if r["kind"] == "edges") == 2 * n_edge_recs
        assert (tmp_path / "load.edges").exists()


class TestRetry:
    def test_transient_failures_are_retried_executor_side(self, spark, fake_driver, tmp_path):
        (tmp_path / "INJECT_TRANSIENT").touch()
        pg = _pg_df(spark)
        _load(spark, pg, tmp_path)  # must succeed despite injected failures

        attempts = (tmp_path / "transient_attempts.log").read_text().splitlines()
        assert attempts, "no transient failure was ever injected"
        # the load is still complete and exactly-once per element
        recs = _records(tmp_path)
        node_ids = [row["id"] for r in recs if r["kind"] == "nodes" for row in r["batch"]]
        edge_ids = [row["id"] for r in recs if r["kind"] == "edges" for row in r["batch"]]
        assert sorted(node_ids) == ["G1", "G2", "P1"]
        assert len(edge_ids) == 3 == len(set(edge_ids))
