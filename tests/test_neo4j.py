"""Neo4j loader: Cypher builders, parameter conversion, batching, retry —
all pure-Python (no database, no driver required)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from knetminer_etl_spark.io import neo4j as N


class TestCypher:
    def test_node_cypher_labels(self):
        cy = N.node_batch_cypher_no_apoc("Node", ["Gene", "weird label"])
        assert "CREATE (n:Node:Gene:`weird label`)" in cy
        assert "UNWIND $batch" in cy

    def test_edge_cypher_fails_on_dangling(self):
        cy = N.edge_batch_cypher("Node", "encodes")
        assert "OPTIONAL MATCH" in cy and "1/0" in cy
        assert "CREATE (a)-[e:encodes]->(b)" in cy

    def test_index_cypher(self):
        assert "CREATE INDEX" in N.id_index_cypher("Node")


class TestParams:
    def row(self, **kw):
        base = {
            "id": "N1",
            "type": "node",
            "labels": ["Gene"],
            "from": None,
            "to": None,
            "properties": {"name": ['"TP53"'], "syn": ['"a"', '"b"'], "len": ["42"]},
        }
        base.update(kw)
        return Row(**base)

    def test_values_unserialized_and_cardinality(self):
        p = N.pg_row_to_params(self.row())
        assert p["properties"]["name"] == "TP53"  # singleton collapses
        assert sorted(p["properties"]["syn"]) == ["a", "b"]
        assert p["properties"]["len"] == 42
        assert "from" not in p

    def test_edge_endpoints_present(self):
        p = N.pg_row_to_params(
            self.row(type="edge", **{"from": "A", "to": "B"})
        )
        assert p["from"] == "A" and p["to"] == "B"


class TestBatchingRetry:
    def test_batched(self):
        got = list(N.batched(range(7), 3))
        assert got == [[0, 1, 2], [3, 4, 5], [6]]

    def test_retry_transient_then_success(self):
        calls = []

        class TransientBoom(Exception):
            pass

        def fn():
            calls.append(1)
            if len(calls) < 3:
                raise TransientBoom("collision")
            return "ok"

        out = N.run_with_retry(
            fn, max_retries=5, base_pause_s=0, sleep=lambda s: None
        )
        assert out == "ok" and len(calls) == 3

    def test_retry_gives_up_on_permanent(self):
        def fn():
            raise ValueError("permanent")

        with pytest.raises(ValueError):
            N.run_with_retry(fn, max_retries=5, sleep=lambda s: None)

    def test_loader_requires_driver(self, spark):
        df = spark.createDataFrame([], "id string, type string, labels array<string>, from string, to string, properties map<string,array<string>>")
        with pytest.raises(ImportError):
            N.load_pg_to_neo4j(df, N.Neo4jConfig())


class TestCLI:
    def test_parser(self):
        from knetminer_etl_spark.io.neo4j_cli import build_parser

        a = build_parser().parse_args(
            ["/data/pg", "--uri", "bolt://h:7687", "--nodes-only", "--batch-size", "100"]
        )
        assert a.source == "/data/pg" and a.batch_size == 100 and a.nodes_only

    def test_nodes_and_edges_exclusive(self):
        from knetminer_etl_spark.io.neo4j_cli import build_parser

        import pytest as _pytest

        with _pytest.raises(SystemExit):
            build_parser().parse_args(["x", "--nodes-only", "--edges-only"])
