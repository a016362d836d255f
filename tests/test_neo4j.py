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


class TestMultiValueMode:
    """Parity with reference MultiValueMode semantics (ref
    src/ketl/io/neoloader.py:56-93,770-815; tests
    tests/ketl/io/neoloader/test_neoloader.py:246-385)."""

    def _cfg(self, **modes):
        return N.Neo4jConfig(
            property_configs={
                k: N.PropertyConfig(multi_value_mode=N.MultiValueMode(v))
                for k, v in modes.items()
            }
        )

    def test_auto_default(self):
        assert N.coerce_property_values("p", "e", ["x"]) == "x"
        assert N.coerce_property_values("p", "e", ["x", "y", "x"]) == ["x", "y"]

    def test_single_collapses_and_raises(self):
        cfg = self._cfg(p="single")
        assert N.coerce_property_values("p", "e", ["x"], cfg) == "x"
        with pytest.raises(ValueError, match="multiple values aren't allowed"):
            N.coerce_property_values("p", "e", ["x", "y"], cfg)

    def test_multiple_always_list(self):
        cfg = self._cfg(p="multiple")
        assert N.coerce_property_values("p", "e", ["x"], cfg) == ["x"]
        assert N.coerce_property_values("p", "e", [3, 3, 1], cfg) == [3, 1]

    def test_none_elements_dropped_and_empty_omitted(self):
        assert N.coerce_property_values("p", "e", [None]) is None
        assert N.coerce_property_values("p", "e", []) is None
        assert N.coerce_property_values("p", "e", [None, "x"]) == "x"

    def test_unhashable_values_dedup_by_serialization(self):
        cfg = self._cfg(p="multiple")
        got = N.coerce_property_values(
            "p", "e", [[1, 2], [1, 2], [3, 4]], cfg
        )
        assert got == [[1, 2], [3, 4]]

    def test_non_list_raises(self):
        with pytest.raises(ValueError, match="non-list"):
            N.coerce_property_values("p", "e", "scalar")  # type: ignore[arg-type]

    def test_row_params_honor_config(self):
        row = Row(
            id="N1",
            type="node",
            labels=["Gene"],
            **{"from": None, "to": None},
            properties={"syn": ['"a"', '"b"'], "name": ['"TP53"']},
        )
        cfg = self._cfg(name="multiple", syn="single")
        with pytest.raises(ValueError):
            N.pg_row_to_params(row, config=cfg)
        cfg2 = self._cfg(name="multiple")
        p = N.pg_row_to_params(row, config=cfg2)
        assert p["properties"]["name"] == ["TP53"]  # forced list
        assert sorted(p["properties"]["syn"]) == ["a", "b"]

    def test_property_config_from_config(self):
        pc = N.PropertyConfig.from_config({"multi_value_mode": "multiple"})
        assert pc.multi_value_mode is N.MultiValueMode.MULTIPLE
        assert N.PropertyConfig.from_config(None).multi_value_mode is N.MultiValueMode.AUTO


class TestDoneMarkers:
    """Crash-resume markers (ref src/ketl/io/neoloader.py:448-490; tests
    tests/ketl/io/neoloader/test_neoloader.py:464-587)."""

    def test_paths_and_suffix_strip(self, tmp_path):
        n, e = N.done_marker_paths(tmp_path / "load")
        assert n.name == "load.nodes" and e.name == "load.edges"
        # a base already carrying a pass suffix is stripped first
        n2, e2 = N.done_marker_paths(tmp_path / "load.nodes")
        assert (n2, e2) == (n, e)

    def test_plan_passes_skips_done(self, tmp_path):
        base = tmp_path / "load"
        assert N.plan_passes(None) == (True, True)
        assert N.plan_passes(base) == (True, True)
        N.write_done_marker(base, is_nodes=True, source="src.jsonl")
        assert N.plan_passes(base) == (False, True)
        N.write_done_marker(base, is_nodes=False)
        assert N.plan_passes(base) == (False, False)
        assert "src.jsonl" in (tmp_path / "load.nodes").read_text()


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
