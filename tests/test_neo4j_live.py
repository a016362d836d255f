"""Live-Neo4j parity tests (the reference's testcontainers suite,
ref tests/conftest.py:53-93 + tests/ketl/io/neoloader/test_neoloader.py).

Selection: ``pytest -m integration``. A database is found via, in order:

1. ``NEO4J_URI`` (+ optional ``NEO4J_USER`` / ``NEO4J_PASSWORD`` /
   ``NEO4J_DATABASE``) pointing at a running instance, or
2. ``testcontainers.neo4j.Neo4jContainer`` if the package and a Docker
   daemon are available.

Without either — or without the ``neo4j`` driver — every test here
SKIPS (never fails): the deterministic loader behavior is covered
DB-free by test_neo4j_fake_integration.py; this module only proves the
socket path.

One-shot recipe (any machine with Docker; this build sandbox has the
docker CLI but no daemon and no ``neo4j`` package, so the suite has
not executed here — CI runs it via the ``neo4j-live`` service-container
job in .github/workflows/ci.yml):

    docker run -d --name neo4j-live -p 7687:7687 \
        -e NEO4J_AUTH=neo4j/testpassword neo4j:5
    pip install 'neo4j>=5'
    NEO4J_URI=bolt://localhost:7687 NEO4J_USER=neo4j \
        NEO4J_PASSWORD=testpassword \
        python -m pytest tests/test_neo4j_live.py -q -m integration
    docker rm -f neo4j-live
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import knetminer_etl_spark.io.neo4j as N
from knetminer_etl_spark.core.model import PG_SCHEMA

pytestmark = pytest.mark.integration

neo4j_driver = pytest.importorskip(
    "neo4j", reason="neo4j Python driver not installed"
)


@pytest.fixture(scope="module")
def live_config():
    """Neo4jConfig for a reachable database, else skip."""
    uri = os.environ.get("NEO4J_URI")
    if uri:
        cfg = N.Neo4jConfig(
            uri=uri,
            user=os.environ.get("NEO4J_USER", "neo4j"),
            password=os.environ.get("NEO4J_PASSWORD", ""),
            database=os.environ.get("NEO4J_DATABASE", "neo4j"),
        )
        _ping_or_skip(cfg)
        yield cfg
        return
    try:
        from testcontainers.neo4j import Neo4jContainer
    except ImportError:
        pytest.skip("no NEO4J_URI and testcontainers not installed")
    try:
        container = Neo4jContainer("neo4j:5")
        container.start()
    except Exception as e:  # docker missing/unreachable
        pytest.skip(f"could not start Neo4j container: {e}")
    try:
        cfg = N.Neo4jConfig(
            uri=container.get_connection_url(),
            user="neo4j",
            password=container.password,
        )
        _ping_or_skip(cfg)
        yield cfg
    finally:
        container.stop()


def _ping_or_skip(cfg: N.Neo4jConfig) -> None:
    try:
        driver = neo4j_driver.GraphDatabase.driver(
            cfg.uri, auth=(cfg.user, cfg.password)
        )
        driver.verify_connectivity()
        driver.close()
    except Exception as e:
        pytest.skip(f"Neo4j at {cfg.uri} unreachable: {e}")


@pytest.fixture()
def clean_db(live_config):
    _run(live_config, "MATCH (n) DETACH DELETE n")
    yield live_config


def _run(cfg: N.Neo4jConfig, cypher: str, **params):
    driver = neo4j_driver.GraphDatabase.driver(
        cfg.uri, auth=(cfg.user, cfg.password)
    )
    try:
        with driver.session(database=cfg.database) as s:
            return [r.data() for r in s.run(cypher, **params)]
    finally:
        driver.close()


def _pg_df(spark):
    rows = [
        ("G1", "node", ["Gene"], None, None,
         {"name": ['"gene one"'], "alias": ['"g1a"', '"g1b"']}),
        ("G2", "node", ["Gene", "Marker"], None, None,
         {"name": ['"gene two"'], "score": ["2.5"]}),
        ("P1", "node", ["Protein"], None, None, {}),
        ("encodes:G1-P1", "edge", ["encodes"], "G1", "P1",
         {"evidence": ['"exp"']}),
        ("regulates:G1-G2", "edge", ["regulates"], "G1", "G2", {}),
    ]
    return spark.createDataFrame(rows, PG_SCHEMA)


class TestLiveLoad:
    def test_load_and_readback(self, spark, clean_db):
        N.load_pg_to_neo4j(_pg_df(spark), clean_db, write_partitions=2)

        nodes = _run(
            clean_db,
            "MATCH (n:Node) RETURN n.id AS id, labels(n) AS labels, "
            "properties(n) AS props ORDER BY id",
        )
        assert [n["id"] for n in nodes] == ["G1", "G2", "P1"]
        by_id = {n["id"]: n for n in nodes}
        assert set(by_id["G2"]["labels"]) == {"Node", "Gene", "Marker"}
        assert by_id["G1"]["props"]["name"] == "gene one"
        assert sorted(by_id["G1"]["props"]["alias"]) == ["g1a", "g1b"]
        assert by_id["G2"]["props"]["score"] == 2.5

        rels = _run(
            clean_db,
            "MATCH (a)-[e]->(b) RETURN type(e) AS t, a.id AS f, b.id AS to, "
            "e.id AS id ORDER BY id",
        )
        assert [(r["t"], r["f"], r["to"]) for r in rels] == [
            ("encodes", "G1", "P1"),
            ("regulates", "G1", "G2"),
        ]

    def test_scale_smoke(self, spark, clean_db):
        """25k nodes + 50k edges (ref test_neoloader.py:464-530)."""
        n_nodes, n_edges = 25_000, 50_000
        nodes = spark.range(n_nodes).select(
            F.concat(F.lit("N"), "id").alias("id"),
            F.lit("node").alias("type"),
            F.array(F.lit("Thing")).alias("labels"),
            F.lit(None).cast("string").alias("from"),
            F.lit(None).cast("string").alias("to"),
            F.create_map(
                F.lit("k"), F.array((F.col("id") % 97).cast("string"))
            ).alias("properties"),
        )
        edges = spark.range(n_edges).select(
            F.concat(F.lit("E"), "id").alias("id"),
            F.lit("edge").alias("type"),
            F.array(F.lit("linksTo")).alias("labels"),
            F.concat(F.lit("N"), F.col("id") % n_nodes).alias("from"),
            F.concat(F.lit("N"), (F.col("id") * 7 + 1) % n_nodes).alias("to"),
            F.lit(None)
            .cast("map<string,array<string>>")
            .alias("properties"),
        )
        N.load_pg_to_neo4j(
            nodes.unionByName(edges), clean_db, write_partitions=4
        )
        got_n = _run(clean_db, "MATCH (n:Node) RETURN count(n) AS n")[0]["n"]
        got_e = _run(clean_db, "MATCH ()-[e]->() RETURN count(e) AS n")[0]["n"]
        assert (got_n, got_e) == (n_nodes, n_edges)

    def test_done_file_resume(self, spark, clean_db, tmp_path):
        base = tmp_path / "load"
        N.load_pg_to_neo4j(
            _pg_df(spark), clean_db, write_partitions=2, done_base_path=base
        )
        # re-run with both markers present: nothing may duplicate
        N.load_pg_to_neo4j(
            _pg_df(spark), clean_db, write_partitions=2, done_base_path=base
        )
        n = _run(clean_db, "MATCH (n:Node) RETURN count(n) AS n")[0]["n"]
        assert n == 3

    def test_single_mode_raises_on_multivalue(self, spark, clean_db):
        cfg = N.Neo4jConfig(
            uri=clean_db.uri,
            user=clean_db.user,
            password=clean_db.password,
            database=clean_db.database,
            property_configs={
                "alias": N.PropertyConfig(N.MultiValueMode.SINGLE)
            },
        )
        with pytest.raises(Exception, match="alias"):
            N.load_pg_to_neo4j(_pg_df(spark), cfg, write_partitions=1)
