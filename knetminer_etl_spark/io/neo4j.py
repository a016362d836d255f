"""PG → Neo4j bulk loader.

Parity surface for the reference's async JSONL→Neo4j loader (reference
src/ketl/io/neoloader.py:226-560): batched ``UNWIND`` Cypher, nodes
before edges, an id index created between the passes, dangling-endpoint
failure, bounded retries on transient collisions.

Spark-first shape: the loader consumes the **PG DataFrame** directly with
``foreachPartition`` — each partition opens one session and writes its
rows in ``batch_size`` transactions. Two passes (nodes, then edges)
preserve the reference's ordering contract; concurrency = partition
count, so co-locate/repartition to tune parallel write pressure (Neo4j
lock collisions rise with concurrency — keep modest, e.g. 8-16).

The ``neo4j`` driver is not installed in this environment: connection
construction is gated behind an import-try, while Cypher/batch building
are pure functions, unit-tested without a database.
"""

from __future__ import annotations

import itertools
import time
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from ..core.model import PGElementType
from ..core.serialize import DEFAULT_CONVERTER, ValueConverter

DEFAULT_BATCH_SIZE = 2500  # elements per transaction (reference default)
DEFAULT_MAX_RETRIES = 10


@dataclass
class Neo4jConfig:
    uri: str = "bolt://localhost:7687"
    user: str = "neo4j"
    password: str = ""
    database: str = "neo4j"
    batch_size: int = DEFAULT_BATCH_SIZE
    max_retries: int = DEFAULT_MAX_RETRIES
    retry_base_pause_s: float = 2.0
    common_label: str = "Node"  # shared label enabling the id index
    extra: dict[str, Any] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# Cypher builders (pure, unit-testable)
# ---------------------------------------------------------------------------


def node_batch_cypher(common_label: str = "Node") -> str:
    """UNWIND-create for node batches. Labels are applied dynamically;
    every node also gets the common label so one index accelerates the
    edge pass."""
    return (
        "UNWIND $batch AS row\n"
        f"CREATE (n:{common_label})\n"
        "SET n = row.properties, n.id = row.id\n"
        "WITH n, row CALL apoc.create.addLabels(n, row.labels) YIELD node\n"
        "RETURN count(node)"
    )


def node_batch_cypher_no_apoc(common_label: str, labels: list[str]) -> str:
    """APOC-free variant for a batch that shares one label set (batches
    are grouped by label signature)."""
    label_frag = "".join(
        ":" + _quote_label(l) for l in [common_label, *labels]
    )
    return (
        "UNWIND $batch AS row\n"
        f"CREATE (n{label_frag})\n"
        "SET n = row.properties, n.id = row.id\n"
        "RETURN count(n)"
    )


def edge_batch_cypher(common_label: str, rel_type: str) -> str:
    """UNWIND-create for edge batches of one relationship type. Dangling
    endpoints make the coalesce fail the query (division by the matched
    node) — load stops rather than silently dropping edges."""
    return (
        "UNWIND $batch AS row\n"
        f"OPTIONAL MATCH (a:{_quote_label(common_label)} {{id: row.from}})\n"
        f"OPTIONAL MATCH (b:{_quote_label(common_label)} {{id: row.to}})\n"
        "WITH a, b, row, CASE WHEN a IS NULL OR b IS NULL THEN 1/0 ELSE 1 END AS _chk\n"
        f"CREATE (a)-[e:{_quote_label(rel_type)}]->(b)\n"
        "SET e = row.properties, e.id = row.id\n"
        "RETURN count(e)"
    )


def id_index_cypher(common_label: str = "Node") -> str:
    return (
        f"CREATE INDEX pg_id_idx IF NOT EXISTS "
        f"FOR (n:{_quote_label(common_label)}) ON (n.id)"
    )


def _quote_label(label: str) -> str:
    if not label.replace("_", "").isalnum():
        return "`" + label.replace("`", "") + "`"
    return label


# ---------------------------------------------------------------------------
# Row → parameter conversion + batching (pure)
# ---------------------------------------------------------------------------


def pg_row_to_params(
    row: Any, converters: dict[str, ValueConverter] | None = None
) -> dict[str, Any]:
    """PG Row → Cypher parameter map; property value-sets unserialize to
    native types, single-element sets collapse to scalars (the loader's
    'auto' cardinality mode)."""
    convs = converters or {}
    props: dict[str, Any] = {}
    for pk, vals in (row["properties"] or {}).items():
        conv = convs.get(pk, DEFAULT_CONVERTER)
        native = [conv.unserialize(v) for v in vals]
        props[pk] = native[0] if len(native) == 1 else native
    out = {
        "id": row["id"],
        "labels": sorted(row["labels"] or []),
        "properties": props,
    }
    if row["type"] == str(PGElementType.EDGE):
        out["from"] = row["from"]
        out["to"] = row["to"]
    return out


def batched(it: Iterable[Any], size: int) -> Iterator[list[Any]]:
    it = iter(it)
    while True:
        chunk = list(itertools.islice(it, size))
        if not chunk:
            return
        yield chunk


def run_with_retry(
    fn: Callable[[], Any],
    max_retries: int = DEFAULT_MAX_RETRIES,
    base_pause_s: float = 2.0,
    is_transient: Callable[[Exception], bool] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Bounded exponential-ish retry for transient tx collisions."""
    transient = is_transient or (lambda e: "Transient" in type(e).__name__)
    for attempt in range(max_retries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - classified below
            if attempt == max_retries - 1 or not transient(e):
                raise
            sleep(min(base_pause_s * (2**attempt), 120.0))
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# Spark-side loader
# ---------------------------------------------------------------------------


def _require_driver():
    try:
        import neo4j  # noqa: F401

        return neo4j
    except ImportError as e:  # pragma: no cover - driver absent here
        raise ImportError(
            "the 'neo4j' Python driver is required for load_pg_to_neo4j; "
            "Cypher/batching helpers work without it"
        ) from e


def load_pg_to_neo4j(
    pg: DataFrame,
    config: Neo4jConfig,
    write_partitions: int = 8,
) -> None:
    """Two-pass PG load: nodes (repartitioned to bound write concurrency),
    id index, then edges grouped by relationship type.

    Each executor partition opens one driver session; batches of
    ``config.batch_size`` per transaction with transient-error retry.
    """
    _require_driver()  # fail fast on the driver before launching jobs

    edge_t = str(PGElementType.EDGE)
    nodes = pg.filter(pg["type"] != edge_t).repartition(write_partitions)
    edges = pg.filter(pg["type"] == edge_t).repartition(write_partitions)

    def write_pass(rows: Iterator[Any], is_edges: bool) -> None:
        neo4j = _require_driver()
        driver = neo4j.GraphDatabase.driver(
            config.uri, auth=(config.user, config.password)
        )
        try:
            with driver.session(database=config.database) as session:
                for batch in batched(rows, config.batch_size):
                    params = [pg_row_to_params(r) for r in batch]
                    if is_edges:
                        # per-type sub-batches (rel type is structural)
                        bytype: dict[str, list] = {}
                        for p in params:
                            rel = (p["labels"] or ["RELATED"])[0]
                            bytype.setdefault(rel, []).append(p)
                        for rel, sub in bytype.items():
                            cy = edge_batch_cypher(config.common_label, rel)
                            run_with_retry(
                                lambda: session.execute_write(
                                    lambda tx: tx.run(cy, batch=sub).consume()
                                ),
                                config.max_retries,
                                config.retry_base_pause_s,
                            )
                    else:
                        bylabels: dict[tuple, list] = {}
                        for p in params:
                            bylabels.setdefault(tuple(p["labels"]), []).append(p)
                        for labels, sub in bylabels.items():
                            cy = node_batch_cypher_no_apoc(
                                config.common_label, list(labels)
                            )
                            run_with_retry(
                                lambda: session.execute_write(
                                    lambda tx: tx.run(cy, batch=sub).consume()
                                ),
                                config.max_retries,
                                config.retry_base_pause_s,
                            )
        finally:
            driver.close()

    nodes.foreachPartition(lambda rows: write_pass(rows, False))

    # index between passes so edge MATCHes are O(log n)
    neo4j = _require_driver()
    driver = neo4j.GraphDatabase.driver(config.uri, auth=(config.user, config.password))
    try:
        with driver.session(database=config.database) as session:
            session.run(id_index_cypher(config.common_label)).consume()
    finally:
        driver.close()

    edges.foreachPartition(lambda rows: write_pass(rows, True))
