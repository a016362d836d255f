"""CLI for the PG-JSONL → Neo4j bulk load (reference parity:
src/ketl/io/neoloader.py:635-742 exposes the same operation as a console
command).

    python -m knetminer_etl_spark.io.neo4j_cli pg-jsonl-dir \
        --uri bolt://host:7687 --user neo4j --password ... \
        [--nodes-only | --edges-only] [--batch-size 2500]

Reads the JSONL through the engine's schema'd Spark source and streams it
into Neo4j with the two-pass loader. Requires the ``neo4j`` driver.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="knetminer-etl-spark-neoload",
        description="Bulk-load PG-JSONL into Neo4j (nodes pass, id index, edges pass).",
    )
    p.add_argument("source", help="PG-JSONL file/dir/glob")
    p.add_argument("--uri", default="bolt://localhost:7687")
    p.add_argument("--user", default="neo4j")
    p.add_argument("--password", default="")
    p.add_argument("--database", default="neo4j")
    p.add_argument("--batch-size", type=int, default=2500)
    p.add_argument("--max-retries", type=int, default=10)
    p.add_argument("--write-partitions", type=int, default=8)
    g = p.add_mutually_exclusive_group()
    g.add_argument("--nodes-only", action="store_true")
    g.add_argument("--edges-only", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from ..pg.jsonl import read_pg_jsonl
    from ..runtime import get_session
    from .neo4j import Neo4jConfig, _require_driver, load_pg_to_neo4j

    _require_driver()  # fail before starting a Spark session

    config = Neo4jConfig(
        uri=args.uri,
        user=args.user,
        password=args.password,
        database=args.database,
        batch_size=args.batch_size,
        max_retries=args.max_retries,
    )
    spark = get_session(app_name="pg-jsonl-neo-load")
    pg = read_pg_jsonl(spark, args.source)
    if args.nodes_only:
        pg = pg.filter(pg["type"] != "edge")
    elif args.edges_only:
        pg = pg.filter(pg["type"] == "edge")
    load_pg_to_neo4j(pg, config, write_partitions=args.write_partitions)
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
