"""Stage library + CLI for the external-orchestrator e2e sample.

Each stage is the body of one workflow rule (the reference's
tabmap-test.snakefile:29-144 contract): inputs/outputs are exchanged
ONLY through the filesystem — Parquet checkpoints addressed by their
``_SUCCESS`` check path (runtime.checkpoint.df_check_path) or final
JSONL files — so ANY engine that sequences shell commands (Snakemake,
Make, Airflow, a plain loop) can drive the pipeline. Run as

    python tabmap_stages.py <stage> <in...> <out>

each invocation builds its OWN SparkSession and exits: stages prove the
cross-process contract, not a shared-session shortcut.
"""

from __future__ import annotations

import sys

from knetminer_etl_spark import (
    AUTO_EDGE_ID,
    TabFileMapper,
    column_triple_mapper,
    constant_triple_mapper,
    edge_source_triple_mapper,
    edge_target_triple_mapper,
    triples_to_pg,
    type_triple_mapper,
    write_pg_jsonl_single,
)
from knetminer_etl_spark.runtime import checkpoint, get_session


def _spark():
    s = get_session(
        app_name="tabmap-stage",
        master="local[2]",
        conf={
            "spark.sql.shuffle.partitions": "2",
            "spark.ui.enabled": "false",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


GENES_MAPPER = TabFileMapper(
    "accession",
    [
        column_triple_mapper("name", "hasGeneName"),
        column_triple_mapper("accession", "hasAccession"),
        column_triple_mapper("chromosome", "hasChromosomeId"),
        column_triple_mapper("begin", "hasChromosomeBegin"),
        column_triple_mapper("end", "hasChromosomeEnd"),
    ],
    [
        type_triple_mapper("Gene"),
        constant_triple_mapper("source", "OrchestratorTest"),
    ],
    column_types={"begin": "int", "end": "int"},
)

PROTEINS_MAPPER = TabFileMapper(
    "accession",
    [
        column_triple_mapper("name", "hasProteinName"),
        column_triple_mapper("accession", "hasAccession"),
    ],
    [
        type_triple_mapper("Protein"),
        constant_triple_mapper("source", "OrchestratorTest"),
    ],
)

# the proteins file also carries the 1-1 gene link: same file, second mapper
ENCODINGS_MAPPER = TabFileMapper(
    AUTO_EDGE_ID,
    [
        edge_source_triple_mapper("gene accession"),
        edge_target_triple_mapper("accession"),
        column_triple_mapper("link notes"),
    ],
    [
        type_triple_mapper("encodes-protein"),
        constant_triple_mapper("source", "OrchestratorTest"),
    ],
)


def map_genes(tsv: str, out_parquet: str) -> None:
    GENES_MAPPER.map(_spark(), tsv, out_path=out_parquet)


def map_proteins(tsv: str, out_parquet: str) -> None:
    PROTEINS_MAPPER.map(_spark(), tsv, out_path=out_parquet)


def map_encodings(tsv: str, out_parquet: str) -> None:
    ENCODINGS_MAPPER.map(_spark(), tsv, out_path=out_parquet)


def build_nodes_pg(gene_triples: str, protein_triples: str, out_parquet: str) -> None:
    """Union two triple checkpoints → PG relation checkpoint."""
    spark = _spark()
    triples = checkpoint.union_all(
        checkpoint.load(gene_triples, spark),
        checkpoint.load(protein_triples, spark),
    )
    checkpoint.save(triples_to_pg(triples), out_parquet)


def export_nodes_jsonl(pg_parquet: str, out_json: str) -> None:
    spark = _spark()
    write_pg_jsonl_single(checkpoint.load(pg_parquet, spark), out_json)


def edges_to_jsonl(encoding_triples: str, out_json: str) -> None:
    """PG build + JSONL dump fused in one rule (both lazy until the
    write), the reference's alternative single-step shape."""
    spark = _spark()
    pg = triples_to_pg(checkpoint.load(encoding_triples, spark))
    write_pg_jsonl_single(pg, out_json)


STAGES = {
    "map_genes": map_genes,
    "map_proteins": map_proteins,
    "map_encodings": map_encodings,
    "build_nodes_pg": build_nodes_pg,
    "export_nodes_jsonl": export_nodes_jsonl,
    "edges_to_jsonl": edges_to_jsonl,
}


def main(argv: list[str]) -> int:
    stage, *args = argv
    STAGES[stage](*args)
    print(f"STAGE_DONE {stage}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
