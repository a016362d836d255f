# Snakemake workflow for the tabmap pipeline-of-pipelines sample
# (contract parity with reference tests/resources/tabmap-test.snakefile:29-144:
# rules exchange Parquet checkpoints addressed by their _SUCCESS check path).
#
# Run:  KETL_DATA=/tmp/out snakemake -s tabmap_pipeline.smk -j 1
#
# Every rule shells out to tabmap_stages.py, so each stage runs in its own
# process with its own SparkSession — the same stage library the
# subprocess-orchestrated pytest drives (tests/test_orchestrated_pipeline.py).

import os
import sys

KETL_DATA = os.environ["KETL_DATA"]
KETL_IN = os.path.abspath(workflow.basedir)
KETL_OUT = f"{KETL_DATA}/output"
KETL_TMP = f"{KETL_DATA}/tmp"

sys.path.insert(0, KETL_IN)
from knetminer_etl_spark.runtime.checkpoint import df_check_path

STAGES = f"{KETL_IN}/tabmap_stages.py"
PY = sys.executable


rule all:
    input:
        f"{KETL_OUT}/nodes-pg.json",
        f"{KETL_OUT}/edges-pg.json",


rule map_gene_tsv:
    input:
        f"{KETL_IN}/test-genes.tsv",
    output:
        df_check_path(f"{KETL_TMP}/gene-triples.parquet"),
    shell:
        "{PY} {STAGES} map_genes {input} {KETL_TMP}/gene-triples.parquet"


rule map_protein_tsv:
    input:
        f"{KETL_IN}/test-proteins.tsv",
    output:
        df_check_path(f"{KETL_TMP}/protein-triples.parquet"),
    shell:
        "{PY} {STAGES} map_proteins {input} {KETL_TMP}/protein-triples.parquet"


rule map_encoding_tsv:
    # the 1-1 gene links live in the proteins file: same file, second mapper
    input:
        f"{KETL_IN}/test-proteins.tsv",
    output:
        df_check_path(f"{KETL_TMP}/encoding-triples.parquet"),
    shell:
        "{PY} {STAGES} map_encodings {input} {KETL_TMP}/encoding-triples.parquet"


rule node_triples_2_pg_df:
    input:
        df_check_path(f"{KETL_TMP}/gene-triples.parquet"),
        df_check_path(f"{KETL_TMP}/protein-triples.parquet"),
    output:
        df_check_path(f"{KETL_TMP}/nodes-pg.parquet"),
    shell:
        "{PY} {STAGES} build_nodes_pg {KETL_TMP}/gene-triples.parquet "
        "{KETL_TMP}/protein-triples.parquet {KETL_TMP}/nodes-pg.parquet"


rule node_pg_2_jsonl:
    input:
        df_check_path(f"{KETL_TMP}/nodes-pg.parquet"),
    output:
        f"{KETL_OUT}/nodes-pg.json",
    shell:
        "{PY} {STAGES} export_nodes_jsonl {KETL_TMP}/nodes-pg.parquet {output}"


rule encoding_triples_2_jsonl:
    input:
        df_check_path(f"{KETL_TMP}/encoding-triples.parquet"),
    output:
        f"{KETL_OUT}/edges-pg.json",
    shell:
        "{PY} {STAGES} edges_to_jsonl {KETL_TMP}/encoding-triples.parquet {output}"
