"""External-orchestrator e2e: the tabmap pipeline driven stage-by-stage
through SUBPROCESSES — each stage a fresh Python + SparkSession —
communicating only via Parquet ``_SUCCESS`` check paths and JSONL files
(the reference's Snakemake pipeline-of-pipelines contract,
ref tests/resources/tabmap-test.snakefile:29-144 and
ref tests/ketl/snake/test_snake_tabmap.py:15-76).

A minimal make-style driver here sequences the DAG exactly as an external
engine would: a stage runs iff its output artifact is missing, so the
second pass over a completed pipeline launches zero work and deleting one
final artifact re-runs only its producing rule. When the real
``snakemake`` is installed, the same stage library is also driven through
tests/resources/tabmap_pipeline.smk (skipped otherwise).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from knetminer_etl_spark.runtime.checkpoint import df_check_path

RES = Path(__file__).parent / "resources"
STAGES = RES / "tabmap_stages.py"


def _dag(data: Path) -> list[tuple[str, list[str], str]]:
    """(stage, argv, output-artifact) triples, topologically ordered."""
    tmp, out = data / "tmp", data / "output"
    return [
        ("map_genes", [str(RES / "test-genes.tsv"), f"{tmp}/gene-triples.parquet"],
         df_check_path(f"{tmp}/gene-triples.parquet")),
        ("map_proteins", [str(RES / "test-proteins.tsv"), f"{tmp}/protein-triples.parquet"],
         df_check_path(f"{tmp}/protein-triples.parquet")),
        ("map_encodings", [str(RES / "test-proteins.tsv"), f"{tmp}/encoding-triples.parquet"],
         df_check_path(f"{tmp}/encoding-triples.parquet")),
        ("build_nodes_pg", [f"{tmp}/gene-triples.parquet", f"{tmp}/protein-triples.parquet",
                            f"{tmp}/nodes-pg.parquet"],
         df_check_path(f"{tmp}/nodes-pg.parquet")),
        ("export_nodes_jsonl", [f"{tmp}/nodes-pg.parquet", f"{out}/nodes-pg.json"],
         f"{out}/nodes-pg.json"),
        ("edges_to_jsonl", [f"{tmp}/encoding-triples.parquet", f"{out}/edges-pg.json"],
         f"{out}/edges-pg.json"),
    ]


def _drive(data: Path) -> list[str]:
    """Run every stage whose output artifact is missing; return the
    stages launched. This IS the external-engine contract: artifact
    presence, not in-process state, decides the work."""
    (data / "output").mkdir(parents=True, exist_ok=True)
    launched = []
    env = {**os.environ, "PYTHONPATH": str(Path(__file__).parents[1])}
    for stage, argv, artifact in _dag(data):
        if Path(artifact).exists():
            continue
        proc = subprocess.run(
            [sys.executable, str(STAGES), stage, *argv],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert proc.returncode == 0, f"{stage} failed:\n{proc.stderr[-2000:]}"
        assert f"STAGE_DONE {stage}" in proc.stdout
        launched.append(stage)
    return launched


def _jsonl(path: Path) -> list[dict]:
    return [json.loads(l) for l in path.read_text().splitlines()]


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory) -> Path:
    data = tmp_path_factory.mktemp("orchestrated")
    launched = _drive(data)
    assert launched == [s for s, _, _ in _dag(data)]  # cold run = full DAG
    return data


class TestSubprocessOrchestration:
    def test_nodes_jsonl_content(self, pipeline_dir):
        nodes = _jsonl(pipeline_dir / "output" / "nodes-pg.json")
        assert len(nodes) == 9  # 5 genes + 4 proteins
        by_id = {n["id"]: n for n in nodes}
        g = by_id["GX0002"]
        assert g["type"] == "node" and g["labels"] == ["Gene"]
        assert g["properties"]["hasGeneName"] == ["BETA2"]
        assert g["properties"]["hasChromosomeBegin"] == [3000]  # cast to int
        assert g["properties"]["source"] == ["OrchestratorTest"]
        assert by_id["PRA1"]["labels"] == ["Protein"]

    def test_edges_jsonl_content(self, pipeline_dir):
        edges = _jsonl(pipeline_dir / "output" / "edges-pg.json")
        assert len(edges) == 4
        by_id = {e["id"]: e for e in edges}
        e = by_id["encodes-protein:GX0002-PRB2"]
        assert e["type"] == "edge"
        assert (e["from"], e["to"]) == ("GX0002", "PRB2")
        assert e["properties"]["link notes"] == ["text mining"]

    def test_second_pass_launches_nothing(self, pipeline_dir):
        assert _drive(pipeline_dir) == []

    def test_deleting_final_artifact_reruns_only_its_rule(self, pipeline_dir):
        target = pipeline_dir / "output" / "nodes-pg.json"
        before = target.read_text()
        target.unlink()
        assert _drive(pipeline_dir) == ["export_nodes_jsonl"]
        assert target.read_text() == before  # deterministic rebuild


@pytest.mark.integration
def test_snakemake_drives_the_same_stages(tmp_path):
    pytest.importorskip("snakemake", reason="snakemake not installed")
    proc = subprocess.run(
        [sys.executable, "-m", "snakemake", "-s",
         str(RES / "tabmap_pipeline.smk"), "-j", "1", "--quiet"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ,
             "KETL_DATA": str(tmp_path),
             "PYTHONPATH": str(Path(__file__).parents[1])},
        cwd=RES,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert len(_jsonl(tmp_path / "output" / "nodes-pg.json")) == 9
    assert len(_jsonl(tmp_path / "output" / "edges-pg.json")) == 4
