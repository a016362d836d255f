"""End-to-end reproduction of the reference's "real case" workflow
(ref: tests/ketl/snake/test_real_case.py + tests/resources/ensembl/
wf_mapping.py): one gene↔protein TSV drives eight chained mappings —
Gene / Protein nodes with prefixed ids, per-source Accession nodes,
hasAccession and encodesProtein edges, provenance constants, and
multi-valued dataSources — through triples → PG → JSONL round-trip,
asserting the same count invariants the reference's Neo4j test checks
(without needing a database; the loader surface is exercised via its
pure coercion/Cypher builders)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from knetminer_etl_spark.tabmap.compiler import (
    AUTO_EDGE_ID,
    DataFrameMapper,
    chain_mappers,
)
from knetminer_etl_spark.tabmap.mappers import (
    ColumnValueMapper,
    column_triple_mapper,
    constant_triple_mapper,
    data_source_triple_mapper,
    edge_source_triple_mapper,
    edge_target_triple_mapper,
    string_wrapper,
    type_triple_mapper,
)
from knetminer_etl_spark.pg.build import triples_to_pg
from knetminer_etl_spark.pg.jsonl import read_pg_jsonl, write_pg_jsonl

KETL_SOURCE = "tests/test_real_case.py"
SRC = constant_triple_mapper("ketl:source", KETL_SOURCE)

TSV = """ENSEMBL ID\tUniProt ID
AT1G01010\tP10001
AT1G01010\tP10002
AT2G02020\tP10001
AT3G03030\tP10003
AT3G03030\tP10003
"""


def _accession_mappers(source_id: str, acc_col: str, owner_id):
    """Mirror of the reference's make_accession_mappers_for_source
    (ref: tests/resources/ensembl/wf_mapping.py:27-69)."""
    acc_id = ColumnValueMapper(acc_col).with_wrapper(
        string_wrapper(prefix=f"accession:{source_id}:")
    )
    acc = DataFrameMapper(
        acc_id,
        [column_triple_mapper(acc_col, "value")],
        [
            type_triple_mapper("Accession"),
            constant_triple_mapper("source", source_id),
            SRC,
        ],
    )
    rel = DataFrameMapper(
        AUTO_EDGE_ID,
        [
            edge_source_triple_mapper(owner_id),
            edge_target_triple_mapper(acc_id),
        ],
        [type_triple_mapper("hasAccession"), SRC],
    )
    return acc, rel


@pytest.fixture(scope="module")
def pg(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("realcase")
    tsv = d / "ensembl-uniprot-genes.tsv"
    tsv.write_text(TSV)

    from knetminer_etl_spark.tabmap.tabfile import read_tab_file

    df = read_tab_file(spark, str(tsv))

    gene_id = ColumnValueMapper("ENSEMBL ID").with_wrapper(
        string_wrapper(prefix="gene:")
    )
    protein_id = ColumnValueMapper("UniProt ID").with_wrapper(
        string_wrapper(prefix="protein:")
    )
    gene = DataFrameMapper(
        gene_id,
        [],
        [type_triple_mapper("Gene"), data_source_triple_mapper("ENSEMBL-Plants"), SRC],
    )
    protein = DataFrameMapper(
        protein_id,
        [],
        [
            type_triple_mapper("Protein"),
            data_source_triple_mapper("ENSEMBL-Plants"),
            data_source_triple_mapper("TAIR"),
            SRC,
        ],
    )
    g_acc, g_acc_rel = _accession_mappers("ENSEMBL-Plants", "ENSEMBL ID", gene_id)
    p_acc, p_acc_rel = _accession_mappers("UniProt", "UniProt ID", protein_id)
    t_acc, t_acc_rel = _accession_mappers("TAIR", "UniProt ID", protein_id)
    encodes = DataFrameMapper(
        AUTO_EDGE_ID,
        [
            edge_source_triple_mapper(gene_id),
            edge_target_triple_mapper(protein_id),
        ],
        [
            type_triple_mapper("encodesProtein"),
            data_source_triple_mapper("ENSEMBL-Plants"),
            data_source_triple_mapper("TAIR"),
            SRC,
        ],
    )
    triples = chain_mappers(
        df, gene, protein, g_acc, g_acc_rel, p_acc, p_acc_rel, t_acc, t_acc_rel, encodes
    )
    return triples_to_pg(triples, validate=True).cache()


def _label_count(pg, label):
    return pg.filter(
        (F.col("type") == "node") & F.array_contains("labels", label)
    ).count()


def _edge_count(pg, label):
    return pg.filter(
        (F.col("type") == "edge") & F.array_contains("labels", label)
    ).count()


def test_node_counts_match_reference_invariants(pg):
    # 3 distinct genes, 3 distinct proteins (dup rows collapse), one
    # accession node per (source, value)
    assert _label_count(pg, "Gene") == 3
    assert _label_count(pg, "Protein") == 3
    assert _label_count(pg, "Accession") == 9  # ENSEMBL 3 + UniProt 3 + TAIR 3


def test_edge_counts(pg):
    # one encodesProtein per distinct (gene, protein) row
    assert _edge_count(pg, "encodesProtein") == 4
    # one hasAccession per owner × accession source
    assert _edge_count(pg, "hasAccession") == 9


def test_multi_valued_data_sources_and_provenance(pg):
    prot = pg.filter(F.col("id") == "protein:P10001").collect()[0]
    ds = sorted(json.loads(v) for v in prot["properties"]["dataSources"])
    assert ds == ["ENSEMBL-Plants", "TAIR"]
    assert json.loads(prot["properties"]["ketl:source"][0]) == KETL_SOURCE
    # every element carries the provenance property (the filter the
    # reference's Neo4j assertions rely on)
    n = pg.count()
    tagged = pg.filter(
        F.array_contains(
            F.col("properties")["ketl:source"], f'"{KETL_SOURCE}"'
        )
    ).count()
    assert tagged == n and n > 0


def test_accession_values_and_ids(pg):
    acc = pg.filter(F.col("id") == "accession:TAIR:P10003").collect()[0]
    assert json.loads(acc["properties"]["value"][0]) == "P10003"
    assert json.loads(acc["properties"]["source"][0]) == "TAIR"


def test_jsonl_round_trip_preserves_counts(pg, spark, tmp_path):
    out = str(tmp_path / "pg")
    write_pg_jsonl(pg, out)
    back = read_pg_jsonl(spark, out)
    assert back.count() == pg.count()
    assert _label_count(back, "Accession") == 9


def test_neo_loader_renders_multi_value_mode(pg):
    """The loader's MultiValueMode='multiple' keeps dataSources a list
    in the Cypher payload even for single-valued rows (ref:
    src/ketl/io/neoloader.py:56-93)."""
    from knetminer_etl_spark.io import neo4j as neo

    cfg = neo.Neo4jConfig(
        property_configs={
            "dataSources": neo.PropertyConfig(
                multi_value_mode=neo.MultiValueMode.MULTIPLE
            )
        }
    )
    gene = pg.filter(F.col("id") == "gene:AT1G01010").collect()[0]
    raw = {
        k: [json.loads(v) for v in vs]
        for k, vs in dict(gene["properties"]).items()
    }
    # MULTIPLE keeps the singleton a list; AUTO collapses it
    assert neo.coerce_property_values(
        "dataSources", gene["id"], raw["dataSources"], cfg
    ) == ["ENSEMBL-Plants"]
    assert (
        neo.coerce_property_values("ketl:source", gene["id"], raw["ketl:source"], cfg)
        == KETL_SOURCE
    )
