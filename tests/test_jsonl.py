"""PG-JSONL sink/source round trips."""

from __future__ import annotations

import json

import pytest

from knetminer_etl_spark import (
    read_pg_jsonl,
    triples_to_pg,
    write_pg_jsonl,
    write_pg_jsonl_single,
)
from knetminer_etl_spark.pg.jsonl import pg_jsonl_lines


@pytest.fixture()
def pg(spark):
    rows = [
        ("N1", "@type", "Gene"),
        ("N1", "name", '"TP53"'),
        ("N1", "len", "3924"),
        ("N2", "@type", "Protein"),
        ("E1", "@type", "encodes"),
        ("E1", "@from", "N1"),
        ("E1", "@to", "N2"),
        ("E1", "score", "0.9"),
    ]
    t = spark.createDataFrame(rows, "id string, key string, value string")
    return triples_to_pg(t)


def parse_lines(lines):
    return {e["id"]: e for e in map(json.loads, lines)}


class TestDriverSideWriter:
    def test_lines_unserialize_values(self, spark, pg):
        got = parse_lines(pg_jsonl_lines(pg))
        assert got["N1"]["properties"]["name"] == ["TP53"]
        assert got["N1"]["properties"]["len"] == [3924]  # native int again
        assert got["N1"]["labels"] == ["Gene"]
        assert got["E1"]["from"] == "N1" and got["E1"]["to"] == "N2"
        assert "from" not in got["N1"]
        assert got["N2"]["properties"] == {}

    def test_single_file_writer(self, spark, pg, tmp_path):
        out = tmp_path / "pg.jsonl"
        n = write_pg_jsonl_single(pg, out)
        assert n == 3
        assert len(out.read_text().strip().splitlines()) == 3


class TestDistributedWriter:
    def test_distributed_lines_match_driver_lines(self, spark, pg, tmp_path):
        out = tmp_path / "pgdir"
        write_pg_jsonl(pg, str(out))
        dist = parse_lines(
            line
            for r in spark.read.text(str(out)).collect()
            for line in [r["value"]]
        )
        drv = parse_lines(pg_jsonl_lines(pg))
        assert dist == drv

    def test_jsonl_source_roundtrip(self, spark, pg, tmp_path):
        out = tmp_path / "pgdir"
        write_pg_jsonl(pg, str(out))
        back = read_pg_jsonl(spark, str(out))
        orig = {r["id"]: r.asDict(recursive=True) for r in pg.collect()}
        got = {r["id"]: r.asDict(recursive=True) for r in back.select(*pg.columns).collect()}
        assert got == orig

    def test_malformed_value_array_nulls_not_fails(self, spark, tmp_path):
        """A corrupt property value array must null out, not abort the
        read (the outer line parse is PERMISSIVE; the inner split must
        match)."""
        line = '{"type":"node","id":"N1","labels":["X"],"properties":{"p":["a",}}'
        p = tmp_path / "bad"
        p.mkdir()
        (p / "part-00000.txt").write_text(line + "\n")
        rows = read_pg_jsonl(spark, str(p)).collect()
        assert len(rows) == 1  # job completes; malformed bits are NULL

    def test_roundtrip_preserves_string_typing(self, spark, tmp_path):
        """String values that LOOK like numbers/booleans/null must come back
        as JSON strings, not be re-typed (numeric accession IDs are common)."""
        from knetminer_etl_spark import triples_to_pg

        rows = [
            ("N1", "@type", "Gene"),
            ("N1", "acc", '"123"'),       # numeric-looking string
            ("N1", "flag", '"true"'),     # boolean-looking string
            ("N1", "maybe", '"null"'),    # null-looking string
            ("N1", "sci", '"1e5"'),       # scientific-notation-looking string
            ("N1", "n", "123"),           # actual number
            ("N1", "b", "true"),          # actual boolean
            ("N1", "obj", '{"a":1}'),     # nested object
        ]
        pg = triples_to_pg(
            spark.createDataFrame(rows, "id string, key string, value string")
        )
        out = tmp_path / "pgdir"
        write_pg_jsonl(pg, str(out))
        back = read_pg_jsonl(spark, str(out))
        got = {r["id"]: r.asDict(recursive=True) for r in back.collect()}
        props = got["N1"]["properties"]
        assert props["acc"] == ['"123"']
        assert props["flag"] == ['"true"']
        assert props["maybe"] == ['"null"']
        assert props["sci"] == ['"1e5"']
        assert props["n"] == ["123"]
        assert props["b"] == ["true"]
        assert props["obj"] == ['{"a":1}']
        # and the JSON lines themselves carry the right types
        line = json.loads(
            next(
                l
                for r in spark.read.text(str(out)).collect()
                for l in [r["value"]]
            )
        )
        p = line["properties"]
        assert p["acc"] == ["123"] and isinstance(p["acc"][0], str)
        assert p["n"] == [123] and isinstance(p["n"][0], int)
        assert p["b"] == [True]
