"""Delimited-file → triples: scan + cast + map + checkpoint.

Composition of the CSV/TSV source (reference src/ketl/tabmap/core.py:462-467,
518-528: header, tab delimiter, ``#`` comments, optional inference), explicit
per-column casts (reference src/ketl/core.py:334-373), the mapping compiler,
and the Parquet checkpoint (reference src/ketl/tabmap/core.py:445-552).

Scale notes: prefer ``infer_schema=False`` + explicit ``column_types`` in
production — schema inference is a full extra pass over the input. CSV scans
support predicate pushdown/column pruning in Spark; the native mapping path
keeps both effective.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..runtime import checkpoint
from .compiler import AUTO_EDGE_ID, DataFrameMapper
from .mappers import TripleMapper

DEFAULT_READ_OPTIONS: dict[str, Any] = {
    "header": True,
    "delimiter": "\t",
    "inferSchema": True,
    "comment": "#",
}


def read_tab_file(
    spark: SparkSession,
    path: str | Path,
    options: Mapping[str, Any] | None = None,
    column_types: Mapping[str, str] | None = None,
) -> DataFrame:
    """Read a delimited text file with the engine's defaults."""
    opts = dict(DEFAULT_READ_OPTIONS)
    if options:
        opts.update(options)
    if not opts.get("header", False):
        raise ValueError("headerless files are not supported: column names drive the mapping")
    if column_types:
        # explicit types → skip the inference pass entirely
        opts["inferSchema"] = False
    df = spark.read.options(**{k: str(v) for k, v in opts.items()}).csv(str(path))
    if column_types:
        df = df.withColumns({c: df[c].cast(t) for c, t in column_types.items()})
    return df


class TabFileMapper:
    """File → triple DataFrame, with optional Parquet checkpoint
    (reference src/ketl/tabmap/core.py:445-619)."""

    def __init__(
        self,
        id_mapper: Any,
        mappers: Sequence[TripleMapper],
        constants: Sequence[TripleMapper] = (),
        read_options: Mapping[str, Any] | None = None,
        column_types: Mapping[str, str] | None = None,
        on_empty_edge_part: str = "error",
    ):
        self.df_mapper = DataFrameMapper(
            id_mapper, mappers, constants, on_empty_edge_part=on_empty_edge_part
        )
        self.read_options = dict(read_options or {})
        self.column_types = dict(column_types or {})

    def map(
        self,
        spark: SparkSession,
        file_path: str | Path,
        out_path: str | Path | None = None,
    ) -> DataFrame:
        df = read_tab_file(
            spark, file_path, self.read_options, self.column_types or None
        )
        triples = self.df_mapper.to_triples(df)
        if out_path is not None:
            checkpoint.save(triples, out_path)
            triples = checkpoint.load(out_path, spark)
        return triples


#: alias matching the reference's generic-config entry point
GenericTabFileMapper = TabFileMapper
