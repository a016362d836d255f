"""knetminer_etl_spark — a PySpark-native knowledge-graph ETL + analytics
engine.

Pipeline: tabular sources → triple relation → property-graph relation →
PG-JSONL / graph-DB bulk load, plus large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, streaming).

Everything is expressed through the Spark DataFrame API so Catalyst/AQE
own the physical plan; Python touches data only in clearly-marked
fallback/extension points (Pandas UDFs over Arrow).
"""

from .core.model import (
    FROM_KEY,
    PG_SCHEMA,
    SPECIAL_KEYS,
    TO_KEY,
    TRIPLE_SCHEMA,
    TYPE_KEY,
    PGElementType,
)
from .core.serialize import (
    DEFAULT_CONVERTER,
    JSONValueConverter,
    ValueConverter,
    json_literal,
)
from .pg.build import dangling_edges, triples_to_pg
from .pg.jsonl import (
    pg_jsonl_lines,
    read_pg_jsonl,
    write_pg_jsonl,
    write_pg_jsonl_single,
)
from .tabmap.compiler import AUTO_EDGE_ID, DataFrameMapper, chain_mappers
from .tabmap.mappers import (
    accession_triple_mapper,
    accession_value_mapper,
    column_triple_mapper,
    constant_triple_mapper,
    data_source_triple_mapper,
    edge_source_triple_mapper,
    edge_target_triple_mapper,
    row_triple_mapper,
    type_triple_mapper,
)
from .tabmap.tabfile import GenericTabFileMapper, TabFileMapper, read_tab_file

__version__ = "0.1.0"

__all__ = [
    "AUTO_EDGE_ID",
    "DEFAULT_CONVERTER",
    "DataFrameMapper",
    "FROM_KEY",
    "GenericTabFileMapper",
    "JSONValueConverter",
    "PGElementType",
    "PG_SCHEMA",
    "SPECIAL_KEYS",
    "TO_KEY",
    "TRIPLE_SCHEMA",
    "TYPE_KEY",
    "TabFileMapper",
    "ValueConverter",
    "accession_triple_mapper",
    "accession_value_mapper",
    "chain_mappers",
    "column_triple_mapper",
    "constant_triple_mapper",
    "data_source_triple_mapper",
    "dangling_edges",
    "edge_source_triple_mapper",
    "edge_target_triple_mapper",
    "json_literal",
    "pg_jsonl_lines",
    "read_pg_jsonl",
    "read_tab_file",
    "row_triple_mapper",
    "triples_to_pg",
    "type_triple_mapper",
    "write_pg_jsonl",
    "write_pg_jsonl_single",
]
