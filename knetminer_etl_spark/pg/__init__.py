from .build import dangling_edges, triples_to_pg  # noqa: F401
from .jsonl import (  # noqa: F401
    pg_jsonl_lines,
    read_pg_jsonl,
    write_pg_jsonl,
    write_pg_jsonl_single,
)
