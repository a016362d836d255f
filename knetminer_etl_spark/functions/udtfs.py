"""Python UDTFs (Spark 4 table-function API).

The reference exposes a row→many-rows mapper surface (its tabmap core
fans one input row out to several triples; ref src/ketl/tabmap/
core.py:302-348). The engine's production path compiles that fan-out to
native Column expressions (tabmap/compiler.py), but the *extension*
surface users reach for when logic outgrows expressions is a table
function — so the engine ships the UDTF registration path too, usable
from SQL as ``... FROM t, LATERAL split_text(t.text, 40, 30)``.

UDTFs are the Python-row slow path (no Arrow batching in the lateral
form): keep them for genuinely imperative logic and prefer the Column
twins (``operators.text.chunk_documents``) in hot paths — the tests
assert the two produce identical rows, which is exactly what makes the
swap safe later.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, n_tokens int, chunk_text string")
class SplitTextUDTF:
    """Overlapping whitespace-token windows of a document — the UDTF twin
    of :func:`..operators.text.chunk_documents` (same windowing rules:
    chunk ``i`` covers tokens ``[i*stride, i*stride+window)``, tail kept,
    empty text yields no rows)."""

    def eval(self, text: str, window: int = 128, stride: int = 96):
        if text is None or window <= 0 or stride <= 0:
            return
        toks = text.split()
        n = len(toks)
        if n == 0:
            return
        last = 0 if n <= window else -(-(n - window) // stride)
        for i in range(last + 1):
            chunk = toks[i * stride : i * stride + window]
            yield i, len(chunk), " ".join(chunk)


def register_udtfs(spark) -> None:
    """Register the engine's UDTFs on a session for SQL use."""
    spark.udtf.register("split_text", SplitTextUDTF)
