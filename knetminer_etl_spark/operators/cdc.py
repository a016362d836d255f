"""Change-data-capture compaction: latest-wins per key, upsert merges,
tombstone deletes.

The core primitive is argmax-per-key. The window form
(``row_number() over (partition by key order by version desc) = 1``)
shuffles EVERY row to the key's reducer before discarding all but one.
Here it's a ``max(struct(version..., payload...))`` aggregate instead:
struct comparison is lexicographic, so the max over
``(version, tiebreak, payload)`` IS the latest row — and hash
aggregation pre-combines map-side, shipping one candidate row per key
per input partition across the shuffle. On a 100 TB changelog with a
bounded key space that's the difference between shuffling the corpus
and shuffling ~|keys| × partitions rows.

Determinism: callers must include a unique tiebreak column in
``order_by`` (e.g. an event/sequence id) — version ties are then
resolved identically everywhere, which also keeps the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ORD = "__cdc_ord"
_PAY = "__cdc_pay"


def latest_by_key(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """One row per ``keys`` group: the row with the greatest ``order_by``
    tuple (lexicographic). Columns come back in input order."""
    payload = [c for c in df.columns if c not in keys]
    packed = df.select(
        *keys,
        F.struct(
            *[F.col(c) for c in order_by],
            F.struct(*[F.col(c) for c in payload]).alias(_PAY),
        ).alias(_ORD),
    )
    latest = packed.groupBy(*keys).agg(F.max(_ORD).alias(_ORD))
    out = latest.select(
        *keys, *[F.col(f"{_ORD}.{_PAY}.{c}").alias(c) for c in payload]
    )
    return out.select(*df.columns)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_by: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Apply a changelog to a snapshot: per key, keep the newest version
    across base ∪ updates; if ``delete_col`` names a boolean column,
    keys whose winning row is a tombstone are dropped (the column is
    removed from the result). One union + one combining aggregate."""
    ucols = updates.columns
    if delete_col is None:
        merged = latest_by_key(
            base.select(*ucols).unionByName(updates), keys, order_by
        )
        return merged.select(*base.columns)
    b = base.select(*[c for c in ucols if c != delete_col]).withColumn(
        delete_col, F.lit(False)
    )
    merged = latest_by_key(b.select(*ucols).unionByName(updates), keys, order_by)
    return merged.filter(~F.col(delete_col)).select(
        *[c for c in base.columns if c != delete_col]
    )
