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


def scd2(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    order_by: list[str] | None = None,
    dedup_consecutive: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change stream:
    one validity interval per accepted change, with
    ``valid_from`` = the change timestamp, ``valid_to`` = the next
    change's timestamp (NULL while current) and ``is_current``.

    ``order_by`` (default ``[ts_col]``) must order changes totally per
    key — add a sequence/event id as tiebreak when timestamps can
    collide; only the winning row per (keys, order tuple) is kept
    (latest-wins, same rule as :func:`latest_by_key`). With
    ``dedup_consecutive`` set, a change whose listed attribute values
    equal the previous accepted row's is collapsed into it (standard
    SCD2 no-op-change suppression).

    Plan: one combining hash-agg shuffle (collision dedup, map-side
    combined) + one key-partitioned sort for the window passes — the
    no-op filter and the lead() share the same Exchange. No driver
    actions; deterministic, hence oracle-reproducible.
    """
    order_by = order_by or [ts_col]
    from pyspark.sql.window import Window

    win = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    # defensive latest-wins on colliding order tuples: struct-max over the
    # payload (same map-side-combining shape as latest_by_key), so results
    # stay deterministic even when the caller's order is not total
    payload = [c for c in changes.columns if c not in keys and c not in order_by]
    if payload:
        packed = changes.groupBy(*keys, *order_by).agg(
            F.max(F.struct(*[F.col(c) for c in payload])).alias(_PAY)
        )
        deduped = packed.select(
            *keys, *order_by, *[F.col(f"{_PAY}.{c}").alias(c) for c in payload]
        ).select(*changes.columns)
    else:
        deduped = changes.dropDuplicates(keys + order_by)
    if dedup_consecutive:
        # suppress no-op changes: keep the first row per key and any row
        # where a tracked attribute actually changed
        changed = F.row_number().over(win) == 1
        for c in dedup_consecutive:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(win))
        deduped = deduped.withColumn("_chg", changed).filter("_chg").drop("_chg")
    nxt = F.lead(F.col(ts_col)).over(win)
    return (
        deduped.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two dataset versions: one row per key with
    ``change`` in added / removed / changed / unchanged — the audit step
    of incremental corpus builds ("what did this refresh actually do").

    One full-outer shuffle join on the key; comparison is per-column
    null-safe equality (``<=>``), so NULL→NULL is unchanged and
    NULL→value is changed — exactly SQL's ``IS NOT DISTINCT FROM``,
    which keeps the oracle bit-exact with no serialization tricks.
    ``compare_cols`` defaults to every shared non-key column.
    """
    shared = [c for c in old.columns if c in set(new.columns)]
    if compare_cols is None:
        cols = [c for c in shared if c not in keys]
        if not cols:
            raise ValueError(
                "no shared non-key columns to compare; pass compare_cols=[] "
                "explicitly for a presence-only diff"
            )
    else:
        cols = compare_cols
    missing = [c for c in cols + keys if c not in shared]
    if missing:
        raise ValueError(f"columns absent from one side: {missing}")
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"_ok_{keys[0]}").isNotNull()
    in_new = F.col(f"_nk_{keys[0]}").isNotNull()
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(~in_old, "added")
        .when(~in_new, "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return j.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change"),
    )
