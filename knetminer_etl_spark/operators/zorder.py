"""Z-order (Morton) keys for multi-dimensional data layout.

Sorting 100 TB by one column makes min/max file statistics razor-sharp
for that column and useless for every other; interleaving the bits of
several columns (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` trick) makes
files cluster in ALL of them at once, so a scan filtered on any of the
z-ordered dimensions skips most files.

Everything here is integer Column arithmetic (shift/mask/multiply —
whole-stage codegen, bit-exact in SQL), so z-keys are oracle-checkable
and stable across engines:

* :func:`normalize_to_bits` — exact integer mapping of a value range
  onto ``2^bits`` buckets (integer multiply + divide, no floats);
* :func:`zorder_key` — bit interleave of D normalized columns into one
  BIGINT sort key (``bits*D <= 62`` to stay in non-negative long);
* :func:`zorder_layout` — the write shape: range-ish clustering via
  ``repartitionByRange`` on the z-key + partition-local sort, so file
  k holds a contiguous z-range and its per-column min/max stats stay
  tight. No global sort single-reducer: range partitioning samples
  boundaries and sorts within partitions only.

No counterpart in the reference (it writes unclustered parquet);
north-star layout extension next to ``runtime.bucketing`` (hash
co-location) and ``runtime.checkpoint.save_partitioned`` (hive
partition pruning) — the three standard layout levers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(
    col: Column, lo: int, hi: int, bits: int = 16
) -> Column:
    """Map an integer column in [lo, hi] onto [0, 2^bits): exact
    integer arithmetic ``clamp((x - lo) * (2^bits - 1) / (hi - lo))``
    (floor division — deterministic, SQL-identical). Values outside
    the range clamp to the ends."""
    if hi <= lo:
        raise ValueError("hi must exceed lo")
    span = hi - lo
    top = (1 << bits) - 1
    clamped = F.least(F.greatest(col.cast("long"), F.lit(lo)), F.lit(hi))
    # (x-lo)*top stays well under 2^63 for 32-bit ranges at bits<=16
    return F.floor(((clamped - F.lit(lo)) * F.lit(top)) / F.lit(span)).cast(
        "long"
    )


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of D already-normalized columns (each in
    [0, 2^bits)): bit b of dimension d lands at position ``b*D + d``.
    ``bits * D`` must stay <= 62 (non-negative BIGINT). Pure
    shift/mask/multiply expression — narrow, codegen'd, SQL-exact."""
    d_n = len(cols)
    if not cols:
        raise ValueError("zorder_key: no columns")
    if bits * d_n > 62:
        raise ValueError(f"bits*D = {bits * d_n} exceeds 62 (signed long)")
    key: Column | None = None
    for d, col in enumerate(cols):
        for b in range(bits):
            term = F.shiftright(col, b).bitwiseAND(F.lit(1)) * F.lit(
                1 << (b * d_n + d)
            )
            key = term if key is None else key + term
    return key.cast("long")


def with_zorder_key(
    df: DataFrame,
    dims: dict[str, tuple[int, int]],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Attach the z-key for ``dims`` = {column: (lo, hi)} — ranges are
    caller-supplied (at scale they come from yesterday's profile() or
    table stats; computing them inline would add an extra pass)."""
    norm = [
        normalize_to_bits(F.col(c), lo, hi, bits)
        for c, (lo, hi) in dims.items()
    ]
    return df.withColumn(out_col, zorder_key(norm, bits))


def zorder_layout(
    df: DataFrame,
    dims: dict[str, tuple[int, int]],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """The write-side shape: z-key → range partition into ``n_files``
    cluster slices → partition-local sort. Feed straight to
    ``.write.parquet``: each output file covers a contiguous z-range,
    which is what tightens every dimension's min/max file stats."""
    keyed = with_zorder_key(df, dims, bits)
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions(
        "zkey"
    )


def zkey_sql(dims: dict[str, tuple[int, int]], bits: int = 16) -> str:
    """DuckDB twin of :func:`with_zorder_key`'s key expression."""
    d_n = len(dims)
    terms = []
    for d, (c, (lo, hi)) in enumerate(dims.items()):
        span = hi - lo
        top = (1 << bits) - 1
        norm = (
            f"((least(greatest(CAST({c} AS BIGINT), {lo}), {hi}) - {lo})"
            f" * {top} // {span})"
        )
        for b in range(bits):
            terms.append(
                f"((({norm} >> {b}) & 1) * {1 << (b * d_n + d)})"
            )
    return "(" + " + ".join(terms) + ")"
