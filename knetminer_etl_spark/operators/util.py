"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def pin_observe(df: DataFrame, *metrics: Column) -> tuple[DataFrame, dict]:
    """``localCheckpoint(eager=True)`` with aggregate metrics computed
    INSIDE the materialization job (``observe``), instead of a second
    driver-synchronized action over the pinned blocks.

    Iterative loops and size-adaptive operators pay one pin plus one
    probe action per step; driver gaps between those jobs dominate local
    wall time (SCALE.md) and each is a scheduling barrier on a cluster.
    This halves the per-step actions.
    """
    obs = Observation()
    pinned = df.observe(obs, *metrics).localCheckpoint(eager=True)
    return pinned, obs.get


def presentation_sort(df: DataFrame, *cols) -> DataFrame:
    """Deterministic global order for a BOUNDED result set without the
    range-sampling double evaluation.

    ``orderBy`` plans a range exchange whose ``RangePartitioner`` first
    runs a full sampling pass over the child — a heavy narrow chain
    (regex scrubbing, higher-order array functions) directly under the
    sort is therefore computed TWICE. For presentation sorts of bounded
    outputs (per-doc audit rows, top-k tables — anything a user would
    actually ORDER BY for display) a single-partition sort computes the
    chain once: one round-robin exchange of the *result* rows, then an
    in-partition sort. Use only where the result is known-bounded; a
    genuinely large output should keep ``orderBy`` so the sort itself
    distributes.
    """
    return df.repartition(1).sortWithinPartitions(*cols)


def pinned_sort(df: DataFrame, *cols) -> DataFrame:
    """Global ``orderBy`` over a heavy chain without evaluating it twice.

    A range exchange's ``RangePartitioner`` runs a full sampling pass
    over its child before the sort pass — a heavy narrow chain (regex
    scrubbing, higher-order array functions) directly under an
    ``orderBy`` is computed twice. Pinning the computed result first
    (``localCheckpoint``) makes the sampling pass read materialized
    blocks instead, while the sort itself stays distributed — unlike a
    single-partition presentation sort, this keeps working when the
    output is corpus-sized (per-document audit rows at 100 TB).
    """
    return df.localCheckpoint(eager=True).orderBy(*cols)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to cluster parallelism when the input arrived
    under-split (e.g. one small parquet file → one partition).

    CPU-heavy per-row operators (shingling, hashing, vector math) are
    otherwise serialized on a single core regardless of cluster size —
    small *bytes* do not mean small *compute*. At real scale inputs
    arrive well-split and this is a no-op; the round-robin shuffle on the
    small under-split input is cheap relative to the compute it unlocks.

    The split-count probe (``df.rdd.getNumPartitions()``) is a FULL
    physical-planning pass plus RDD-DAG construction on the driver —
    measured 0.15–0.2 s per call on the bench plans, paid by every
    invocation of every shingling operator. It is memoized per
    (application, input files) for file-backed inputs: fan_out is
    called on pre-exchange scan/filter/project chains by design, and a
    narrow chain's partition count is the SCAN's split count — a pure
    function of (files, session conf), both fixed for an application
    and INDEPENDENT of the projection on top. (Keying on the canonical
    plan hash too, as the count/plan-bytes memos must, made every
    differently-projected consumer of the same files re-pay the
    planning pass — e.g. the three gram/count branches over one staging
    directory.) In-memory relations (no input files) keep the direct
    probe. Plan-choice state only, never results (core/memo.py).
    """
    want = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    key = None
    try:
        files = df.inputFiles()
        if files:
            key = (
                df.sparkSession.sparkContext.applicationId,
                tuple(sorted(files)),
            )
    except Exception:
        key = None
    have = _PARTS_MEMO.get(key) if key is not None else None
    if have is None:
        have = df.rdd.getNumPartitions()
        if key is not None:
            _PARTS_MEMO[key] = have
    if have < want:
        return df.repartition(want)
    return df


#: memoized relation counts: (applicationId, canonical plan hash,
#: sorted input files) -> rows. Same immutable-input contract as
#: runtime/modelcache and the dedup clone-stat memo. LRU-bounded: an
#: evicted count is simply re-measured on next use (plan choice only,
#: never output — core/memo.py).
from ..core.memo import BoundedMemo

_COUNT_MEMO = BoundedMemo(maxsize=4096)

#: memoized scan split counts for fan_out — same immutable-file contract
#: as _COUNT_MEMO; an evicted entry re-pays one planning pass.
_PARTS_MEMO = BoundedMemo(maxsize=4096)


def memo_count(df: DataFrame) -> int:
    """``df.count()`` memoized per (application, plan, input files) for
    file-backed relations — size-adaptive dispatchers (TF-IDF skew
    split, verification shapes) need the corpus magnitude, not a fresh
    scan per invocation. In-memory relations (no input files) are
    counted every call; a memoized count can only switch physical
    plans, never change output."""
    key = None
    try:
        files = df.inputFiles()
        if files:
            key = (
                df.sparkSession.sparkContext.applicationId,
                df.semanticHash(),
                tuple(sorted(files)),
            )
    except Exception:
        key = None
    if key is not None and key in _COUNT_MEMO:
        return _COUNT_MEMO[key]
    n = df.count()
    if key is not None:
        _COUNT_MEMO[key] = n
    return n
