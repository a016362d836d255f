"""Observed pipeline metrics: data-quality counters at zero extra scans.

``df.observe(Observation, ...)`` attaches aggregate metrics to a plan
that are computed *during* whatever action next materializes it — the
way a 100 TB pipeline should count rows, nulls and domain violations:
never a separate ``count()``/``filter().count()`` pass per metric
(each is a full re-scan of the input), but piggybacked on the write
that runs anyway.

Complements :mod:`..operators.validate` (fail-fast data contracts):
contracts abort on violation, observations *report* — the
monitoring-dashboard side of the same production concern.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, metrics: Mapping[str, Column], name: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``.

    Returns ``(df, observation)``; read ``observation.get`` after the
    next action on the returned frame. Metric Columns must be aggregates
    (``F.count``, ``F.sum``, ...)."""
    obs = Observation(name) if name else Observation()
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs


def pipeline_counters(
    df: DataFrame,
    null_cols: Sequence[str] = (),
    name: str | None = None,
) -> tuple[DataFrame, Observation]:
    """The standard counter set: total rows plus a null count per listed
    column — the minimum a pipeline stage should report about itself."""
    metrics: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in null_cols:
        metrics[f"n_null_{c}"] = F.count_if(F.col(c).isNull())
    return observed(df, metrics, name)
