"""Grouped-aggregate pandas UDFs (Arrow-vectorized Python aggregation).

Completes the engine's Python-extension matrix alongside scalar pandas
UDFs (similarity plane projections), ``mapInPandas`` iterators (mapping
compiler fallback, multimodal decode), ``applyInPandasWithState``
(stateful streaming) and UDTFs (``functions.udtfs``): a GROUPED_AGG
pandas UDF receives a whole group's column as one pandas Series per
Arrow batch and returns a scalar — usable inside ``groupBy().agg`` and
over unbounded windows.

Use these only where no built-in aggregate expresses the statistic;
they forfeit partial (map-side) aggregation, so every group's rows meet
at its reducer — the same per-group-bounded contract as collect_list
aggregation (fine for bounded groups, wrong for corpus-sized ones).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# return types as DataType INSTANCES, not DDL strings: string types are
# parsed through the active SparkContext at decoration time, which makes
# importing this module require a live session (breaks test collection
# and any import-before-session program)


@pandas_udf(DoubleType())
def weighted_median(v: pd.Series, w: pd.Series) -> float:
    """Weight-interpolation-free weighted median: the smallest v whose
    cumulative weight reaches half the total (lower weighted median —
    deterministic, no averaging of middles). NULL values/weights are
    dropped; an empty group yields NULL."""
    df = pd.DataFrame({"v": v, "w": w}).dropna()
    if df.empty:
        return None
    df = df.sort_values("v", kind="mergesort")
    cum = df["w"].cumsum()
    half = df["w"].sum() / 2.0
    return float(df.loc[cum >= half, "v"].iloc[0])


@pandas_udf(DoubleType())
def trimmed_mean(v: pd.Series) -> float:
    """10%-trimmed mean (drop the lowest/highest decile before
    averaging) — the robust-location statistic quality dashboards want;
    no builtin equivalent."""
    s = v.dropna().sort_values(kind="mergesort")
    n = len(s)
    if n == 0:
        return None
    k = int(n * 0.1)
    trimmed = s.iloc[k : n - k] if n - 2 * k > 0 else s
    return float(trimmed.mean())


def weighted_median_agg(value_col: str, weight_col: str) -> Column:
    """``weighted_median`` as an agg Column."""
    return weighted_median(F.col(value_col), F.col(weight_col))
