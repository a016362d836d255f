"""SQL-surface extensions: Python UDTFs and observed-metrics helpers."""

from .metrics import observed, pipeline_counters
from .udafs import trimmed_mean, weighted_median, weighted_median_agg
from .udtfs import SplitTextUDTF, register_udtfs

__all__ = [
    "SplitTextUDTF",
    "register_udtfs",
    "observed",
    "pipeline_counters",
    "trimmed_mean",
    "weighted_median",
    "weighted_median_agg",
]
