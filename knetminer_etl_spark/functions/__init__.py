"""SQL-surface extensions: Python UDTFs and observed-metrics helpers."""

from .metrics import observed, pipeline_counters
from .udtfs import SplitTextUDTF, register_udtfs

__all__ = [
    "SplitTextUDTF",
    "register_udtfs",
    "observed",
    "pipeline_counters",
]
