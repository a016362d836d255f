"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics Spark's built-in windowed aggregations can't express —
running per-key accumulators emitted on every trigger, cross-batch
anomaly flags — the sanctioned escape hatch is a grouped, Arrow-batched
stateful map: state lives in the state store (checkpointed,
failure-recoverable), batches arrive as pandas frames, and state is
evicted via timeouts. This is the streaming twin of the engine's
"Python only behind a clearly-marked boundary" rule.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("m", T.DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        vals = pdf["value"].dropna()
        n += len(pdf)
        s += float(vals.sum())
        if len(vals):
            m = max(m, float(vals.max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        [(user_id, n, round(s, 4), m if m != float("-inf") else None)],
        columns=["user_id", "n_events", "sum_value", "max_value"],
    )


def stream_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals, re-emitted on every trigger that touches
    the user. State never expires here (bounded key domain); pass a
    timeout variant for unbounded key spaces."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
