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

import math
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


def stream_running_totals_tws(
    events: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """:func:`stream_running_totals` on the ``transformWithStateInPandas``
    API (Spark 4's successor to ``applyInPandasWithState``): typed state
    variables instead of one packed tuple, per-state TTL instead of
    manual timeout bookkeeping, and a processor object whose ``init``
    declares state once per partition. Requires the RocksDB state store:
    set ``spark.sql.streaming.stateStore.providerClass`` to
    ``org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
    in the session before starting the query (see tests).

    Identical output contract to the applyInPandasWithState twin
    (asserted in tests): (user_id, n_events, sum_value, max_value) per
    touched user per trigger, update mode.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", _STATE_SCHEMA, ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            cur = self._totals.get() if self._totals.exists() else None
            n, s, m = cur if cur is not None else (0, 0.0, float("-inf"))
            for pdf in rows:
                vals = pdf["value"].dropna()
                n += len(pdf)
                s += float(vals.sum())
                if len(vals):
                    m = max(m, float(vals.max()))
            self._totals.update((n, s, m))
            yield pd.DataFrame(
                [(user_id, n, round(s, 4), m if m != float("-inf") else None)],
                columns=["user_id", "n_events", "sum_value", "max_value"],
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Processor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)

_ZSCORE_STATE_SCHEMA = T.StructType(
    [T.StructField("vals", T.ArrayType(T.DoubleType()))]
)


def make_zscore_update(n: int):
    """Update fn for :func:`stream_rolling_zscore` (factory so ``n`` rides
    in the closure, not in state)."""

    def update(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        vals: list[float] = list(state.get[0]) if state.exists else []
        out: list[tuple] = []
        for pdf in batches:
            # event-time order within the batch; cross-batch order is the
            # source's responsibility (same contract as any stateful op)
            pdf = pdf.sort_values(["ts", "event_id"])
            for ev, v in zip(pdf["event_id"], pdf["value"]):
                v = float(v)
                z = None
                cnt = len(vals)
                if cnt >= 2:
                    mean = sum(vals) / cnt
                    var = (sum(x * x for x in vals) - cnt * mean * mean) / (
                        cnt - 1
                    )
                    if var > 0:
                        z = (v - mean) / var**0.5
                out.append((user_id, int(ev), v, z))
                vals.append(v)
                if len(vals) > n:
                    vals.pop(0)
        state.update((vals,))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "value", "z"])

    return update


def stream_rolling_zscore(events: DataFrame, n: int = 20) -> DataFrame:
    """Streaming twin of ``operators.timeseries.rolling_zscore``: each
    event scored against the mean/std of the user's previous ``n``
    values, with the trailing window carried ACROSS micro-batches in the
    state store (the batch operator's window frame becomes a bounded
    per-key ring buffer — O(n) state per user, checkpoint-recoverable).
    Emits every scored event (append semantics via update mode — each
    event appears once)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_zscore_update(n),
        outputStructType=ZSCORE_SCHEMA,
        stateStructType=_ZSCORE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType([T.StructField("y", T.DoubleType())])


def make_ewma_update(alpha: float):
    """Update fn for :func:`stream_ewma` — the recurrence's entire state
    is ONE double per key (y_prev), the smallest possible stateful
    operator; arithmetic matches the batch fold exactly
    (a*x + (1-a)*y_prev)."""
    a = float(alpha)
    b = 1.0 - a

    def update(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        y = state.get[0] if state.exists else None
        out: list[tuple] = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ev, v in zip(pdf["event_id"], pdf["value"]):
                v = float(v)
                y = v if y is None else a * v + b * y
                # same floor rounding as the batch fold (Python round()
                # is half-even on the binary value — a third semantics)
                out.append(
                    (user_id, int(ev), v, math.floor(y * 1e6 + 0.5) / 1e6)
                )
        if y is not None:
            state.update((y,))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "value", "ewma"])

    return update


def stream_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming twin of ``operators.timeseries.ewma``: the per-key
    recurrence carried across micro-batches as a single double in the
    state store (checkpoint-recoverable); each event is emitted once
    with its running smoothed value (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_ewma_update(alpha),
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
