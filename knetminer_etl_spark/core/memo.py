"""Bounded LRU mapping for session-lifetime plan-choice memos.

The engine memoizes three kinds of driver-held state per (application,
input identity, hyperparameters): corpus counts (operators/util
.memo_count), clone-probe statistics (operators/dedup._CLONE_VERDICTS)
and small trained models (runtime/modelcache). All three are PLAN
DECISIONS or deterministic re-derivable state — a stale or evicted
entry can change which physical plan runs (or re-pay one probe job),
never what it outputs (pinned in tests/test_round10.py). That property
makes unbounded growth the only hazard: a long-lived session driving
many distinct inputs accumulates entries forever (VERDICT r9 #5), so
every memo is a :class:`BoundedMemo` — least-recently-USED eviction at
a size bound generous enough that round-driven batch jobs never evict.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable


class BoundedMemo:
    """An LRU-bounded mapping with the small dict surface the memos use.

    Reads refresh recency; inserting past ``maxsize`` evicts the least
    recently used entry. Not thread-safe by design — all users are
    driver-side plan construction, which Spark serializes per action.
    """

    def __init__(self, maxsize: int = 1024) -> None:
        if maxsize < 1:
            raise ValueError(f"maxsize must be positive, got {maxsize}")
        self.maxsize = maxsize
        self._data: OrderedDict[Hashable, Any] = OrderedDict()

    def get(self, key: Hashable, default: Any = None) -> Any:
        if key in self._data:
            self._data.move_to_end(key)
            return self._data[key]
        return default

    def __contains__(self, key: Hashable) -> bool:
        return key in self._data

    def __getitem__(self, key: Hashable) -> Any:
        if key not in self._data:
            raise KeyError(key)
        self._data.move_to_end(key)
        return self._data[key]

    def __setitem__(self, key: Hashable, value: Any) -> None:
        if key in self._data:
            self._data.move_to_end(key)
        self._data[key] = value
        while len(self._data) > self.maxsize:
            self._data.popitem(last=False)

    def __len__(self) -> int:
        return len(self._data)

    def __delitem__(self, key: Hashable) -> None:
        del self._data[key]

    def __iter__(self):
        # snapshot: callers iterate while inserting (probe loops)
        return iter(list(self._data))

    def keys(self):
        return list(self._data)

    def items(self):
        return list(self._data.items())

    def clear(self) -> None:
        self._data.clear()
