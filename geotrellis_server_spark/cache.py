"""Request cache (SURVEY.md O6 — reference tile cache keyed by full
GetMap params, `GetMap.scala:42-43,66-73`, and the WCS 32-entry / 1-hour
request cache sized for QGIS probing, `GetCoverage.scala:71-77`).

Two cache tiers exist in this engine:
- the MATERIALIZED tiles/histograms tables (the durable, cluster-wide
  cache — parquet/Iceberg snapshots; see SURVEY O6 mapping), and
- this in-process LRU+TTL for rendered request responses (bytes /
  small collected results), which absorbs map-client probing patterns
  without re-running the Spark job.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from threading import Lock
from typing import Callable, Hashable, TypeVar

V = TypeVar("V")


class RequestCache:
    """LRU with TTL; thread-safe; reference defaults 32 entries / 1 h."""

    def __init__(self, max_entries: int = 32, ttl_seconds: float = 3600.0,
                 clock: Callable[[], float] = time.monotonic):
        self.max_entries = int(max_entries)
        self.ttl = float(ttl_seconds)
        self._clock = clock
        self._data: OrderedDict[Hashable, tuple[float, object]] = OrderedDict()
        self._lock = Lock()
        self.hits = 0
        self.misses = 0

    def get_or(self, key: Hashable, fn: Callable[[], V]) -> V:
        now = self._clock()
        with self._lock:
            hit = self._data.get(key)
            if hit is not None and now - hit[0] <= self.ttl:
                self._data.move_to_end(key)
                self.hits += 1
                return hit[1]  # type: ignore[return-value]
            self.misses += 1
        value = fn()  # compute OUTSIDE the lock (Spark jobs are slow)
        # NOTE: concurrent misses on the same key each compute fn() —
        # accepted (the reference's caffeine cache behaves the same for
        # plain get-or-load); last writer wins below.
        with self._lock:
            # stamp AFTER fn() returns — a slow compute must not eat into
            # the entry's TTL
            self._data[key] = (self._clock(), value)
            self._data.move_to_end(key)
            while len(self._data) > self.max_entries:
                self._data.popitem(last=False)
        return value

    def invalidate(self, key: Hashable | None = None) -> None:
        with self._lock:
            if key is None:
                self._data.clear()
            else:
                self._data.pop(key, None)

    def __len__(self) -> int:
        return len(self._data)
