"""Bounded persisted-DataFrame cache, shared by the feature frames that
multiple queries consume (CDC envelope fixture, SimHash fingerprints,
shingle-hash sets).

Semantics every user signs up for:

- Keyed by (applicationId, sf_dir): one persisted frame per session and
  data directory, so repeated queries in one process (the bench, the
  driver's correctness sweep) pay the build once.
- Bounded: past ``max_entries`` the oldest entry is unpersisted and
  dropped — a long-lived session cycling many sf_dirs cannot pin
  executor memory without limit.
- Staleness: a cached frame reflects the parquet contents at first
  read. Rewriting a directory's files within the SAME application
  serves stale data (matching Spark's own FileScan cache behavior);
  restart the session or evict to re-read.
- Thread-safe: concurrent callers (foreachBatch worker threads,
  parallel query runners) may both build on a cold key; exactly one
  build wins the slot and the loser is unpersisted, so no persisted
  frame can leak executor memory.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class BoundedDFCache:
    def __init__(self, max_entries: int = 4) -> None:
        self._max = max_entries
        self._entries: dict[tuple[str, str], DataFrame] = {}
        self._lock = threading.Lock()

    def get_or_build(
        self,
        spark: SparkSession,
        sf_dir: str,
        build: Callable[[], DataFrame],
    ) -> DataFrame:
        key = (spark.sparkContext.applicationId, sf_dir)
        with self._lock:
            cached = self._entries.get(key)
        if cached is not None:
            return cached
        # Build outside the lock: plan construction can be slow and must
        # not serialize unrelated keys. Re-check under the lock — the
        # losing builder unpersists its frame instead of leaking it.
        out = build().persist()
        with self._lock:
            winner = self._entries.get(key)
            if winner is not None:
                out.unpersist()
                return winner
            while len(self._entries) >= self._max:
                oldest = next(iter(self._entries))
                self._entries.pop(oldest).unpersist()
            self._entries[key] = out
        return out
