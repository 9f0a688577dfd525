"""Keyed sinks for the CDC stream: cache invalidation + materialized view.

The reference's sink is ``Redis.DEL <pk>`` per update/delete event
(reference: queue/cdc.go:188-197), executed before the offset commit —
at-least-once delivery with an idempotent effect. Structured Streaming's
``foreachBatch`` + checkpointing gives the identical contract: a batch
may be re-delivered after a crash, and the sink must tolerate replay.

``KeyValueStore`` is the Redis-shaped protocol; ``InMemoryKVStore``
backs tests. A real Redis client drops in behind the same protocol
(import-gated — the redis package is not in this environment).

Scale note: ``invalidate_batch`` pulls only the *distinct invalidation
keys* of one micro-batch to the driver — bounded by
``maxOffsetsPerTrigger`` (the analog of the reference's 100-record
poll), never by table size. For very hot topics the loop moves into
``foreachPartition`` with one client per executor partition; the logic
is isolated here so that swap touches one function.
"""

from __future__ import annotations

import threading
from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class KeyValueStore(Protocol):
    def set(self, key: str, value: str) -> None: ...
    def get(self, key: str) -> str | None: ...
    def delete(self, key: str) -> None: ...


class InMemoryKVStore:
    """Thread-safe dict store standing in for Redis in tests.

    DEL is idempotent (deleting an absent key is a no-op), matching
    Redis semantics the reference relies on for at-least-once replay.
    """

    def __init__(self) -> None:
        self._data: dict[str, str] = {}
        self._lock = threading.Lock()
        self.deletes: list[str] = []  # audit log for tests

    def set(self, key: str, value: str) -> None:
        with self._lock:
            self._data[key] = value

    def get(self, key: str) -> str | None:
        with self._lock:
            return self._data.get(key)

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)
            self.deletes.append(key)

    def snapshot(self) -> dict[str, str]:
        with self._lock:
            return dict(self._data)


class IdempotentBatchSink:
    """Exactly-once effects over an at-least-once channel.

    ``foreachBatch`` may replay a batch after a crash (same batch_id).
    Recording committed batch ids and skipping replays upgrades any
    sink effect to exactly-once — the standard pattern when the effect
    itself is NOT naturally idempotent (unlike the reference's Redis
    DEL, which is). The committed-id set would live in the sink system
    (e.g. a Redis SET or a transactional table) in production.
    """

    def __init__(self, apply) -> None:
        self._apply = apply
        self.committed: set[int] = set()
        self.replays_skipped = 0

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.committed:
            self.replays_skipped += 1
            return
        self._apply(batch_df, batch_id)
        self.committed.add(batch_id)


def invalidate_batch(store: KeyValueStore, keys_df: DataFrame, key_col: str) -> None:
    """Apply one micro-batch of invalidations: DEL each distinct key."""
    for row in keys_df.select(key_col).distinct().toLocalIterator():
        store.delete(str(row[key_col]))


def upsert_view_batch(
    store: KeyValueStore,
    batch_payloads: DataFrame,
    key_field: str,
) -> None:
    """Maintain a materialized latest-row view (the cache-rebuild side of
    the reference's sequence-flows.mmd:45-53: after invalidation, reads
    repopulate the cache from the source of truth — here we push the new
    row image directly instead of waiting for a read-through miss).

    Within a batch, latest-LSN-wins; deletes remove the key.
    """
    from cdc_cascade_spark.cdc.compaction import latest_wins

    keyed = batch_payloads.select(
        F.coalesce(F.col(f"after.{key_field}"), F.col(f"before.{key_field}")).alias(
            "__key"
        ),
        F.col("source.lsn").alias("__lsn"),
        "op",
        F.to_json("after").alias("after_json"),
    )
    latest = latest_wins(keyed, ["__key"], ["__lsn"], op_col="op", delete_op=None)
    for row in latest.toLocalIterator():
        if row["op"] == "d":
            store.delete(str(row["__key"]))
        else:
            store.set(str(row["__key"]), row["after_json"])
