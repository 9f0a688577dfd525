"""Concurrent materialization of independent DataFrames (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls
them sequentially. The multi-modality retrieval reports each assemble
several INDEPENDENT lists (sparse, dense, chunked — separate scans,
separate shuffles, separate driver-side probe collects) and then
aggregate a few (Q·k)-row frames; submitting the list materializations
from a small thread pool lets one list's tasks back-fill the executor
slots another list's tail leaves idle, and — just as important at bench
scale — lets the driver ANALYZE/plan the independent queries
concurrently instead of serially (the multi-second retrieval slots are
driver-bound: their 8-vs-32-core scaling ratio is 1.0).

FIFO scheduling (the default) gives exactly the back-fill behaviour
wanted here; 2-3 jobs in flight is plenty. Each frame is materialized
via ``localCheckpoint(eager=True)``, which truncates its lineage to a
leaf — the same snapshot discipline the retrieval family already uses,
moved off the single-threaded critical path. Results are unchanged:
a checkpoint only pins the frame's computed rows.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from collections.abc import Callable

from pyspark.sql import DataFrame


def run_concurrently(
    *builders: Callable[[], DataFrame], max_workers: int = 3
) -> list[DataFrame]:
    """Run each builder on its own driver thread and return their
    frames in input order. Builders must be independent (no builder
    may consume another's frame) and should END with an eager action
    (``.localCheckpoint(eager=True)``) so the overlap actually covers
    the compute, not just plan construction. Exceptions propagate to
    the caller, as with sequential execution."""
    if not builders:
        return []
    if len(builders) == 1:
        return [builders[0]()]
    with ThreadPoolExecutor(max_workers=min(max_workers, len(builders))) as pool:
        futures = [pool.submit(b) for b in builders]
        return [f.result() for f in futures]
