"""Custom stateful streaming operators (applyInPandasWithState).

The engine's streaming surface needs operators Spark doesn't ship:

- ``first_seen_filter``: cross-batch streaming dedup — emit each key's
  first-ever event, suppress every later one. The keyed state is one
  marker per key; at 100 TB-of-stream the state store (RocksDB in prod
  config) holds only key + flag, and a watermark-driven timeout can
  bound retention where business rules allow.

- ``running_counts``: per-key running event count with update-mode
  emission — the minimal template for custom aggregating state.

Both are Arrow-batched (pandas in/out) per the engine's UDF policy:
Python only where built-in operators genuinely can't express the
semantics (cross-batch keyed state in arbitrary code).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_filter(
    events: DataFrame, key_col: str, out_cols: list[str]
) -> DataFrame:
    """Streaming dedup: pass through only the first event per key."""

    schema = ", ".join(f"{c} {t}" for c, t in events.select(out_cols).dtypes)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch
        # A group's batch may arrive as several Arrow chunks; the
        # sort-minimal row can be in any of them, so keep each chunk's
        # head candidate and sort once at the end.
        heads = [
            pdf.sort_values(out_cols).head(1)[out_cols]
            for pdf in pdfs
            if len(pdf)
        ]
        if heads:
            state.update((True,))
            yield pd.concat(heads).sort_values(out_cols).head(1)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts(events: DataFrame, key_col: str) -> DataFrame:
    """Per-key running count across micro-batches (update mode)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        batch_n = sum(len(pdf) for pdf in pdfs)
        if batch_n:
            n += batch_n
            state.update((n,))
            yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
