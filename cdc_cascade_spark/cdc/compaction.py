"""Latest-wins keyed compaction: changelog → current-state table.

This is the one semantic the reference leaves implicit (SURVEY.md §4):
its Postgres table *is* the current state and Redis invalidation keeps
the cache consistent with it (reference: queue/cdc.go:188-191). In a
Spark engine the current state must be *derived* from the change
stream: for each key keep the event with the highest LSN (reference
orders by ``payload.source.lsn``, queue/cdc.go:53), and drop keys whose
final operation is a delete.

Scale: one shuffle on the key; rank-pushdown (WindowGroupLimit) keeps
only the top row per key before the filter. For 100 TB changelogs this
is the standard "compact by key" shape — AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def with_initial_snapshot(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Prefix a changelog with a snapshot of pre-existing rows (C4).

    Debezium's initial snapshot emits every existing row as ``op='r'``
    before streaming begins (reference: debezium-setup.sh default
    snapshot mode; consumer handling queue/cdc.go:181-186). Here the
    snapshot rows get order-key values *below* every changelog event
    (lsn 0), so latest-wins compaction treats them as the oldest
    version of each key — a changelog event for the same key always
    wins.

    ``snapshot`` must carry the key columns and any payload columns the
    changelog carries; missing changelog-only columns are null-filled.

    ``order_cols`` must be numeric (the LSN case): the snapshot rank is
    a literal 0, which is only guaranteed to sort below every changelog
    value for non-negative numeric orders. A timestamp order column
    would silently become 1970-01-01 and a string column ``'0'`` —
    neither reliably minimal — so non-numeric order columns are
    rejected here rather than miscompacted later.
    """
    from pyspark.sql import functions as F

    _NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    for c in order_cols:
        dt = dict(changelog.dtypes)[c]
        if dt not in _NUMERIC and not dt.startswith("decimal"):
            raise TypeError(
                f"with_initial_snapshot order column {c!r} has type {dt}; "
                "only numeric order columns (e.g. lsn) can rank snapshot "
                "rows below the changelog with a 0 literal"
            )

    snap = snapshot.withColumn(op_col, F.lit("r"))
    for c in order_cols:
        snap = snap.withColumn(c, F.lit(0).cast(dict(changelog.dtypes)[c]))
    for c in changelog.columns:
        if c not in snap.columns:
            snap = snap.withColumn(c, F.lit(None).cast(dict(changelog.dtypes)[c]))
    return snap.select(changelog.columns).unionByName(changelog)


def latest_wins(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str | None = "d",
) -> DataFrame:
    """Keep each key's latest event; drop keys whose last op is a delete.

    ``order_cols`` must be a total order per key (e.g. ``lsn`` or
    ``(source.lsn, source.ts_ms)``) — ties would make the result
    nondeterministic, exactly the cross-batch-ordering hazard SURVEY.md
    §7 flags. Pass ``delete_op=None`` to keep delete markers (a sink
    that applies deletes itself needs to see them).
    """
    w = W.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_op is None:
        return latest
    return latest.filter(F.col(op_col) != delete_op)


def current_state(
    payloads: DataFrame,
    key_field: str = "code",
    image_fields: Sequence[str] | None = None,
) -> DataFrame:
    """Reconstruct the source table from envelope payloads (inverse of C1).

    For non-delete events the row image is ``after``; deletes carry only
    ``before``. Compaction key = after/before key, order = source.lsn.
    """
    keyed = payloads.select(
        F.coalesce(F.col(f"after.{key_field}"), F.col(f"before.{key_field}")).alias(
            "__key"
        ),
        F.col("source.lsn").alias("__lsn"),
        F.col("op"),
        F.col("after"),
    )
    latest = latest_wins(keyed, ["__key"], ["__lsn"], op_col="op")
    if image_fields is None:
        return latest.select("after.*")
    return latest.select([F.col(f"after.{f}").alias(f) for f in image_fields])
