"""Hopping (sliding) event-time windows over the bounded events table.

Relational/streaming coverage extension: the tumbling hourly rollup
(operators/timeseries.py's family, q17) counts each event once; real
rate monitoring usually wants OVERLAPPING windows — here 2-hour
windows sliding by 1 hour, the batch face of Structured Streaming's
``window(ts, '2 hours', '1 hour')``. Each event belongs to exactly two
hop-aligned windows (``date_trunc('hour', ts)`` and the hour before),
so the operator is an explode-by-2 followed by one aggregation — the
same shape Spark's own window() function lowers to, written explicitly
so the DuckDB oracle states the identical arithmetic.

Output: ``(window_start, n_events, n_users)`` for every 2-hour window
with at least one event.

Scale shape: map-side explode (2 rows per event, no shuffle), ONE
shuffle on window_start with map-side partial counts; the distinct
user count is Spark's standard two-phase distinct aggregate (partial
on (window, user) first), so hot windows are absorbed map-side.
Windows are only ever hour-aligned — the key space is bounded by the
time range, not the event volume.

Registered in r9, same round as built (r8 verdict #3).
tests/test_dedup_eval.py pins the oracle agreement and a pure-Python
window-coverage model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

# Hop grain is pinned to date_trunc('hour', ts) — the one truncation
# both engines share — so the hop is 1 hour by construction and the
# only free parameter is the window span. Each event's hour-hop then
# belongs to WINDOW_HOURS consecutive windows, and the explode list /
# oracle unnest list are BOTH generated from _HOP_OFFSETS below, so
# editing WINDOW_HOURS changes the Spark plan and the oracle in
# lockstep (r9 advice: the old standalone HOP_HOURS/WINDOW_HOURS pair
# was declared but never consumed and could silently drift from the
# hardcoded 2-element arithmetic).
WINDOW_HOURS = 2
_HOP_OFFSETS = list(range(WINDOW_HOURS))  # hours back from the event's hop


def q33_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows hopping hourly over ``events``:
    ``(window_start, n_events, n_users)``."""
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    h = F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz")
    starts = [h - F.expr(f"INTERVAL {o} HOUR") for o in reversed(_HOP_OFFSETS)]
    return (
        ev.select(
            F.explode(F.array(*starts)).alias("window_start"),
            "user_id",
        )
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


def hopping_window_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    schema: str = "user_id long, ts timestamp",
    watermark: str = "1 minute",
    queryName: str = "hopping_windows",
    max_files_per_trigger: int = 1,
):
    """q33's aggregation as a Structured Streaming query — the last
    windowed-agg face to gain a streaming twin (tumbling: q17 +
    test_late_data; sessions: q34 + test_sessions): native
    ``window(ts, '2 hours', '1 hour')`` with TWO CHAINED stateful
    aggregations — (window, user) partial counts, then the per-window
    rollup — which is the exact-distinct shape that scales (state per
    (window, user), map-side absorbable; a collect_set would hold
    every user id in one row's buffer). Spark ≥3.4 supports the chain
    in append mode; finalized windows (watermark passed their close)
    append to the memory sink ``queryName``.
    tests/test_hopping_stream.py pins streamed ≡ q33's batch face
    row-for-row on a multi-micro-batch file stream with hop windows
    spanning batches. Returns the started query."""
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    per_user = (
        reader.withWatermark("ts", watermark)
        .groupBy(
            F.window(
                F.col("ts"), f"{WINDOW_HOURS} hours", "1 hour"
            ).alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rolled = (
        per_user.groupBy("w")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "n_users"
        )
    )
    return (
        rolled.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )


_UNNEST_STARTS = ",\n                 ".join(
    f"date_trunc('hour', ts) - INTERVAL {o} HOUR"
    for o in reversed(_HOP_OFFSETS)
)

ORACLE_Q33 = f"""
WITH w AS (
  SELECT unnest([{_UNNEST_STARTS}]) AS window_start,
         user_id
  FROM events
)
SELECT window_start,
       COUNT(*)::BIGINT AS n_events,
       COUNT(DISTINCT user_id)::BIGINT AS n_users
FROM w GROUP BY window_start
"""


QUERIES: dict[str, tuple] = {
    "q33_hopping_windows": (q33_hopping_windows, ORACLE_Q33),
}
