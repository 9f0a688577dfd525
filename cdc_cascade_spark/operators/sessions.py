"""Native session-window aggregation over the events table — the
STREAMING-capable sessionization operator, driver-checked in batch.

Reference parity: the reference's pipeline is a stream of keyed events
whose per-key effects depend on event-time adjacency
(queue/cdc.go:62-89 consumes the ordered per-key stream;
sequence-flows.mmd's consumer scenarios are all gap-bounded bursts).
q13_sessionize_events (operators/relational.py:476) covers the batch
analog with lag+cumsum window functions; THIS face exercises Spark's
native ``session_window`` — the operator a Structured Streaming
deployment actually runs (state-store-backed merging session state
with watermark eviction) — so the engine's batch answer and its
streaming plan share one primitive. :func:`session_window_stream` is
the streaming variant; tests/test_sessions.py pins streamed ≡ batch
row-for-row on a multi-micro-batch file stream.

Semantics (empirically pinned, tests/test_sessions.py): Spark merges
an event into a session iff its gap from the session's last event is
≤ GAP (two events exactly GAP apart share a session; GAP + 1 µs
splits), i.e. a NEW session starts at ``diff > GAP`` — the same rule
q13's oracle states. The oracle below replicates it at MICROSECOND
precision (``epoch_us``), matching the engine's µs event-time exactly
(the ns→µs truncation both engines apply to the nanos parquet).

Output (one row per user — the key space, bounded by traffic):
``(user_id, n_sessions, total_events, max_session_events,
total_active_us, n_singletons)`` — all exact BIGINTs; ``active`` is
last-event − first-event per session (0 for singletons), free of the
window's synthetic ``+gap`` tail.

Scale shape (100 TB): ONE shuffle on user_id with AQE handling skewed
users; session merging is a per-key sorted merge inside partitions
(no per-event state across keys); the per-user rollup rides the same
partitioning (no second exchange — pinned in tests). In streaming
form the state store holds one open session per live (user, window) —
eviction is the watermark, so state is bounded by ACTIVE users, not
history.

Registered in r11, same round as built (the registration-pipeline
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

GAP_MINUTES = 30
GAP_US = GAP_MINUTES * 60 * 1_000_000


def session_frame(ev: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """One row per session via native ``session_window``:
    ``(user_id, start_us, last_us, n_events)`` — ``last_us`` is the
    session's last EVENT time (the window's end minus the synthetic
    gap tail), so downstream arithmetic never sees the gap constant.

    Works on a batch frame here and, unchanged, inside the streaming
    aggregation (:func:`session_window_stream` groups by the same
    expression)."""
    sw = F.session_window(
        F.col("ts").cast("timestamp"), f"{gap_minutes} minutes"
    )
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                "start_us"
            ),
            (
                F.unix_micros(F.col("w.end").cast("timestamp"))
                - F.lit(gap_minutes * 60 * 1_000_000)
            ).alias("last_us"),
            "n_events",
        )
    )


def q34_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session statistics from native session windows:
    ``(user_id, n_sessions, total_events, max_session_events,
    total_active_us, n_singletons)``."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    s = session_frame(ev)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
        F.sum(F.col("last_us") - F.col("start_us"))
        .cast("bigint")
        .alias("total_active_us"),
        F.sum((F.col("n_events") == 1).cast("int"))
        .cast("bigint")
        .alias("n_singletons"),
    )


def session_window_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    schema: str = "user_id long, ts timestamp",
    gap_minutes: int = GAP_MINUTES,
    watermark: str = "5 minutes",
    queryName: str = "session_windows",
    max_files_per_trigger: int = 1,
):
    """The same aggregation as a Structured Streaming query: finalized
    sessions (watermark passed their close) append to the memory sink
    ``queryName``. One open session per live (user, window) in the
    state store; the watermark both evicts state and finalizes rows —
    the operator's 100 TB form. Returns the started query."""
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    gap_us = gap_minutes * 60 * 1_000_000
    sess = (
        reader.withWatermark("ts", watermark)
        .groupBy(
            "user_id",
            F.session_window(F.col("ts"), f"{gap_minutes} minutes").alias(
                "w"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                "start_us"
            ),
            (
                F.unix_micros(F.col("w.end").cast("timestamp")) - gap_us
            ).alias("last_us"),
            "n_events",
        )
    )
    return (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
    )


ORACLE_Q34 = f"""
WITH base AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS us, event_id FROM events
), flagged AS (
  SELECT user_id, us, event_id,
         CASE WHEN us - LAG(us) OVER w > {GAP_US} THEN 1 ELSE 0 END
           AS new_session
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), sid AS (
  SELECT user_id, us,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM flagged
), sess AS (
  SELECT user_id, s, COUNT(*)::BIGINT AS n_events,
         (MAX(us) - MIN(us))::BIGINT AS active_us
  FROM sid GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*)::BIGINT AS n_sessions,
       SUM(n_events)::BIGINT AS total_events,
       MAX(n_events)::BIGINT AS max_session_events,
       SUM(active_us)::BIGINT AS total_active_us,
       SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
         AS n_singletons
FROM sess GROUP BY user_id
"""


QUERIES: dict[str, tuple] = {
    "q34_session_window_stats": (q34_session_window_stats, ORACLE_Q34),
}
