"""Range (interval-containment) join — an operator Spark lacks natively.

A raw inequality join (``e.ts BETWEEN i.start AND i.end``) gives Spark
no equi-keys, so Catalyst falls back to a broadcast-nested-loop or
cartesian plan — O(|left|·|right|) comparisons, a non-starter at scale.
The standard scalable composition is **time-bucket binning**:

  1. each interval explodes into the fixed-width buckets it covers
     (explode factor = span/bucket_width, a small constant when the
     bucket width is chosen near the typical span)
  2. each event maps to exactly ONE bucket (its own)
  3. equi-join on (key, bucket) — a plain shuffled hash join Catalyst
     and AQE handle like any other — then the exact BETWEEN predicate
     filters bucket-boundary false positives

No pair is produced twice (an event has one bucket; an interval lists
each bucket once), so no dedup pass is needed. At 100 TB both sides
shuffle once on (key, bucket); skewed keys salt like any equi-join.

This is the same binning DuckDB/Trino/TimescaleDB use for interval
overlap acceleration; the reference delegates time filtering to
Postgres indexes (implicit — no explicit operator to cite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

RANGE_HOURS = 1


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    event_key: str,
    interval_key: str,
    event_time: str,
    start_col: str,
    end_col: str,
    bucket_unit: str = "hour",
) -> DataFrame:
    """Inner join of events to the intervals containing them
    (``start ≤ t < end``), via fixed-width time-bucket binning.

    ``bucket_unit`` is a ``date_trunc`` unit chosen near the typical
    interval span (explode factor = span/width + 1). Returns one row
    per (interval row, contained event) with all interval columns plus
    the event's columns.
    """
    binned_intervals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket_unit, F.col(start_col)),
                # end-exclusive, but the end bucket can still contain
                # events in [trunc(end), end) — include it; the exact
                # predicate below removes boundary false positives
                F.date_trunc(bucket_unit, F.col(end_col)),
                F.expr(f"INTERVAL 1 {bucket_unit}"),
            )
        ),
    )
    binned_events = events.withColumn(
        "__bucket", F.date_trunc(bucket_unit, F.col(event_time))
    )
    return (
        binned_intervals.join(
            binned_events,
            (F.col(interval_key) == F.col(event_key))
            & (binned_intervals["__bucket"] == binned_events["__bucket"]),
        )
        .filter(
            (F.col(event_time) >= F.col(start_col))
            & (F.col(event_time) < F.col(end_col))
        )
        .drop("__bucket")
    )


def range_join_signup_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Follow-on activity within 1 hour after each signup event — the
    canonical attribution-window interval join, anchored on the events
    table itself (each signup opens a [ts, ts+1h) window; any other
    event by the same user inside it attributes to that signup).
    """
    ev = load_table(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("anchor_user"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr(f"INTERVAL {RANGE_HOURS} HOURS")).alias("w_end"),
    )
    follows = ev.select("event_id", "user_id", "ts")
    joined = bucketed_range_join(
        follows,
        anchors,
        event_key="user_id",
        interval_key="anchor_user",
        event_time="ts",
        start_col="w_start",
        end_col="w_end",
    ).filter(F.col("event_id") != F.col("anchor_id"))  # not the signup itself
    return joined.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_follow_events"),
        F.min("ts").alias("first_follow_ts"),
        F.max("ts").alias("last_follow_ts"),
    )


ORACLE_RANGE_JOIN = f"""
SELECT a.event_id AS anchor_id,
       COUNT(*) AS n_follow_events,
       MIN(e.ts) AS first_follow_ts,
       MAX(e.ts) AS last_follow_ts
FROM events a JOIN events e
  ON a.event_type = 'signup'
 AND e.user_id = a.user_id
 AND e.event_id <> a.event_id
 AND e.ts >= a.ts
 AND e.ts <  a.ts + INTERVAL {RANGE_HOURS} HOUR
GROUP BY a.event_id
"""


QUERIES: dict[str, tuple] = {
    "range_join_signup_activity": (range_join_signup_activity, ORACLE_RANGE_JOIN),
}
