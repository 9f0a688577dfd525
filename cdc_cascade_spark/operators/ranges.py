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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_unit: str = "day",
) -> DataFrame:
    """Inner join of two interval sets on key equality + interval
    overlap (end-exclusive: ``s1 < e2 AND s2 < e1``) — the general
    interval×interval case of :func:`bucketed_range_join`.

    Both sides explode into the fixed-width buckets they cover and
    equi-join on (key, bucket). Overlapping pairs share ≥1 bucket, but
    possibly many — instead of a distinct pass (an extra shuffle over
    the pair set), each pair is kept only in its FIRST shared bucket,
    ``max(trunc(s1), trunc(s2))``: that bucket is wlog the later
    interval's first bucket, and overlap (``s1 < e2``) guarantees the
    earlier interval lists it too, so every overlapping pair survives
    in exactly one bucket. One shuffle per side, no dedup stage — the
    same plan cost as the containment join.

    Column names must be disjoint across ``left`` and ``right``
    (rename before calling, as for any self-join).
    """
    one = F.expr(f"INTERVAL 1 {bucket_unit}")

    def binned(df: DataFrame, s: str, e: str, out: str) -> DataFrame:
        return df.withColumn(
            out,
            F.explode(
                F.sequence(
                    F.date_trunc(bucket_unit, F.col(s)),
                    F.date_trunc(bucket_unit, F.col(e)),
                    one,
                )
            ),
        )

    bl = binned(left, left_start, left_end, "__lb")
    br = binned(right, right_start, right_end, "__rb")
    first_shared = F.greatest(
        F.date_trunc(bucket_unit, F.col(left_start)),
        F.date_trunc(bucket_unit, F.col(right_start)),
    )
    return (
        bl.join(
            br,
            (F.col(left_key) == F.col(right_key))
            & (F.col("__lb") == F.col("__rb")),
        )
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("__lb") == first_shared)
        )
        .drop("__lb", "__rb")
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


def overlap_join_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer overlapping order-fulfilment windows: each order
    opens a [orderdate, orderdate + 1..7 days) window (span keyed off
    the order key, deterministic); count same-customer window pairs
    that overlap and total the overlap seconds — the classic
    concurrent-intervals analysis (double-booking / overlapping
    sessions), via :func:`interval_overlap_join`.

    Overlap seconds come from ``unix_timestamp`` diffs (whole-second
    timestamps by construction), summed as bigint — exact in both
    engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    span = "make_dt_interval(CAST(o_orderkey % 7 AS INT) + 1)"
    w = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("s"),
        F.expr(f"CAST(o_orderdate AS TIMESTAMP) + {span}").alias("e"),
    )
    # Bucket width sized to the span (r17-opt, guide §2.3 — shuffle
    # fewer bytes): windows are 1-7 days, so day buckets exploded each
    # row ~4.5× before the join; week buckets cover any ≤7-day window
    # with at most 2 rows (~1.2× avg) — 3-4× fewer rows built and
    # probed, identical pair semantics (the first-shared-bucket proof
    # in interval_overlap_join is bucket-width-free).
    a = w.select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_custkey").alias("a_cust"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
    )
    b = w.select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_custkey").alias("b_cust"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    pairs = interval_overlap_join(
        a, b, "a_cust", "b_cust", "a_s", "a_e", "b_s", "b_e", bucket_unit="week"
    ).filter(F.col("a_key") < F.col("b_key"))  # each unordered pair once
    overlap_sec = F.unix_timestamp(
        F.least(F.col("a_e"), F.col("b_e"))
    ) - F.unix_timestamp(F.greatest(F.col("a_s"), F.col("b_s")))
    return pairs.groupBy(F.col("a_cust").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_overlap_pairs"),
        F.sum(overlap_sec).alias("total_overlap_sec"),
    )


ORACLE_OVERLAP_JOIN = """
WITH w AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_orderdate AS TIMESTAMP) AS s,
         CAST(o_orderdate AS TIMESTAMP)
           + ((o_orderkey % 7) + 1) * INTERVAL 1 DAY AS e
  FROM orders
)
SELECT a.o_custkey AS custkey,
       COUNT(*) AS n_overlap_pairs,
       CAST(SUM(date_diff('second',
                          greatest(a.s, b.s),
                          least(a.e, b.e))) AS BIGINT) AS total_overlap_sec
FROM w a JOIN w b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND a.s < b.e AND b.s < a.e
GROUP BY a.o_custkey
"""


QUERIES: dict[str, tuple] = {
    "range_join_signup_activity": (range_join_signup_activity, ORACLE_RANGE_JOIN),
    "overlap_join_order_windows": (overlap_join_order_windows, ORACLE_OVERLAP_JOIN),
}
