"""Time-series gap filling: dense hourly spine + last-observation-
carried-forward interpolation.

Beyond-reference analytics surface (SURVEY.md §2 extension): the
TimescaleDB ``time_bucket_gapfill`` + ``locf`` pattern — sparse event
streams leave holes in rollups (at sf0.01 every event type is missing
~50 of the 720 span hours), and downstream dashboards/models need a
dense series with explicit zeros for counts and carried-forward values
for gauges.

Scale shape (100 TB):

- The hourly rollup is the standard explode-free groupBy (map-side
  partial agg, one shuffle on (type, hour)).
- The dense spine is |event types| × span-hours rows — generated from
  a 1-row global min/max bounds frame (bounded action-free broadcast)
  crossed with the distinct-type frame, i.e. spine size is independent
  of event count. The spine-to-rollup join is a left join on
  (type, hour), broadcastable from the spine side when the span is
  bounded, shuffle-join otherwise.
- The locf window partitions by event type and orders by hour — each
  partition is span-hours rows (the ROLLUP's cardinality, not the
  event count), so the sort is bounded even at 100 TB of raw events.
  For multi-year × million-key spines, segment the window by (type,
  day) and carry the last value across segment boundaries with a
  per-segment join (the standard two-phase locf) — same semantics,
  which is what this operator pins.

Determinism: counts are exact ints; the gauge is the decimal-summed
hourly value (one cast to double); locf copies values verbatim, and
hours before a type's first observation stay NULL in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (event_type, hour) series over the events table's span.

    Output: (event_type, hour, n_events, filled_value) — n_events is 0
    on gap hours; filled_value is the hourly decimal-summed value with
    gaps carrying the previous observed hour's value forward (NULL
    before a type's first observation).
    """
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(hour.alias("hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias(
            "sum_value"
        ),
    )
    bounds = ev.agg(
        F.min(hour).alias("h0"),
        F.max(hour).alias("h1"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias(
                "n_events"
            ),
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


def events_gap_fill_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase locf — the scale path the plain operator's docstring
    promises for multi-year × million-key spines, made concrete (and
    pinned equal to the single-window form by test).

    Phase 1 runs locf within (event_type, day) segments — each window
    partition is ≤ 24 rows regardless of span, so the sort never grows
    with history. Phase 2 fixes the rows still NULL (gap hours before
    their segment's first observation): the per-segment LAST filled
    value is a |segments|-sized frame; one more locf over THAT tiny
    frame (ordered by day, per type) yields each segment's carry-in,
    which a broadcast join maps back onto the unfixed rows. Total cost:
    two bounded-partition windows + one broadcast join — no partition
    ever holds more than max(24, |segments-per-type|) rows.
    """
    filled = events_gap_fill(spark, sf_dir)
    day = F.date_trunc("day", F.col("hour"))
    w_seg = (
        W.partitionBy("event_type", "seg")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    base = filled.select(
        "event_type",
        "hour",
        "n_events",
        day.alias("seg"),
        # recompute the raw per-hour value (NULL on gaps) from the
        # plain operator's output: a gap hour repeats the previous
        # filled value, so only observed hours carry their own value
        F.when(F.col("n_events") > 0, F.col("filled_value")).alias("raw_value"),
    )
    phase1 = base.withColumn(
        "seg_fill", F.last("raw_value", ignorenulls=True).over(w_seg)
    )
    seg_last = (
        phase1.groupBy("event_type", "seg")
        .agg(F.max_by("seg_fill", "hour").alias("seg_final"))
    )
    w_carry = (
        W.partitionBy("event_type")
        .orderBy("seg")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = seg_last.withColumn(
        "carry_in", F.last("seg_final", ignorenulls=True).over(w_carry)
    ).select("event_type", "seg", "carry_in")
    return (
        phase1.join(F.broadcast(carry), ["event_type", "seg"])
        .select(
            "event_type",
            "hour",
            "n_events",
            F.coalesce("seg_fill", "carry_in").alias("filled_value"),
        )
    )


ORACLE_GAP_FILL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events
), spine AS (
  SELECT t.event_type, gs.hour
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN bounds
  CROSS JOIN LATERAL unnest(generate_series(bounds.h0, bounds.h1,
                                            INTERVAL 1 HOUR)) gs(hour)
)
SELECT s.event_type, s.hour,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       last_value(h.sum_value IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM spine s LEFT JOIN hourly h USING (event_type, hour)
"""


QUERIES: dict[str, tuple] = {
    "events_gap_fill": (events_gap_fill, ORACLE_GAP_FILL),
    # The two-phase segmented locf is REQUIRED to produce the exact
    # same dense series as the single-window form, so it registers
    # against the identical oracle (r5 advice: move it from
    # self-consistency-tested to driver-verified). The driver thereby
    # cross-checks the bounded-partition scale path — two day-segment
    # windows + a broadcast carry-in join — against the plain SQL locf.
    "events_gap_fill_segmented": (events_gap_fill_segmented, ORACLE_GAP_FILL),
}
