"""Event-rate anomaly detection: per-type hourly z-score flags in
exact integer arithmetic.

Ops-surface extension (SURVEY.md §2): the monitoring question "which
hours had an abnormal event rate for this type?" — the batch analog of
the streaming hot-key / drift monitors, and the shape behind every
rate-alerting pipeline.

The z-score needs mean and standard deviation, but a sqrt would break
the cross-engine bit-determinism contract. Instead both the flag and
the reported score work on z², which is exactly rational: with H hours
observed for a type, S = Σn and Q = Σn² over its hourly counts,

    z²(n) = (n·H − S)² / (H·Q − S²)

(the (H·Q − S²) denominator is H² · population variance). The flag
``is_anomaly`` is the INTEGER comparison (n·H − S)² > k²·(H·Q − S²)
with k = Z_THRESHOLD — no float forms anywhere in the decision; the
reported ``z_squared`` is one IEEE division of the two exact integers.
All products go through decimal(38,0) (Spark) / HUGEINT (DuckDB) so
corpus-scale counts cannot overflow int64.

Scale shape (100 TB): one shuffle to the (type, hour) rollup with
map-side combine; the per-type moment frame is |types| rows and
broadcast back onto the rollup — nothing past the first aggregate is
corpus-sized. Hot types skew the FIRST aggregate only, where partial
aggregation absorbs them map-side.

Registered in r8 (built in r7 after that round's driver window was
committed); tests/test_anomaly.py pins the z-score decision rule
alongside the oracle row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

Z_THRESHOLD = 2  # flag |z| > 2, i.e. z² > 4


def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event count deviates > Z_THRESHOLD sigmas from the
    type's own hourly mean: (event_type, hour, n_events, z_squared,
    is_anomaly) for EVERY observed (type, hour) — the full report, with
    the flag column carrying the decision."""
    ev = load_table(spark, sf_dir, "events")
    # The hourly rollup feeds TWO consumers (the moments aggregate and
    # the join's left side); without a snapshot each re-scans the raw
    # events table — at 100 TB that doubles the dominant cost. The
    # rollup itself is hours×types-sized (tiny), so the snapshot is
    # nearly free: measured 0.65 → 0.51 s warm at sf0.1, events scans
    # in the executed plan 2 → 0 (both reads hit the snapshot).
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events")).localCheckpoint(eager=False)
    dec = "decimal(38,0)"
    moments = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("h"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events").cast(dec) * F.col("n_events")).alias("q"),
    )
    dev = F.col("n_events").cast(dec) * F.col("h") - F.col("s")
    num = dev * dev
    den = F.col("q") * F.col("h") - F.col("s").cast(dec) * F.col("s")
    return (
        hourly.join(F.broadcast(moments), "event_type")
        .select(
            "event_type",
            "hour",
            "n_events",
            F.when(den > 0, num.cast("double") / den.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("z_squared"),
            (num > Z_THRESHOLD * Z_THRESHOLD * den).alias("is_anomaly"),
        )
    )


ORACLE_RATE_ANOMALY = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), moments AS (
  SELECT event_type,
         COUNT(*) AS h,
         SUM(n_events) AS s,
         SUM(n_events::HUGEINT * n_events) AS q
  FROM hourly GROUP BY event_type
)
SELECT hourly.event_type, hourly.hour, hourly.n_events,
       CASE WHEN (q * h - s::HUGEINT * s) > 0
            THEN CAST((n_events::HUGEINT * h - s) * (n_events::HUGEINT * h - s)
                      AS DOUBLE)
                 / CAST(q * h - s::HUGEINT * s AS DOUBLE)
            ELSE 0.0 END AS z_squared,
       (n_events::HUGEINT * h - s) * (n_events::HUGEINT * h - s)
         > {Z_THRESHOLD * Z_THRESHOLD} * (q * h - s::HUGEINT * s) AS is_anomaly
FROM hourly JOIN moments USING (event_type)
"""


QUERIES: dict[str, tuple] = {
    "events_rate_anomaly": (events_rate_anomaly, ORACLE_RATE_ANOMALY),
}
