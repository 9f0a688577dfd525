"""Batch heavy-hitter report: the skew monitor's oracle-checkable face.

The streaming hot-key monitor (``streaming/windows.py::hot_keys``)
feeds the targeted salted join (``operators/skew.py``) a live list of
keys that would melt a reducer. Its batch face — the same windowed
threshold count over a bounded table — is what a scheduled pipeline
runs nightly to pre-compute tomorrow's salting list, and unlike the
streaming form it fits the fixed-table single-statement oracle
contract. ``tests/test_streaming.py`` already pins streaming ≡ batch
convergence for the operator pair; registering the batch face puts the
shared semantics under the external driver gate too.

Output: ``(window_start, key, n_events, share_ppm)`` for every
(day, user_id) whose count reaches ``HOT_MIN_COUNT``; ``share_ppm``
is the key's parts-per-million share of its day — an integer
(``n*1e6 div day_total``, exact in both engines), so a consumer can
threshold on relative skew without float comparisons.

Scale shape: one shuffle on (day, key) with map-side partial counts,
a day-keyed total re-reduced FROM those counts (day cardinality,
tiny) broadcast back, and an integer threshold — no corpus-sized
state past the first partial aggregation. Hot keys are aggregate
KEYS here (absorbed map-side), which is the point: the monitor must
not itself melt under the skew it measures.

Built in r8 after that round's 50-slot driver window was already
committed (the established late-surface pattern); registered in
r9. tests/test_heavyhitters.py pins the oracle agreement and the
model invariants alongside the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

# Same floor as the streaming monitor's test configuration: high
# enough to prune most keys, low enough that the testdata's genuinely
# hot (day, user) pairs survive at sf0.01.
HOT_MIN_COUNT = 6


def hot_keys_frame(
    traffic: DataFrame,
    ts_col: str | None = "ts",
    key_col: str = "user_id",
    min_count: int = HOT_MIN_COUNT,
) -> DataFrame:
    """Frame-level heavy-hitter report over any traffic frame — the
    registered ``events_hot_keys`` query below and the composed ingest
    pipeline's default salting list (streaming/ingest.py) both call
    this, so the two surfaces cannot drift. ``ts_col=None`` collapses
    the day windows into one global window (``window_start`` pinned to
    the epoch — a non-null constant, so the totals join still matches)
    — the shape a per-batch self-derived hot list needs, where the
    batch IS the period."""
    if ts_col is None:
        window = (
            F.lit("1970-01-01 00:00:00")
            .cast("timestamp_ntz")
            .alias("window_start")
        )
    else:
        window = (
            F.date_trunc("day", F.col(ts_col).cast("timestamp"))
            .cast("timestamp_ntz")
            .alias("window_start")
        )
    daily = traffic.groupBy(window, F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    # day totals re-reduced from the (day, key) counts — integer sums
    # are associative, so this equals counting raw events per day
    # without a second events scan
    totals = daily.groupBy("window_start").agg(
        F.sum("n_events").alias("day_total")
    )
    return (
        daily.filter(F.col("n_events") >= min_count)
        .join(F.broadcast(totals), "window_start")
        .select(
            "window_start",
            "key",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.expr("(n_events * 1000000) div day_total")
            .cast("bigint")
            .alias("share_ppm"),
        )
    )


def events_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily heavy-hitter user keys over ``events`` with ppm share."""
    return hot_keys_frame(
        load_table(spark, sf_dir, "events"),
        ts_col="ts",
        key_col="user_id",
        min_count=HOT_MIN_COUNT,
    )


ORACLE_EVENTS_HOT_KEYS = f"""
WITH daily AS MATERIALIZED (
  SELECT date_trunc('day', ts) AS window_start,
         user_id AS key,
         COUNT(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
totals AS (
  SELECT window_start, SUM(n_events) AS day_total FROM daily GROUP BY 1
)
SELECT d.window_start, d.key, d.n_events,
       ((d.n_events * 1000000) // t.day_total)::BIGINT AS share_ppm
FROM daily d JOIN totals t USING (window_start)
WHERE d.n_events >= {HOT_MIN_COUNT}
"""


QUERIES: dict[str, tuple] = {
    "events_hot_keys": (events_hot_keys, ORACLE_EVENTS_HOT_KEYS),
}
