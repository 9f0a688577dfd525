"""Behavioral analytics over the event stream: funnel conversion and
cohort retention.

The two workhorse queries of every large-scale product-analytics
pipeline (and of training-data telemetry dashboards), expressed
Spark-first with DuckDB oracles. The reference has no analog
(SURVEY.md §2.E negative space); this extends the relational surface
the same way the q-series does.

Scale shape (100 TB of events):

- Both queries shuffle ONLY on ``user_id`` (funnel) or
  ``user_id``/cohort keys (retention) — the natural high-cardinality,
  well-distributed keys of an event store. No global windows, no
  driver-side state.
- The funnel's three stages are chained user-keyed aggregates/joins on
  the SAME key, so Catalyst reuses the hash partitioning across
  stages instead of re-shuffling (exchange reuse); each stage's output
  is one row per surviving user — monotonically shrinking.
- Retention's ``(user, week)`` distinct is a map-side-combinable
  dedup; the final rollup groups by (cohort_week, week_offset) — a
  few hundred cells regardless of corpus size.

Determinism: timestamp minima, integer day arithmetic, and counts
only — no float accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

# The funnel: users who viewed, then clicked AFTER their first view,
# then purchased AFTER that first qualifying click.
FUNNEL_STAGES = ["view", "click", "purchase"]


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel counts: (stage, n_users).

    Stage semantics are first-touch: a user converts stage k iff an
    event of stage-k type exists strictly after their stage-(k−1)
    conversion time (first qualifying event). Output is one row per
    stage with the surviving-user count — n_users is non-increasing
    down the funnel by construction.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = [
        v.select(F.lit("1_view").alias("stage"), "user_id"),
        c.select(F.lit("2_click").alias("stage"), "user_id"),
        p.select(F.lit("3_purchase").alias("stage"), "user_id"),
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


ORACLE_FUNNEL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
), staged AS (
  SELECT '1_view' AS stage, user_id FROM v
  UNION ALL SELECT '2_click', user_id FROM c
  UNION ALL SELECT '3_purchase', user_id FROM p
)
SELECT stage, COUNT(*) AS n_users FROM staged GROUP BY stage
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, n_users).

    cohort_week = Monday-truncated week of the user's first event;
    a user counts in offset k iff they had ANY event during
    cohort_week + k weeks. Offsets are exact integer day arithmetic
    (``datediff div 7`` over week-truncated timestamps), so the grid
    is engine-identical.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr("datediff(week, cohort_week) div 7")
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ORACLE_COHORT = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT f.cohort_week,
       CAST(datediff('day', f.cohort_week, a.week) // 7 AS INTEGER)
         AS week_offset,
       COUNT(*) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "funnel_conversion": (funnel_conversion, ORACLE_FUNNEL),
    "cohort_retention": (cohort_retention, ORACLE_COHORT),
}
