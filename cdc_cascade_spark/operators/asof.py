"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, find the latest right row with the same key whose
time is ≤ the left row's time. Implemented with the scalable
union-sort-window composition:

  1. tag and union both sides on (key, time)
  2. one window per key ordered by (time, right-before-left on ties,
     tiebreaker) with ``last(struct(<right cols>), ignorenulls=True)``
     carrying the most recent right row forward — a SINGLE struct, not
     one carry per column, so every ``matched_*`` value comes from the
     same right row even when some right columns are NULL (per-column
     carries would stitch fields from different rows and resurrect
     stale non-NULL values over a legitimately-NULL latest one)
  3. keep left rows, project the struct's fields

One shuffle + one sort per key — no per-key loops, no range-explosion
join, state bounded by the window frame. This is the standard 100 TB
as-of shape (pd.merge_asof per group via applyInPandas is the
small-data alternative; the window form wins at scale because it never
materializes per-key pandas frames).

Ties (several right rows at the same timestamp) break by a caller-
supplied tiebreaker column (highest wins), which keeps the result
deterministic — native ASOF implementations (e.g. DuckDB's ASOF JOIN)
leave tie choice unspecified, so the oracle uses this same windowed
SQL rather than ASOF syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tiebreaker: str,
) -> DataFrame:
    """Left as-of join: all left columns + ``matched_<col>`` for each
    right value column (NULL when no right row is ≤ the left time)."""
    left_cols = left.columns
    rv_type = (
        "struct<"
        + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_values)
        + ">"
    )
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.col(tiebreaker).cast("long").alias("__tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        F.struct(*[F.col(c).alias(c) for c in right_values]).alias("__rv"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy("__k")
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_right").desc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__m")
    )
    return carried.filter(F.col("__is_right") == 0).select(
        *left_cols,
        *[F.col(f"__m.{c}").alias(f"matched_{c}") for c in right_values],
    )


def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event matched to the user's most recent order at event time."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        tiebreaker="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("matched_o_orderkey").alias("asof_orderkey"),
        F.col("matched_o_totalprice").alias("asof_totalprice"),
    )


ORACLE_ASOF = """
WITH u AS (
  SELECT user_id AS k, ts AS t, 0 AS is_right, event_id,
         NULL::BIGINT AS tb,
         NULL::STRUCT(orderkey BIGINT, totalprice DOUBLE) AS rv
  FROM events
  UNION ALL
  SELECT o_custkey, o_orderdate, 1, NULL,
         o_orderkey,
         {'orderkey': o_orderkey, 'totalprice': o_totalprice}
  FROM orders
), carried AS (
  SELECT event_id, k, is_right,
         last_value(rv IGNORE NULLS) OVER w AS m
  FROM u
  WINDOW w AS (PARTITION BY k
               ORDER BY t ASC, is_right DESC, tb ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, k AS user_id, m.orderkey AS asof_orderkey,
       m.totalprice AS asof_totalprice
FROM carried WHERE is_right = 0
"""


QUERIES: dict[str, tuple] = {
    "asof_latest_order": (asof_latest_order, ORACLE_ASOF),
}
