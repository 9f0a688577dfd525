"""RANGE-frame window coverage: trailing time-interval aggregates.

Relational-surface extension (SURVEY.md §2): q28's window suite covers
ROWS frames, rank families, and lag/lead; this module adds the other
frame kind — RANGE frames keyed on a numeric day offset, the idiomatic
"trailing 7-day revenue per customer" shape.

Determinism contract: the order-by key is an integer day offset (both
engines define RANGE bounds over it identically; interval-typed RANGE
bounds are deliberately avoided — their null/dst semantics differ
across engines), and the windowed money sum goes through
``DECIMAL(27,2)`` so the in-frame accumulation is exact and
order-free (the q01 convention — tied ORDER BY keys make float
accumulation order nondeterministic inside a frame).

Scale shape (100 TB): one shuffle on ``o_custkey`` (the window
partition key), in-partition sort on the day offset — no global sort,
no driver collect; the custkey sample filter and the 4-column
projection push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

# Day-offset epoch for the integer RANGE key.
EPOCH = "1992-01-01"
# Every 20th customer — bounds the output (the operator's plan is
# identical for any predicate; the driver hashes full result values).
CUSTKEY_MOD = 20


def q32_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: trailing-7-day revenue and trailing-30-day order
    count within the customer, RANGE frames over an integer day key.

    Columns: (o_orderkey, o_custkey, day_off, rev_7d, n_orders_30d).
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % CUSTKEY_MOD == 0
    )
    day_off = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit(EPOCH).cast("date")
    )
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        day_off.cast("bigint").alias("day_off"),
        F.col("o_totalprice").cast("decimal(27,2)").alias("price"),
    )
    w7 = (
        Window.partitionBy("o_custkey").orderBy("day_off").rangeBetween(-6, 0)
    )
    w30 = (
        Window.partitionBy("o_custkey").orderBy("day_off").rangeBetween(-29, 0)
    )
    return base.select(
        "o_orderkey",
        "o_custkey",
        "day_off",
        F.sum("price").over(w7).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w30).alias("n_orders_30d"),
    )


ORACLE_Q32 = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(date_diff('day', DATE '{EPOCH}', CAST(o_orderdate AS DATE))
              AS BIGINT) AS day_off,
         CAST(o_totalprice AS DECIMAL(27,2)) AS price
  FROM orders
  WHERE o_custkey % {CUSTKEY_MOD} = 0
)
SELECT o_orderkey, o_custkey, day_off,
       CAST(SUM(price) OVER (
         PARTITION BY o_custkey ORDER BY day_off
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d,
       CAST(COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY day_off
         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_orders_30d
FROM base
"""


QUERIES: dict[str, tuple] = {
    "q32_range_frame_window": (q32_range_frame_window, ORACLE_Q32),
}
