"""Deterministic scalable quantiles: fixed-width histogram estimation.

The exact-percentile operators (q18, corpus_profile) buffer each
group's values in the reducer — the documented trade that stops
scaling when a group outgrows executor memory. Spark's production
answer is ``percentile_approx``, but its t-digest sketch is
engine-specific, so it can never pass the cross-engine oracle gate.
This operator is the third point in that design space: a fixed-width
histogram quantile that is BOTH scalable (partial-aggregated counts;
per-group state is O(buckets), never O(rows)) AND bit-deterministic
across engines (integer bucket counts; the interpolation is a fixed
sequence of IEEE double ops identical in Spark and DuckDB) — so the
oracle can check it row-for-row.

    bucket(v)   = floor(v / W)                    (W = BUCKET_WIDTH)
    cum(b)      = Σ counts of buckets ≤ b         (window over the
                                                   tiny histogram)
    est_q(p)    = the first bucket where cum ≥ ceil(p·n), linearly
                  interpolated inside the bucket assuming uniformity:
                  b·W + W · (target − cum_prev) / count(b)

Estimation error is bounded by W (one bucket width) — pinned against
the exact percentile in tests. At 100 TB: one partial-aggregated
groupBy (group, bucket) whose output is |groups|·|buckets| rows, then
a window over that histogram frame (thousands of rows, not billions).
Tighter error = smaller W = proportionally more (still tiny) histogram
rows; W is static here for oracle determinism, adaptive two-pass
(min/max then W = range/k) in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

BUCKET_WIDTH = 1000.0
QUANTILES = (0.5, 0.9)


def quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-estimated p50/p90 of o_totalprice per order status.

    Output: (o_orderstatus, n_orders, est_p50, est_p90) — estimates
    within BUCKET_WIDTH of the exact percentiles (pinned by test).
    """
    orders = load_table(spark, sf_dir, "orders")
    hist = (
        orders.select(
            "o_orderstatus",
            F.floor(F.col("o_totalprice") / BUCKET_WIDTH).alias("bucket"),
        )
        .groupBy("o_orderstatus", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        W.partitionBy("o_orderstatus")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy("o_orderstatus")
    cum = hist.select(
        "o_orderstatus",
        "bucket",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    outs = []
    for q in QUANTILES:
        target = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        est = (
            F.col("bucket").cast("double") * BUCKET_WIDTH
            + F.lit(BUCKET_WIDTH)
            * (
                (target - (F.col("cum") - F.col("cnt"))).cast("double")
                / F.col("cnt").cast("double")
            )
        )
        outs.append(
            cum.filter(F.col("cum") >= target)
            .groupBy("o_orderstatus")
            .agg(
                F.max("n").alias("n_orders"),
                F.min_by(est, F.col("bucket")).alias(f"est_p{int(q * 100)}"),
            )
        )
    a, b = outs
    return a.join(
        b.select("o_orderstatus", "est_p90"), "o_orderstatus"
    ).select(
        "o_orderstatus",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        "est_p50",
        "est_p90",
    )


def _oracle_quantile_sql() -> str:
    def est_cte(q: float, name: str) -> str:
        pct = int(q * 100)
        return f"""
, t{pct} AS (
  SELECT o_orderstatus, CAST(ceil({q} * n) AS BIGINT) AS target, n
  FROM (SELECT DISTINCT o_orderstatus, n FROM cum)
), {name} AS (
  SELECT c.o_orderstatus, c.n,
         (CAST(c.bucket AS DOUBLE) * {BUCKET_WIDTH}
          + {BUCKET_WIDTH} * (CAST(t.target - (c.cum - c.cnt) AS DOUBLE)
                              / CAST(c.cnt AS DOUBLE))) AS est
  FROM cum c JOIN t{pct} t USING (o_orderstatus)
  WHERE c.cum >= t.target
  QUALIFY ROW_NUMBER() OVER (PARTITION BY c.o_orderstatus
                             ORDER BY c.bucket ASC) = 1
)"""

    return f"""
WITH hist AS (
  SELECT o_orderstatus,
         CAST(floor(o_totalprice / {BUCKET_WIDTH}) AS BIGINT) AS bucket,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
), cum AS (
  SELECT o_orderstatus, bucket, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n
  FROM hist
){est_cte(0.5, "e50")}{est_cte(0.9, "e90")}
SELECT e50.o_orderstatus,
       CAST(e50.n AS BIGINT) AS n_orders,
       e50.est AS est_p50,
       e90.est AS est_p90
FROM e50 JOIN e90 USING (o_orderstatus)
"""


ORACLE_QUANTILE_HISTOGRAM = _oracle_quantile_sql()


QUERIES: dict[str, tuple] = {
    "quantile_histogram": (quantile_histogram, ORACLE_QUANTILE_HISTOGRAM),
}
