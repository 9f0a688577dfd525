"""Deterministic distinct-count sketch (KMV / k-minimum-values).

Spark's built-in ``approx_count_distinct`` is a HyperLogLog++ whose
exact register values are engine-specific — fine for production, but
not checkable against a DuckDB oracle. The KMV sketch fills that gap:
hash every value with the cross-engine md5 hash (functions/hashing.py)
and keep the K smallest hashes per group; the estimator

    distinct ≈ (K - 1) · H / h_(K)      (H = hash-space size, 2^60)

is a pure function of the kept hashes, so BOTH engines produce the
identical estimate bit-for-bit (one double multiply + one divide).
Groups with fewer than K distinct hashes report the exact count.

Scale shape: the distinct-(group, hash) pass is one shuffle with
map-side partial dedup; the per-group K-smallest selection is a
rank-pushdown window (WindowGroupLimit keeps K rows per group before
the full sort materializes). State per group is K longs — the whole
point of a sketch. At 100 TB this is the shape of every "distinct
users per segment" dashboard query.

KMV reference: Bar-Yossef et al., "Counting distinct elements in a
data stream" (RANDOM 2002) — public literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash, token_hash_sql

KMV_K = 64
HASH_SPACE = float(2**60)  # token_hash is 15 hex digits = 60 bits


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    NULL values are excluded before hashing (COUNT DISTINCT semantics).
    Without the filter the engines diverge: Spark's row_number sorts a
    NULL hash first while DuckDB defaults to NULLS LAST, so the kept
    set — and n_kept — could differ.
    """
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        group_col, token_hash(F.col(value_col).cast("string")).alias("h")
    ).distinct()
    w = W.partitionBy(group_col).orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_min"),
    ).select(
        group_col,
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth_min").cast("double")
        )
        .alias("distinct_est"),
        F.col("n_kept"),
    )


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type, estimated with a KMV sketch."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_distinct(ev, "event_type", "user_id")


ORACLE_KMV = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         {token_hash_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
  WHERE user_id IS NOT NULL
), kept AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
)
SELECT event_type,
       CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*)::DOUBLE
            ELSE {float(KMV_K - 1)} * {HASH_SPACE} / MAX(h)::DOUBLE
       END AS distinct_est,
       COUNT(*) AS n_kept
FROM kept
WHERE rn <= {KMV_K}
GROUP BY event_type
"""


QUERIES: dict[str, tuple] = {
    "sketch_kmv_distinct": (sketch_kmv_distinct, ORACLE_KMV),
}
