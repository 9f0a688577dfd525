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


def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise union/intersection cardinality estimates from merged
    KMV sketches: distinct users in (type_a ∪ type_b) and
    (type_a ∩ type_b) for every event-type pair.

    KMV sketches merge associatively: the union sketch is the K
    smallest of the two kept-hash sets combined, so the union estimate
    is the ordinary KMV estimator on the merged sketch, and the
    intersection estimate is ``union_est · ρ`` where ρ is the fraction
    of the merged sketch's hashes present in BOTH input sketches
    (Beyer et al., SIGMOD 2007 — public literature). When the merged
    set has fewer than K hashes both estimates collapse to exact
    counts (ρ's denominator becomes the merged size).

    Scale shape: the per-group sketch build is the same
    shuffle + WindowGroupLimit pass as ``sketch_kmv_distinct``; after
    it each group is ONE row carrying ≤K longs, so the pairwise
    self-join is |groups|² sketch rows — for any realistic group count
    this is driver-trivial and broadcastable. This is the whole point
    of sketch algebra at 100 TB: one pass over the data, then set
    arithmetic on kilobytes.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    hashed = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "event_type", token_hash(F.col("user_id").cast("string")).alias("h")
        )
        .distinct()
    )
    w = W.partitionBy("event_type").orderBy("h")
    kept = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("h")).alias("kh"))
    )
    a = kept.select(F.col("event_type").alias("type_a"), F.col("kh").alias("kh_a"))
    b = kept.select(F.col("event_type").alias("type_b"), F.col("kh").alias("kh_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("kh_a"), F.col("kh_b"))), 1, KMV_K
    )
    p = pairs.withColumn("mk", merged).withColumn(
        "nu", F.size(F.col("mk"))
    )
    union_est = F.when(
        F.col("nu") < KMV_K, F.col("nu").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        * F.lit(HASH_SPACE)
        / F.element_at(F.col("mk"), KMV_K).cast("double")
    )
    n_common = F.size(
        F.array_intersect(F.col("mk"), F.array_intersect(F.col("kh_a"), F.col("kh_b")))
    )
    out = p.withColumn("union_est", union_est).withColumn("n_common", n_common)
    inter_est = (
        F.col("union_est") * F.col("n_common").cast("double")
    ) / F.least(F.lit(KMV_K), F.col("nu")).cast("double")
    return out.select(
        "type_a",
        "type_b",
        "union_est",
        inter_est.alias("inter_est"),
        F.col("n_common").alias("n_common_kept"),
    )


ORACLE_KMV_SETOPS = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         {token_hash_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
  WHERE user_id IS NOT NULL
), kept AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
), sk AS (
  SELECT event_type, list_sort(list(h)) AS kh
  FROM kept WHERE rn <= {KMV_K}
  GROUP BY event_type
), pr AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.kh AS kh_a, b.kh AS kh_b,
         list_sort(list_distinct(a.kh || b.kh))[1:{KMV_K}] AS mk
  FROM sk a JOIN sk b ON a.event_type < b.event_type
), est AS (
  SELECT type_a, type_b, mk,
         len(mk) AS nu,
         CASE WHEN len(mk) < {KMV_K} THEN len(mk)::DOUBLE
              ELSE {float(KMV_K - 1)} * {HASH_SPACE} / mk[{KMV_K}]::DOUBLE
         END AS union_est,
         len(list_intersect(mk, list_intersect(kh_a, kh_b))) AS n_common
  FROM pr
)
SELECT type_a, type_b, union_est,
       (union_est * n_common::DOUBLE) / least({KMV_K}, nu)::DOUBLE AS inter_est,
       CAST(n_common AS INTEGER) AS n_common_kept
FROM est
"""


QUERIES: dict[str, tuple] = {
    "sketch_kmv_distinct": (sketch_kmv_distinct, ORACLE_KMV),
    "sketch_kmv_setops": (sketch_kmv_setops, ORACLE_KMV_SETOPS),
}
