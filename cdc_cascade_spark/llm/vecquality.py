"""Embedding-table quality audit: corrupt-vector detection per label.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension; the
embedding-side sibling of ``dq_constraint_report``). Embedding tables
rot in practice — a failed encoder batch writes zero vectors, a
serialization bug injects NaNs, a model swap changes dimensionality —
and training or ANN indexing on rotten vectors fails late and
expensively. The audit every vector pipeline runs before indexing:

    (label, n_vectors, n_wrong_dim, n_nan, n_zero, n_low_norm)

- ``n_wrong_dim``: vectors whose length differs from the table's
  modal dimensionality (here the known 64);
- ``n_nan``: vectors containing any non-finite component;
- ``n_zero``: exactly-zero vectors (norm² = 0 — exact float test);
- ``n_low_norm``: vectors with norm² below ``LOW_NORM_SQ`` (encoder
  underflow); the squared-norm comparison avoids a sqrt and is
  bit-identical in both engines (strict left-to-right fold).

Every output is an integer count — floats live only inside
comparisons over bit-identical folds (the ``embedding_cluster_profile``
discipline), so the report is exactly reproducible cross-engine.

The synthetic embeddings are clean, so — the ``pii_redaction`` /
``multimodal_dedup`` precedent — deterministic corruption is injected
before the audit: every ``ZERO_MOD``-th vector is zeroed, every
``NAN_MOD``-th gets a NaN first component, every ``TRUNC_MOD``-th is
truncated to 8 dims, every ``SCALE_MOD``-th scaled to a tiny norm. The injection IS part of the registered query
(both engines apply it identically), so the detector paths are really
exercised at every SF.

Scale shape: map-only per-vector predicates (JVM array expressions,
no UDF) followed by one label-keyed aggregate with map-side partial
counts — no shuffle carries vectors.

Built in r8 after that round's 50-slot driver window was already
committed (the established late-surface pattern); registered in
r9. tests/test_splits_vecquality.py pins the oracle agreement and the
model invariants alongside the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

EXPECTED_DIM = 64
ZERO_MOD = 25
NAN_MOD = 37
# 49 is coprime with ZERO_MOD/NAN_MOD so the earlier injection branches
# cannot shadow every truncation candidate (50 was: all its multiples
# are multiples of 25 and were zeroed first, leaving n_wrong_dim = 0)
TRUNC_MOD = 49
SCALE_MOD = 45  # underflow case: vector scaled to a tiny norm
# squared-norm floor: testdata norms² sit well above 1e-2
LOW_NORM_SQ = 0.01


def _inject(emb: DataFrame) -> DataFrame:
    """Deterministic corruption (see module docstring)."""
    zeroed = F.transform(F.col("embedding"), lambda x: F.lit(0.0).cast("float"))
    nan_first = F.concat(
        F.array(F.lit(float("nan")).cast("float")),
        F.slice(F.col("embedding"), 2, EXPECTED_DIM - 1),
    )
    truncated = F.slice(F.col("embedding"), 1, 8)
    shrunk = F.transform(
        F.col("embedding"), lambda x: (x * F.lit(0.001)).cast("float")
    )
    vec = (
        F.when(F.col("vec_id") % ZERO_MOD == 0, zeroed)
        .when(F.col("vec_id") % NAN_MOD == 0, nan_first)
        .when(F.col("vec_id") % TRUNC_MOD == 0, truncated)
        .when(F.col("vec_id") % SCALE_MOD == 0, shrunk)
        .otherwise(F.col("embedding"))
    )
    return emb.select("vec_id", "label", vec.alias("embedding"))


def embedding_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corrupt-vector counts over the (corruption-injected)
    ``embeddings`` table."""
    emb = _inject(load_table(spark, sf_dir, "embeddings"))
    has_nan = F.exists(
        F.col("embedding"), lambda x: F.isnan(x) | x.isNull()
    )
    # strict left-to-right float64 fold (aggregate preserves order)
    norm_sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    flags = emb.select(
        "label",
        (F.size("embedding") != EXPECTED_DIM).cast("bigint").alias("wrong_dim"),
        has_nan.cast("bigint").alias("is_nan"),
        # NaN poisons the fold: count zero/low-norm only for finite
        # vectors so the buckets stay disjoint diagnoses
        F.when(~has_nan & (norm_sq == 0.0), 1).otherwise(0).cast("bigint").alias("is_zero"),
        F.when(
            ~has_nan & (norm_sq > 0.0) & (norm_sq < LOW_NORM_SQ), 1
        ).otherwise(0).cast("bigint").alias("is_low"),
    )
    return flags.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum("wrong_dim").alias("n_wrong_dim"),
        F.sum("is_nan").alias("n_nan"),
        F.sum("is_zero").alias("n_zero"),
        F.sum("is_low").alias("n_low_norm"),
    )


ORACLE_EMBEDDING_QUALITY = f"""
WITH injected AS (
  SELECT vec_id, label,
         CASE
           WHEN vec_id % {ZERO_MOD} = 0
             THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
           WHEN vec_id % {NAN_MOD} = 0
             THEN list_prepend(CAST('NaN' AS FLOAT),
                               embedding[2:{EXPECTED_DIM}])
           WHEN vec_id % {TRUNC_MOD} = 0 THEN embedding[1:8]
           WHEN vec_id % {SCALE_MOD} = 0
             THEN list_transform(embedding,
                                 x -> CAST(x * CAST(0.001 AS FLOAT) AS FLOAT))
           ELSE embedding
         END AS embedding
  FROM embeddings
), flagged AS (
  SELECT label,
         CASE WHEN len(embedding) <> {EXPECTED_DIM} THEN 1 ELSE 0 END AS wrong_dim,
         CASE WHEN len(list_filter(embedding,
                           x -> isnan(x) OR x IS NULL)) > 0
              THEN 1 ELSE 0 END AS is_nan,
         list_aggregate(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
           AS norm_sq_raw
  FROM injected
), f2 AS (
  SELECT label, wrong_dim, is_nan,
         CASE WHEN is_nan = 0 AND COALESCE(norm_sq_raw, 0) = 0
              THEN 1 ELSE 0 END AS is_zero,
         CASE WHEN is_nan = 0 AND COALESCE(norm_sq_raw, 0) > 0
                   AND norm_sq_raw < {LOW_NORM_SQ}
              THEN 1 ELSE 0 END AS is_low
  FROM flagged
)
SELECT label,
       COUNT(*)::BIGINT AS n_vectors,
       SUM(wrong_dim)::BIGINT AS n_wrong_dim,
       SUM(is_nan)::BIGINT AS n_nan,
       SUM(is_zero)::BIGINT AS n_zero,
       SUM(is_low)::BIGINT AS n_low_norm
FROM f2 GROUP BY label
"""


QUERIES: dict[str, tuple] = {
    "embedding_quality_report": (embedding_quality_report, ORACLE_EMBEDDING_QUALITY),
}
