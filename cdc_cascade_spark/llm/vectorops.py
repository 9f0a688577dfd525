"""Embedding vector operations: quantization and batch k-NN join.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): the
two vector-column workhorses a training/retrieval pipeline runs that
the single-query ANN family (llm/similarity.py) doesn't cover —
storage-side int8 quantization of the whole embedding table, and the
batch "find neighbors for EVERY query in a set" join that labeling,
retrieval-augmentation, and eval pipelines need.

Scale shapes (100 TB):

- ``embedding_quantize`` is map-only: per-row JVM array expressions
  (no UDF, no shuffle, no Python) — the plan is scan → project →
  write, fully pipelined with whole-stage codegen. int8 output cuts
  vector storage 4× and is the input format IVF/PQ indexes consume.
- ``knn_join_topk`` broadcasts the (small) query set, computes cosines
  map-side via the Arrow pandas_udf dot kernel, and takes the per-query
  top-k with a row_number window over (query_id) — Spark plans the
  rank filter as WindowGroupLimit, so each partition keeps only k rows
  per query before the shuffle (no global sort, no full materialize).
  At N queries ≫ broadcast size, switch the query side to the IVF
  route (llm/similarity.py) per query shard — the plumbing is the same.

Determinism: quantization is pure elementwise float64 arithmetic with
an identical operation order in both engines; cosines use the strict
left-to-right fold (see llm/similarity.py docstring) with a ROUND(·,9)
guard; top-k ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.similarity import _cosine_sql, _dot_pd, _with_norm

# int8 symmetric quantization range: values land in [-QUANT_LEVELS,
# QUANT_LEVELS]; floor() (not round()) because its float64 semantics
# are identical across engines — round() half-way tie rules differ.
QUANT_LEVELS = 127

# Batch k-NN join parameters: the first N_QUERIES vec_ids form the
# query set; every query gets its KNN_K nearest non-query vectors.
N_QUERIES = 5
KNN_K = 3


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding.

    Per vector: ``scale = max|x| / 127`` and ``q_i = floor((x_i /
    max|x|) * 127)`` — dequantization is ``q_i * scale`` with worst-case
    error one level. The quantized vector is emitted as a CSV string
    (``q_csv``) so the driver's value hash compares scalar columns only.
    All-zero vectors quantize to all-zero with scale 0.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # two-step projection so maxabs (itself a 64-element transform+max)
    # is evaluated once per row, not re-inlined into every consumer —
    # higher-order array functions are interpreted (CodegenFallback),
    # so Catalyst's subexpression elimination does not cover them
    staged = emb.select(
        "vec_id",
        "label",
        xd.alias("xd"),
        F.array_max(F.transform(xd, F.abs)).alias("maxabs"),
    )
    maxabs = F.col("maxabs")
    q = F.when(
        maxabs == 0.0, F.transform(F.col("xd"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("xd"),
            lambda x: F.floor((x / maxabs) * QUANT_LEVELS).cast("int"),
        )
    )
    return staged.select(
        "vec_id",
        "label",
        (maxabs / QUANT_LEVELS).alias("scale"),
        F.array_join(q, ",").alias("q_csv"),
    )


ORACLE_QUANTIZE = f"""
WITH x AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS xd,
         list_max(list_transform(embedding::DOUBLE[], v -> abs(v))) AS maxabs
  FROM embeddings
)
SELECT vec_id, label,
       maxabs / {QUANT_LEVELS} AS scale,
       CASE WHEN maxabs = 0
            THEN array_to_string(list_transform(xd, v -> 0), ',')
            ELSE array_to_string(list_transform(
                   xd, v -> CAST(floor((v / maxabs) * {QUANT_LEVELS}) AS INTEGER)), ',')
       END AS q_csv
FROM x
"""


def knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN join: the ``KNN_K`` nearest non-query vectors for
    EVERY query vector (``vec_id < N_QUERIES``) in one plan.

    Output: (query_id, neighbor_id, label, cosine, rnk) — rnk 1..K per
    query, ties broken on neighbor_id.
    """
    from pyspark.sql import Window as W

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    cand = emb.filter(F.col("vec_id") >= N_QUERIES)
    cos = F.round(
        _dot_pd(F.col("embedding"), F.col("qvec"))
        / (F.col("norm") * F.col("qnorm")),
        9,
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            cos.alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
    )


ORACLE_KNN_JOIN = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         {_cosine_sql('e.embedding', 'q.qvec')} AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id >= {N_QUERIES}
)
SELECT query_id, neighbor_id, label, cosine,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored
)
WHERE rnk <= {KNN_K}
"""


QUERIES: dict[str, tuple] = {
    "embedding_quantize": (embedding_quantize, ORACLE_QUANTIZE),
    "knn_join_topk": (knn_join_topk, ORACLE_KNN_JOIN),
}
