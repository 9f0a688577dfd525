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
from cdc_cascade_spark.llm.similarity import (
    _cosine_sql,
    _dot_pd,
    _empty_ann,
    _with_norm,
)

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


# Quantized-scan + exact-rerank parameters: the int8 pass keeps a
# candidate pool this large, the float rerank returns the final top-k.
INT8_RERANK_POOL = 32
INT8_TOPK = 10


def _quantize_arr(xd_col, maxabs_col):
    """array<double> of int8 quantization levels (the same floor
    arithmetic as :func:`embedding_quantize`, kept as an array instead
    of CSV so dot products can consume it)."""
    return F.when(
        maxabs_col == 0.0, F.transform(xd_col, lambda x: F.lit(0.0))
    ).otherwise(
        F.transform(
            xd_col,
            lambda x: F.floor((x / maxabs_col) * QUANT_LEVELS).cast("double"),
        )
    )


def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-scan ANN: int8 cosine over the whole table, exact
    float rerank of the top ``INT8_RERANK_POOL`` candidates.

    This is the production shape for memory/IO-bound ANN: the scan
    pass reads 4×-smaller int8 vectors (here materialized inline; on
    disk it is the ``embedding_quantize`` output) and only the small
    rerank pool ever touches the full-precision floats. Output:
    (vec_id, label, cosine_int8, cosine) — final order by EXACT
    cosine, so the int8 pass only chooses candidates, exactly like a
    PQ/IVF first stage.

    Determinism (what makes this oracle-checkable): quantization
    levels are integers in [-127, 127]; an int8 dot is a sum of 64
    products ≤ 127² whose partial sums stay far below 2^53, so BOTH
    engines' float64 dot of integer-valued arrays is EXACT regardless
    of summation order — no fold-order convention needed, unlike the
    float path. The rerank then follows the module's strict-fold
    float convention, and both stages carry the ROUND(·, 9) guard
    with vec_id tie-breaks.

    Scale shape: scan → map-side int8 cosine → TakeOrderedAndProject
    for the pool (no global sort) → 32-row exact rerank. One bounded
    1-row collect picks the query id (same contract as the LSH/IVF
    family).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    staged = emb.select(
        "vec_id",
        "label",
        "embedding",
        xd.alias("xd"),
        F.array_max(F.transform(xd, F.abs)).alias("maxabs"),
    )
    qtz = staged.select(
        "vec_id", "label", "embedding", _quantize_arr(F.col("xd"), F.col("maxabs")).alias("qarr")
    )
    qrows = emb.orderBy("vec_id").limit(1).select("vec_id").collect()
    if not qrows:
        # _empty_ann carries the contract schema (label is INT in the
        # embeddings table) so the empty branch cannot diverge from the
        # non-empty path's types
        return _empty_ann(spark, "cosine_int8", "double")
    qid = int(qrows[0].vec_id)
    qdf = qtz.filter(F.col("vec_id") == qid).select(
        F.col("embedding").alias("qvec"), F.col("qarr").alias("q_qarr")
    )
    cos_i8 = F.round(
        _dot_pd(F.col("qarr"), F.col("q_qarr"))
        / (
            F.sqrt(_dot_pd(F.col("qarr"), F.col("qarr")))
            * F.sqrt(_dot_pd(F.col("q_qarr"), F.col("q_qarr")))
        ),
        9,
    )
    # Pool cut via a rank filter, NOT orderBy().limit(): a non-terminal
    # sort+limit plans as a rangepartitioning exchange that ships EVERY
    # scored row — a full-corpus shuffle at 100 TB. The rank filter
    # plans as WindowGroupLimit(Partial) → each task forwards only its
    # local top-POOL rows into the single final partition (≤ POOL ×
    # n_tasks rows shuffled, like TakeOrderedAndProject but staying a
    # DataFrame for the rerank stage). Plan pinned by
    # tests/test_plans.py::test_int8_pool_cut_is_window_group_limit.
    from pyspark.sql import Window as W

    scored = (
        qtz.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(qdf))
        .select(
            "vec_id", "label", "embedding", "qvec", cos_i8.alias("cosine_int8")
        )
    )
    wpool = W.orderBy(F.desc("cosine_int8"), F.asc("vec_id"))
    pool = (
        scored.withColumn("prnk", F.row_number().over(wpool))
        .filter(F.col("prnk") <= INT8_RERANK_POOL)
        .drop("prnk")
    )
    exact = F.round(
        _dot_pd(F.col("embedding"), F.col("qvec"))
        / (
            F.sqrt(_dot_pd(F.col("embedding"), F.col("embedding")))
            * F.sqrt(_dot_pd(F.col("qvec"), F.col("qvec")))
        ),
        9,
    )
    return (
        pool.select("vec_id", "label", "cosine_int8", exact.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(INT8_TOPK)
    )


ORACLE_INT8_TOPK = f"""
WITH x AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS xd,
         list_max(list_transform(embedding::DOUBLE[], v -> abs(v))) AS maxabs
  FROM embeddings
), qt AS (
  SELECT vec_id, label, xd,
         CASE WHEN maxabs = 0 THEN list_transform(xd, v -> 0.0)
              ELSE list_transform(
                     xd, v -> floor((v / maxabs) * {QUANT_LEVELS})) END AS qarr
  FROM x
), q AS (
  SELECT xd AS q_xd, qarr AS q_qarr FROM qt
  WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
), scored AS (
  SELECT t.vec_id, t.label, t.xd, q.q_xd,
         round(list_dot_product(t.qarr, q.q_qarr)
               / (sqrt(list_dot_product(t.qarr, t.qarr))
                  * sqrt(list_dot_product(q.q_qarr, q.q_qarr))), 9) AS cosine_int8
  FROM qt t, q
  WHERE t.vec_id <> (SELECT MIN(vec_id) FROM embeddings)
), pool AS (
  SELECT * FROM scored
  ORDER BY cosine_int8 DESC, vec_id ASC LIMIT {INT8_RERANK_POOL}
)
SELECT vec_id, label, cosine_int8,
       {_cosine_sql('xd', 'q_xd')} AS cosine
FROM pool
ORDER BY cosine DESC, vec_id ASC
LIMIT {INT8_TOPK}
"""


QUERIES: dict[str, tuple] = {
    "embedding_quantize": (embedding_quantize, ORACLE_QUANTIZE),
    "knn_join_topk": (knn_join_topk, ORACLE_KNN_JOIN),
    "ann_int8_topk": (ann_int8_topk, ORACLE_INT8_TOPK),
}
