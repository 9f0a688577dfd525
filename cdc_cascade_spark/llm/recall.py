"""ANN recall evaluation: bucketed-LSH top-k measured against exact
brute-force ground truth, per query.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): every
approximate-nearest-neighbor deployment ships with a recall dial
(probes, buckets, cells) and the ONLY way to set it is to measure
recall@k on a query sample against the exact answer. The engine has
both sides already verified in isolation (``ann_cosine_topk`` exact,
``ann_lsh_topk`` bucketed — llm/similarity.py); this query runs the
evaluation loop over a deterministic MULTI-query sample and reports
per-query recall, the table an index-tuning run actually reads.

Output, one row per query vector (``vec_id % QUERY_MOD == 0`` capped
at ``Q_CAP`` queries by the id bound — a fixed eval budget):

    (qid, n_truth, n_approx, n_hits, recall_ppm)

``n_truth`` = exact top-k size (k, or the corpus bound), ``n_approx``
= candidates the query's own LSH bucket yielded (≤ k; 0 when the
bucket is otherwise empty — kept as an honest 0-recall row),
``n_hits`` = overlap, ``recall_ppm = n_hits * 1e6 div n_truth``
(integer, exact in both engines).

Determinism: cosines ride the same strict left-to-right IEEE fold and
round-to-9 as the whole similarity family; top-k cuts order by
``(cosine DESC, vec_id ASC)`` — a total order, so the k-sets are
identical cross-engine.

Scale shape (100 TB): the query sample is bounded (≤ Q_CAP queries —
the eval budget, never corpus-proportional); ground truth is the
expensive side BY DESIGN (Q broadcast queries × corpus scan — O(n·Q)
total with the cap, Arrow-vectorized dot
kernels, per-partition top-k before the merge — Q·k rows ever
shuffle); the approx side joins the bucketed corpus on bucket id,
scanning ~1/2^planes of it per query. Nothing corpus-sized shuffles;
the report is Q rows.

Registered in r9, same round as built (r8 verdict #3).
tests/test_mixing_leakage.py pins the oracle agreement, a numpy
brute-force model of the truth sets, and the recall invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.similarity import (
    LSH_PLANES,
    TOPK,
    _bucket_sql,
    _bucket_udf,
    _cosine_sql,
    _dot,
    _with_norm,
)

# Fixed-size deterministic query set: every 50th vec_id, capped at
# Q_CAP queries via the id bound (vec_id < QUERY_MOD * Q_CAP — a pure
# pushdown predicate, no ordering shuffle, no action). 10 queries at
# sf0.001/0.01 (500 vectors — under the cap, identical to the pre-cap
# sample), 16 at sf0.1+ (r9 verdict #4: the uncapped modulus made the
# query set corpus-proportional, so the exact ground-truth stage grew
# O(n²/MOD); with the cap it is O(n·Q_CAP) — the eval budget is fixed
# no matter how large the corpus gets).
QUERY_MOD = 50
Q_CAP = 16


def _topk_per_query(scored: DataFrame) -> DataFrame:
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK)
        .select("qid", "vec_id")
    )


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of single-probe bucketed LSH vs exact:
    ``(qid, n_truth, n_approx, n_hits, recall_ppm)``."""
    bucket_pd = _bucket_udf(LSH_PLANES)
    emb = _with_norm(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "embedding",
        "norm",
        bucket_pd(F.col("embedding")).alias("bucket"),
    )
    # the bucketed+normed relation feeds three consumers (queries,
    # truth scan, bucket scan): snapshot so the Arrow kernels run once
    emb = emb.localCheckpoint(eager=False)
    queries = emb.filter(
        (F.col("vec_id") % QUERY_MOD == 0)
        & (F.col("vec_id") < QUERY_MOD * Q_CAP)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    cosine = F.round(
        _dot(F.col("embedding"), F.col("qvec"))
        / (F.col("norm") * F.col("qnorm")),
        9,
    ).alias("cosine")
    truth = _topk_per_query(
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine)
    )
    approx = _topk_per_query(
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("qid")),
        ).select("qid", "vec_id", cosine)
    )
    # Overlap rollup as ONE pass over the tagged union (r17-opt, guide
    # §2.4 — the chunk_retrieval_eval rewrite): the former tn/an/hits
    # triple consumed each top-k list twice, so BOTH list subtrees
    # (the exact corpus scan + the bucket-pruned scan, each with its
    # rank window) re-planned and re-executed per consumer. Each
    # (qid, vec_id) appears at most once per list, so per-pair max of
    # the side tags recovers membership exactly — identical to the old
    # left-join arithmetic (qids restricted to the truth side, missing
    # counts 0). One exchange, each list computed once.
    tagged = truth.select(
        "qid", "vec_id", F.lit(1).alias("t"), F.lit(0).alias("a")
    ).unionByName(
        approx.select("qid", "vec_id", F.lit(0).alias("t"), F.lit(1).alias("a"))
    )
    per_pair = (
        tagged.repartition("qid")
        .groupBy("qid", "vec_id")
        .agg(F.max("t").alias("in_t"), F.max("a").alias("in_a"))
    )
    return (
        per_pair.groupBy("qid")
        .agg(
            F.sum("in_t").cast("bigint").alias("n_truth"),
            F.sum("in_a").cast("bigint").alias("n_approx"),
            F.sum(F.col("in_t") * F.col("in_a")).cast("bigint").alias("n_hits"),
        )
        .filter(F.col("n_truth") > 0)
        .select(
            "qid",
            "n_truth",
            "n_approx",
            "n_hits",
            F.expr("(n_hits * 1000000) div n_truth")
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


def _recall_oracle_sql() -> str:
    bucket = _bucket_sql("embedding", LSH_PLANES)
    cos = _cosine_sql("b.embedding", "q.qvec")
    return f"""
WITH b AS MATERIALIZED (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
q AS MATERIALIZED (
  SELECT vec_id AS qid, embedding AS qvec, bucket AS qbucket
  FROM b WHERE vec_id % {QUERY_MOD} = 0 AND vec_id < {QUERY_MOD * Q_CAP}
),
truth AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT q.qid, b.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid ORDER BY {cos} DESC, b.vec_id ASC) AS rnk
    FROM b, q WHERE b.vec_id <> q.qid
  ) WHERE rnk <= {TOPK}
),
approx AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT q.qid, b.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid ORDER BY {cos} DESC, b.vec_id ASC) AS rnk
    FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.qid
  ) WHERE rnk <= {TOPK}
),
tn AS (SELECT qid, COUNT(*)::BIGINT AS n_truth FROM truth GROUP BY qid),
an AS (SELECT qid, COUNT(*)::BIGINT AS n_approx FROM approx GROUP BY qid),
hits AS (
  SELECT t.qid, COUNT(*)::BIGINT AS n_hits
  FROM truth t JOIN approx a ON t.qid = a.qid AND t.vec_id = a.vec_id
  GROUP BY t.qid
)
SELECT tn.qid, tn.n_truth,
       COALESCE(an.n_approx, 0)::BIGINT AS n_approx,
       COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
       ((COALESCE(h.n_hits, 0) * 1000000) // tn.n_truth)::BIGINT
         AS recall_ppm
FROM tn
LEFT JOIN an ON an.qid = tn.qid
LEFT JOIN hits h ON h.qid = tn.qid
"""


ORACLE_ANN_RECALL = _recall_oracle_sql()


QUERIES: dict[str, tuple] = {
    "ann_recall_report": (ann_recall_report, ORACLE_ANN_RECALL),
}
