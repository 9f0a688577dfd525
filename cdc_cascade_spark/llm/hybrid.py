"""Hybrid retrieval: reciprocal-rank fusion of sparse BM25 and dense
cosine top-k lists.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): with
both retrieval modalities registered — sparse lexical (llm/bm25.py)
and dense embedding (llm/similarity.py) — the face a production
retrieval stack actually serves is their FUSION. Reciprocal-rank
fusion (RRF, Cormack et al.'s rank-only combiner) is the standard:
it needs no score calibration across modalities because it consumes
only the two rank lists:

    rrf(q, d) = Σ_{lists containing d}  1 / (RRF_K + rank_list(d))

Per-item evidence columns (``sparse_rank`` / ``dense_rank``, NULL
when a list missed the item) make the result double as the modality
-agreement audit: items found by both lists rank first, single-list
items surface with their provenance visible.

Workload: the SAME deterministic eval queries as ``bm25_topk``
(every ``QUERY_MOD``-th id, capped at ``Q_CAP`` by a pushdown bound).
The id space ties the modalities: query/document text rides
``doc_id``, its embedding rides the matching ``vec_id``. Corpus
coverage is deliberately asymmetric at sf0.1 (5000 documents, 2000
vectors) — exactly the partial-embedding-coverage state a real
pipeline passes through mid-backfill; RRF degrades gracefully to the
covered modality.

Determinism: both input lists cut on integer total orders
(``score_ppb DESC, doc_id`` / ``round(cosine,9) DESC, vec_id``); the
RRF contribution is ``round(1e9 / (RRF_K + rank))`` per list — a
single IEEE division of constants, identical in both engines — and
the fusion score sums ≤ 2 such BIGINTs (exact). The fused cut orders
by ``(rrf_ppb DESC, item_id ASC)`` — integer total order throughout.

Scale shape (100 TB): fusion adds only a full-outer join of two
(Q · k)-row lists — driver-invisible, executor-trivial; the cost IS
the two constituent retrievals, whose scale stories live in their own
modules (broadcast inverted-index probe; Q-broadcast corpus scan with
per-partition top-k). Nothing here grows with the corpus.

Registered in r10, same round as built. tests/test_hybrid.py pins
oracle parity at two SFs, a pure-Python RRF model over the two
verified constituent lists, and the fusion invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.bm25 import (
    ORACLE_BM25,
    Q_CAP,
    QUERY_MOD,
    bm25_topk,
)
from cdc_cascade_spark.llm.similarity import TOPK, _cosine_sql, _dot, _with_norm

# Standard RRF smoothing constant (ranks are 1-based).
RRF_K = 60

# ppb scale for the exact integer fusion sum.
PPB = 1_000_000_000.0


def _dense_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense side: exact cosine top-``TOPK`` per eval query over the
    embeddings corpus — the ann_recall_report ground-truth shape with
    the bm25 query bound."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(
        (F.col("vec_id") % QUERY_MOD == 0)
        & (F.col("vec_id") < QUERY_MOD * Q_CAP)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    cosine = F.round(
        _dot(F.col("embedding"), F.col("qvec"))
        / (F.col("norm") * F.col("qnorm")),
        9,
    ).alias("cosine")
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine)
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("dense_rank", F.row_number().over(w))
        .filter(F.col("dense_rank") <= TOPK)
        .select("qid", F.col("vec_id").alias("item_id"), "dense_rank")
    )


def _rrf_ppb(rank_col: F.Column) -> F.Column:
    return F.round(F.lit(PPB) / (F.lit(float(RRF_K)) + rank_col.cast("double")), 0).cast(
        "long"
    )


def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOPK`` fused items per eval query:
    ``(qid, item_id, sparse_rank, dense_rank, rrf_ppb, rank)``."""
    sparse = bm25_topk(spark, sf_dir).select(
        "qid",
        F.col("doc_id").alias("item_id"),
        F.col("rank").alias("sparse_rank"),
    )
    dense = _dense_topk(spark, sf_dir)
    # Fusion as union + per-(qid, item) aggregation instead of a
    # full-outer join (r17-opt, guide §2.4/§3.1): each (qid, item_id)
    # appears at most once per list, so max() recovers exactly the
    # join's rank columns (NULL where a list missed the item) and the
    # coalesced rrf sum is unchanged — while the full-outer join of
    # two (Q·k)-row lists planned as a sort-merge join (full outer
    # cannot broadcast): two exchanges plus sorts where one suffices.
    # The explicit qid repartition is the single exchange the fusion
    # aggregate and the rank window both ride.
    fused = (
        sparse.select(
            "qid",
            "item_id",
            "sparse_rank",
            F.lit(None).cast("int").alias("dense_rank"),
        )
        .unionByName(
            dense.select(
                "qid",
                "item_id",
                F.lit(None).cast("int").alias("sparse_rank"),
                F.col("dense_rank"),
            )
        )
        .repartition("qid")
        .groupBy("qid", "item_id")
        .agg(
            F.max("sparse_rank").alias("sparse_rank"),
            F.max("dense_rank").alias("dense_rank"),
        )
        .select(
            "qid",
            "item_id",
            "sparse_rank",
            "dense_rank",
            (
                F.coalesce(_rrf_ppb(F.col("sparse_rank")), F.lit(0))
                + F.coalesce(_rrf_ppb(F.col("dense_rank")), F.lit(0))
            ).alias("rrf_ppb"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("rrf_ppb"), F.asc("item_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("qid", "item_id", "sparse_rank", "dense_rank", "rrf_ppb", "rank")
    )


def _rrf_sql(rank_expr: str) -> str:
    return (
        f"CAST(ROUND({PPB!r} / ({float(RRF_K)!r} + CAST({rank_expr} AS DOUBLE)), 0)"
        " AS BIGINT)"
    )


# Standalone dense top-k list — ``(qid, item_id, dense_rank)`` — the
# oracle twin of :func:`_dense_topk`, exposed separately so composing
# oracles (llm/retrieval_summary.py) state the SAME dense list this
# query was verified against.
ORACLE_DENSE_LIST = f"""
WITH dq AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id % {QUERY_MOD} = 0 AND vec_id < {QUERY_MOD * Q_CAP}
)
SELECT qid, vec_id AS item_id, dense_rank FROM (
  SELECT dq.qid, e.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY dq.qid
           ORDER BY {_cosine_sql('e.embedding', 'dq.qvec')} DESC,
                    e.vec_id ASC) AS dense_rank
  FROM embeddings e, dq WHERE e.vec_id <> dq.qid
) WHERE dense_rank <= {TOPK}
"""


ORACLE_HYBRID = f"""
WITH sparse_full AS (
  {ORACLE_BM25}
),
sparse AS (
  SELECT qid, doc_id AS item_id, rank AS sparse_rank FROM sparse_full
),
dense AS (
  {ORACLE_DENSE_LIST}
),
fused AS (
  SELECT COALESCE(s.qid, d.qid) AS qid,
         COALESCE(s.item_id, d.item_id) AS item_id,
         s.sparse_rank::INTEGER AS sparse_rank,
         d.dense_rank::INTEGER AS dense_rank,
         (COALESCE({_rrf_sql('s.sparse_rank')}, 0)
          + COALESCE({_rrf_sql('d.dense_rank')}, 0))::BIGINT AS rrf_ppb
  FROM sparse s FULL OUTER JOIN dense d
    ON s.qid = d.qid AND s.item_id = d.item_id
)
SELECT qid, item_id, sparse_rank, dense_rank, rrf_ppb,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY rrf_ppb DESC, item_id ASC) AS rank
  FROM fused
) WHERE rank <= {TOPK}
"""


QUERIES: dict[str, tuple] = {
    "hybrid_retrieval_rrf": (hybrid_retrieval_rrf, ORACLE_HYBRID),
}
