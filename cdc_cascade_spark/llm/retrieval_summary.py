"""Retrieval-mode MRR summary: one row per retrieval modality, scored
against the whole-document BM25 ground truth.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension) — the
reporting face that closes the retrieval family's loop: with the
sparse (llm/bm25.py), dense (llm/hybrid.py's cosine side), fused
(llm/hybrid.py) and chunked (llm/chunkeval.py) top-k lists all
registered and verified, the standing design question is WHICH list
actually finds the known-relevant document, summarized as mean
reciprocal rank. Relevance follows the chunkeval convention: the
whole-document BM25 rank-1 result per query IS the relevant item, so
the ``sparse`` row is a built-in harness check (MRR exactly 1.0 —
every query finds its own top hit at rank 1) and the other rows
measure real modality divergence.

Output — ``(mode, n_queries, n_hits, sum_rr_ppb, mrr_ppb)``:

- ``n_hits``: queries whose relevant doc appears anywhere in the
  mode's top-``TOPK``.
- ``sum_rr_ppb`` / ``mrr_ppb``: reciprocal ranks as exact ppb BIGINTs
  (``1e9 div rank`` — the RRF idiom; 0 for a miss), summed and then
  floor-divided by the query count. No floats anywhere.

Every constituent list is stated VERBATIM by the composed oracle
(ORACLE_BM25; ORACLE_DENSE_LIST and ORACLE_HYBRID from llm/hybrid.py;
CHUNKED_LIST_SQL from llm/chunkeval.py), so a green driver row proves
the summary sits on exactly the verified lists. The Spark side reuses
the same frame functions, with two plan substitutions that change no
semantics: the fused list is rebuilt from the session's
ALREADY-COMPUTED sparse and dense frames with the same ``_rrf_ppb``
fusion expression (halving the two heaviest retrievals), and the
chunked list is answered from the session's PERSISTENT chunk postings
index (r12 verdict #4 — the probe reads |query terms| bucket
partitions instead of re-chunking and re-exploding the corpus per
run; probe ≡ ad-hoc is pinned by
test_indexed_rows_equal_adhoc_summary_modes AND driver-checked via
``retrieval_mrr_indexed``, while THIS oracle still states
CHUNKED_LIST_SQL verbatim, so the green row re-proves the
substitution every round). The fingerprint closure covers
llm/hybrid.py, llm/chunk_index.py and llm/retrieval_indexed.py, so
any fusion/index change re-pins this query into the check window
where the oracle would catch drift.

Determinism: every list cuts on integer total orders (verified in the
constituent modules); reciprocal ranks, sums and the final mean are
BIGINT integer arithmetic end to end.

Scale shape (100 TB): above the constituent retrievals this adds only
(Q·k)-row joins and 4 constant-key aggregations — driver-invisible at
any corpus size; the dense-coverage asymmetry at sf0.1 (5000 docs,
2000 vectors) is exactly the mid-backfill state the hybrid module
documents, and it shows up here as the dense row's lower hit count
rather than an error.

Registered in r11, same round as built (the registration-pipeline
discipline). tests/test_retrieval_summary.py pins oracle parity at
two SFs, the sparse-row identity, and a pure-Python MRR model over
the verified lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.llm.bm25 import ORACLE_BM25, TOPK, bm25_topk
from cdc_cascade_spark.llm.chunkeval import CHUNKED_LIST_SQL
from cdc_cascade_spark.llm.hybrid import (
    ORACLE_DENSE_LIST,
    ORACLE_HYBRID,
    _dense_topk,
    _rrf_ppb,
)

PPB_INT = 1_000_000_000


def _mode_summary(mode: str, truth: DataFrame, lst: DataFrame) -> DataFrame:
    """Aggregate one modality's list — ``(qid, item_id, rank)`` —
    against the truth — ``(qid, item_id)`` — into its summary row.

    The list side is broadcast explicitly (r17-opt, guide §3.1): both
    sides are eval-budget-bounded (Q and Q·k rows at ANY corpus size),
    but they arrive as lineage-truncated snapshots whose sizes Catalyst
    cannot estimate, so the left join fell back to a sort-merge join —
    two exchanges plus two sorts per modality for an ≤80-row join."""
    scored = truth.join(F.broadcast(lst), ["qid", "item_id"], "left")
    return (
        scored.groupBy(F.lit(mode).alias("mode"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.count("rank").cast("bigint").alias("n_hits"),
            F.sum(
                F.when(
                    F.col("rank").isNotNull(),
                    F.expr(f"{PPB_INT} div rank"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("sum_rr_ppb"),
        )
        .withColumn(
            "mrr_ppb", F.expr("sum_rr_ppb div n_queries").cast("bigint")
        )
    )


def retrieval_mrr_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@k of each retrieval modality against the whole-document
    BM25 rank-1 ground truth:
    ``(mode, n_queries, n_hits, sum_rr_ppb, mrr_ppb)``."""
    # The three constituent retrievals (sparse scan, dense scan,
    # chunk-index probe) are INDEPENDENT — separate inputs, separate
    # shuffles, and the probe additionally runs driver-side bucket/
    # stats collects — yet they ran strictly one after another on the
    # driver thread (this slot's 8-vs-32-core scaling ratio was 1.0:
    # the wall time is serial per-job fixed cost, not task compute).
    # Materialize them from a small thread pool (r18-opt, guide §2.6)
    # so the three jobs — and their Catalyst analysis — overlap; each
    # list was already checkpoint-snapshotted here, the pool only
    # moves the materialization off the serial critical path. Results
    # are unchanged: a checkpoint pins the same computed rows.
    from cdc_cascade_spark.functions.concurrent import run_concurrently

    def _mk_sparse() -> DataFrame:
        return (
            bm25_topk(spark, sf_dir)
            .select("qid", F.col("doc_id").alias("item_id"), "rank")
            .localCheckpoint(eager=True)
        )

    def _mk_dense() -> DataFrame:
        return (
            _dense_topk(spark, sf_dir)
            .withColumnRenamed("dense_rank", "rank")
            .localCheckpoint(eager=True)
        )

    def _mk_chunked() -> DataFrame:
        # chunked list from the session's persistent chunk index (the
        # retrieval_indexed scaffold — the build is once per (session,
        # sf_dir) and the FIRST face to run pays it; the probe here is
        # the standing-workload cost). The eval workload is derived
        # once and checkpointed eagerly — the probe consumes it in
        # several actions (bucket collect, broadcast term filter,
        # scorer join) and would otherwise re-tokenize the corpus per
        # consumer (the retrieval_indexed lesson; the frame is
        # eval-budget-bounded). Runtime import: retrieval_indexed
        # imports this module for _mode_sql/_mode_summary, so a
        # module-level import would be circular — the registry's
        # fingerprint closure walks the full AST and still sees this
        # edge.
        from cdc_cascade_spark.catalog import load_table
        from cdc_cascade_spark.llm.bm25 import (
            eval_query_terms,
            tokenized_base,
        )
        from cdc_cascade_spark.llm.chunk_index import probe_chunk_index
        from cdc_cascade_spark.llm.retrieval_indexed import indexes_dir

        qterms = eval_query_terms(
            tokenized_base(
                load_table(spark, sf_dir, "documents").select(
                    "doc_id", "text"
                )
            )
        ).localCheckpoint(eager=True)
        return (
            probe_chunk_index(
                spark, qterms, f"{indexes_dir(spark, sf_dir)}/chunks"
            )
            .select("qid", F.col("doc_id").alias("item_id"), "rank")
            .localCheckpoint(eager=True)
        )

    sparse, dense, chunked = run_concurrently(
        _mk_sparse, _mk_dense, _mk_chunked
    )
    truth = (
        sparse.filter(F.col("rank") == 1)
        .select("qid", "item_id")
        .localCheckpoint(eager=False)  # Q rows; truncates the shared
        # lineage so the truth-vs-list self-joins stay clean
    )
    # fused list: the same _rrf_ppb contributions and cuts as the
    # registered hybrid_retrieval_rrf, assembled as union + sum
    # instead of a full-outer join (r17-opt, guide §2.4/§3: a full
    # outer join of two statistics-free snapshots planned as a
    # sort-merge join — two exchanges + sorts for ≤80-row lists; each
    # (qid, item_id) appears at most once per list, so summing the
    # per-list contributions over the union IS the coalesce(+) of the
    # join form, exactly — hybrid.py carries the same rewrite with
    # the rank-provenance columns). The explicit qid repartition is
    # the single exchange the fusion aggregate and the rank window
    # both ride.
    fused = (
        sparse.select("qid", "item_id", _rrf_ppb(F.col("rank")).alias("c"))
        .unionByName(
            dense.select("qid", "item_id", _rrf_ppb(F.col("rank")).alias("c"))
        )
        .repartition("qid")
        .groupBy("qid", "item_id")
        .agg(F.sum("c").cast("long").alias("rrf_ppb"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("rrf_ppb"), F.asc("item_id"))
    # checkpoint the fused list as well: it is (Q·k) rows, but the
    # four-way union of mode aggregates would otherwise carry every
    # list's FULL lineage into one plan — measured at sf0.1,
    # truncating them cuts cold 15.7 → 6.1 s (Catalyst analysis of the
    # composed tree dominated) and warm 6.3 → 5.8 s. Lazy: hybrid
    # depends on sparse+dense, which the pool above just materialized,
    # so the remaining fusion work is (Q·k)-row arithmetic.
    hybrid = (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("qid", "item_id", "rank")
        .localCheckpoint(eager=False)
    )
    out = _mode_summary("sparse", truth, sparse)
    for mode, lst in (
        ("dense", dense),
        ("hybrid", hybrid),
        ("chunked", chunked),
    ):
        out = out.unionByName(_mode_summary(mode, truth, lst))
    return out


def _mode_sql(mode: str, list_sql: str) -> str:
    return f"""
SELECT '{mode}' AS mode,
       COUNT(*)::BIGINT AS n_queries,
       COUNT(l.rank)::BIGINT AS n_hits,
       SUM(CASE WHEN l.rank IS NOT NULL
                THEN {PPB_INT} // l.rank ELSE 0 END)::BIGINT AS sum_rr_ppb
FROM truth t LEFT JOIN ({list_sql}) l
  ON t.qid = l.qid AND t.item_id = l.item_id
GROUP BY 1"""


ORACLE_MRR = f"""
WITH sparse_full AS (
  {ORACLE_BM25}
),
truth AS (
  SELECT qid, doc_id AS item_id FROM sparse_full WHERE rank = 1
),
modes AS (
  {_mode_sql("sparse", "SELECT qid, doc_id AS item_id, rank FROM sparse_full")}
  UNION ALL
  {_mode_sql("dense", f"SELECT qid, item_id, dense_rank AS rank FROM ({ORACLE_DENSE_LIST})")}
  UNION ALL
  {_mode_sql("hybrid", f"SELECT qid, item_id, rank FROM ({ORACLE_HYBRID})")}
  UNION ALL
  {_mode_sql("chunked", f"SELECT qid, doc_id AS item_id, rank FROM ({CHUNKED_LIST_SQL})")}
)
SELECT mode, n_queries, n_hits, sum_rr_ppb,
       (sum_rr_ppb // n_queries)::BIGINT AS mrr_ppb
FROM modes
"""


QUERIES: dict[str, tuple] = {
    "retrieval_mrr_summary": (retrieval_mrr_summary, ORACLE_MRR),
}
