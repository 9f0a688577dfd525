"""Probe-path retrieval MRR: the persistent-index lifecycle as a
driver-checked query.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension) — the
standing-workload sibling of ``llm/retrieval_summary.py``: that face
re-runs the ad-hoc sparse and chunked retrievals (a corpus scan each);
a deployment answers the same eval workload from the PERSISTENT
postings indexes (``llm/bm25_index.py``, ``llm/chunk_index.py``) where
the corpus scan was paid once at build time and every probe reads only
the probed terms' bucket partitions. This query runs that full
lifecycle — build (once per session per sf_dir) → partition-pruned
probe → MRR rollup — and the driver checks it against the SAME ANSI
oracle SQL that specifies the ad-hoc lists (ORACLE_BM25,
CHUNKED_LIST_SQL stated verbatim), so a green row proves end to end
that the on-disk layout, the bucket pruning, the replay/watermark
dedup and the probe scorer all reproduce the declarative spec —
probe ≡ direct promoted from a test pin to a driver-checked fact.

Output — ``(mode, n_queries, n_hits, sum_rr_ppb, mrr_ppb)`` — the
``retrieval_mrr_summary`` schema over the two index-served modes:
``sparse_indexed`` (whole-document BM25 from the postings index; its
MRR ≡ 1.0 against its own rank-1 truth is the harness identity) and
``chunked_indexed`` (best-chunk max-pooled BM25 from the chunk index —
the RAG deployment shape, whose divergence from whole-doc truth is the
measurement).

Determinism: the probes feed the same integer ppb scorers as the
registered ad-hoc faces (one shared expression tree —
``bm25.term_weight_ppb``), ranks cut on integer total orders, and the
MRR arithmetic is BIGINT end to end (the retrieval_summary rules).

Scale shape (100 TB): the build is one scan + one (doc/chunk, term)
shuffle, paid once; each probe reads |query terms| bucket directories
regardless of corpus size (partition pruning pinned in the index
modules' tests); above the probes this adds only (Q·k)-row joins and
two constant-key aggregates. The session index cache mirrors the
deployment (indexes live on storage, queries only probe); the bench
publishes the cold build under ``cache_backed_slots``.

Registered in r12, same round as built (the registration-pipeline
discipline). tests/test_retrieval_indexed.py pins oracle parity, the
identity to the ad-hoc summary rows, and probe-path reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.bm25 import (
    ORACLE_BM25,
    eval_query_terms,
    tokenized_base,
)
from cdc_cascade_spark.llm.bm25_index import (
    probe_postings_index,
    write_postings_index,
)
from cdc_cascade_spark.llm.chunk_index import (
    probe_chunk_index,
    write_chunk_index,
)
from cdc_cascade_spark.llm.chunkeval import CHUNKED_LIST_SQL
from cdc_cascade_spark.llm.retrieval_summary import _mode_sql, _mode_summary
from cdc_cascade_spark.llm.session_layout import SessionDirCache

# Session-scoped index-directory cache (shared scaffold — see
# llm/session_layout.py): one directory holding both built indexes
# per (session, sf_dir).
_IDX_CACHE = SessionDirCache("cdc_retrieval_idx_")


def indexes_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once-per-session postings + chunk indexes for ``sf_dir``;
    returns the directory containing ``bm25/`` and ``chunks/``."""

    def build(out: str) -> None:
        write_postings_index(spark, sf_dir, f"{out}/bm25")
        write_chunk_index(spark, sf_dir, f"{out}/chunks")

    return _IDX_CACHE.get_or_build(spark, sf_dir, build)


def retrieval_mrr_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@k of the two PERSISTENT-index probe paths against the
    sparse rank-1 ground truth:
    ``(mode, n_queries, n_hits, sum_rr_ppb, mrr_ppb)``."""
    idx = indexes_dir(spark, sf_dir)
    # ONE shared eval workload for both probes, materialized eagerly:
    # deriving the (qid, term) workload tokenizes the corpus, and each
    # probe consumes the frame in several actions (the bucket collect,
    # the broadcast term filter, the scorer join) — without the eager
    # checkpoint the lineage re-tokenized the corpus per consumer
    # (~4-6 corpus passes per face run, measured ~0.4 s each at sf0.1).
    # The frame is (Q · terms-per-query) rows — eval-budget-bounded,
    # never corpus-sized. At 100 TB the workload arrives as data and
    # this derivation disappears; locally it is setup the probes share.
    qterms = eval_query_terms(
        tokenized_base(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
    ).localCheckpoint(eager=True)

    # (Q·k)-row lists; checkpoint at birth (the retrieval_summary
    # lesson: the mode-aggregate union otherwise carries every probe's
    # full lineage into one plan) — sparse additionally feeds the
    # truth. The two probes are INDEPENDENT (separate index layouts,
    # separate driver-side bucket/stats collects, separate pruned
    # scans) but ran strictly sequentially on the driver thread — this
    # slot's 8-vs-32-core scaling ratio was 1.02, i.e. serial per-job
    # fixed cost, not task compute. Materialize them from a thread
    # pool (r18-opt, guide §2.6) so the probe jobs and their planning
    # overlap; results are unchanged (a checkpoint pins the same rows).
    from cdc_cascade_spark.functions.concurrent import run_concurrently

    def _mk_sparse() -> DataFrame:
        return (
            probe_postings_index(spark, qterms, f"{idx}/bm25")
            .select("qid", F.col("doc_id").alias("item_id"), "rank")
            .localCheckpoint(eager=True)
        )

    def _mk_chunked() -> DataFrame:
        return (
            probe_chunk_index(spark, qterms, f"{idx}/chunks")
            .select("qid", F.col("doc_id").alias("item_id"), "rank")
            .localCheckpoint(eager=True)
        )

    sparse, chunked = run_concurrently(_mk_sparse, _mk_chunked)
    truth = (
        sparse.filter(F.col("rank") == 1)
        .select("qid", "item_id")
        .localCheckpoint(eager=False)
    )
    return _mode_summary("sparse_indexed", truth, sparse).unionByName(
        _mode_summary("chunked_indexed", truth, chunked)
    )


# The oracle states the AD-HOC list SQL verbatim: the indexes are a
# physical layout of the same logical relation, so the probe-served
# lists must equal the declarative spec row for row — that equality IS
# what this registration driver-checks.
ORACLE_MRR_INDEXED = f"""
WITH sparse_full AS (
  {ORACLE_BM25}
),
truth AS (
  SELECT qid, doc_id AS item_id FROM sparse_full WHERE rank = 1
),
modes AS (
  {_mode_sql("sparse_indexed", "SELECT qid, doc_id AS item_id, rank FROM sparse_full")}
  UNION ALL
  {_mode_sql("chunked_indexed", f"SELECT qid, doc_id AS item_id, rank FROM ({CHUNKED_LIST_SQL})")}
)
SELECT mode, n_queries, n_hits, sum_rr_ppb,
       (sum_rr_ppb // n_queries)::BIGINT AS mrr_ppb
FROM modes
"""


QUERIES: dict[str, tuple] = {
    "retrieval_mrr_indexed": (retrieval_mrr_indexed, ORACLE_MRR_INDEXED),
}
