"""Retrieval MRR summary (llm/retrieval_summary.py): oracle parity,
the sparse-row identity, fusion-list equivalence to the registered
hybrid query, and a pure-Python MRR model over the verified lists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _duck(sf_dir: str):
    from cdc_cascade_spark.testing.parity import duckdb_connect

    return duckdb_connect(sf_dir)


@pytest.mark.parametrize("sf", SFS)
def test_mrr_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.retrieval_summary import (
        ORACLE_MRR,
        retrieval_mrr_summary,
    )
    from cdc_cascade_spark.testing.parity import compare

    got = retrieval_mrr_summary(spark, sf).toPandas()
    want = _duck(sf).execute(ORACLE_MRR).df()
    r = compare("retrieval_mrr_summary", got, want)
    assert r.ok, r
    assert set(got["mode"]) == {"sparse", "dense", "hybrid", "chunked"}


def test_sparse_row_is_the_harness_identity(spark):
    """Relevance is DEFINED as the sparse rank-1 doc, so the sparse
    summary row must read MRR == 1.0 exactly (1e9 ppb) with every
    query a hit — a built-in self-check that the join/rank plumbing
    is sound."""
    from cdc_cascade_spark.llm.retrieval_summary import (
        retrieval_mrr_summary,
    )

    row = (
        retrieval_mrr_summary(spark, SFS[0])
        .filter(F.col("mode") == "sparse")
        .collect()[0]
    )
    assert row.n_hits == row.n_queries > 0
    assert row.mrr_ppb == 1_000_000_000
    assert row.sum_rr_ppb == row.n_queries * 1_000_000_000


@pytest.mark.parametrize("sf", SFS)
def test_local_fusion_equals_registered_hybrid_list(spark, sf):
    """The summary rebuilds the fused list from the shared sparse and
    dense frames (to halve the retrieval work); it must equal the
    registered hybrid_retrieval_rrf's (qid, item_id, rank) rows
    row-for-row — the anti-drift pin behind that reuse."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.hybrid import hybrid_retrieval_rrf
    from cdc_cascade_spark.llm.retrieval_summary import (
        retrieval_mrr_summary,  # noqa: F401 — module import sanity
    )
    from cdc_cascade_spark.llm import retrieval_summary as rs
    from cdc_cascade_spark.llm.bm25 import bm25_topk
    from cdc_cascade_spark.llm.hybrid import _dense_topk, _rrf_ppb
    from pyspark.sql import Window as W

    sparse = bm25_topk(spark, sf).select(
        "qid", F.col("doc_id").alias("item_id"),
        F.col("rank").alias("sparse_rank"),
    )
    dense = _dense_topk(spark, sf).withColumnRenamed(
        "dense_rank", "dense_rank"
    )
    fused = sparse.join(dense, ["qid", "item_id"], "full_outer").select(
        "qid", "item_id",
        (F.coalesce(_rrf_ppb(F.col("sparse_rank")), F.lit(0))
         + F.coalesce(_rrf_ppb(F.col("dense_rank")), F.lit(0))).alias("rrf_ppb"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("rrf_ppb"), F.asc("item_id"))
    local = (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rs.TOPK)
        .select("qid", "item_id", "rank")
    )
    got = {(r.qid, r.item_id, r.rank) for r in local.collect()}
    want = {
        (r.qid, r.item_id, r.rank)
        for r in hybrid_retrieval_rrf(spark, sf)
        .select("qid", "item_id", "rank")
        .collect()
    }
    assert got == want and got


def test_mrr_matches_pure_python_model(spark):
    """Recompute every summary row in plain Python from the collected
    verified lists — integer reciprocal ranks, floor division."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25 import bm25_topk
    from cdc_cascade_spark.llm.chunkeval import chunked_topk_frame
    from cdc_cascade_spark.llm.hybrid import _dense_topk, hybrid_retrieval_rrf
    from cdc_cascade_spark.llm.retrieval_summary import (
        retrieval_mrr_summary,
    )

    sf = SFS[0]
    sparse = [
        (r.qid, r.doc_id, r.rank) for r in bm25_topk(spark, sf).collect()
    ]
    truth = {q: d for q, d, rk in sparse if rk == 1}
    lists = {
        "sparse": {(q, d): rk for q, d, rk in sparse},
        "dense": {
            (r.qid, r.item_id): r.dense_rank
            for r in _dense_topk(spark, sf).collect()
        },
        "hybrid": {
            (r.qid, r.item_id): r.rank
            for r in hybrid_retrieval_rrf(spark, sf).collect()
        },
        "chunked": {
            (r.qid, r.doc_id): r.rank
            for r in chunked_topk_frame(
                load_table(spark, sf, "documents")
            ).collect()
        },
    }
    want = {}
    for mode, lst in lists.items():
        rrs = [lst.get((q, rel)) for q, rel in truth.items()]
        hits = [r for r in rrs if r is not None]
        s = sum(1_000_000_000 // r for r in hits)
        want[mode] = (
            len(truth), len(hits), s, s // len(truth)
        )
    got = {
        r.mode: (r.n_queries, r.n_hits, r.sum_rr_ppb, r.mrr_ppb)
        for r in retrieval_mrr_summary(spark, sf).collect()
    }
    assert got == want
