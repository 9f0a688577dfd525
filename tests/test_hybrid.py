"""Hybrid RRF retrieval (llm/hybrid.py): oracle parity at two SFs, a
pure-Python RRF model over the two verified constituent lists, and the
fusion invariants."""

from __future__ import annotations

import pytest

from cdc_cascade_spark.llm.bm25 import Q_CAP, QUERY_MOD, bm25_topk
from cdc_cascade_spark.llm.hybrid import (
    PPB,
    RRF_K,
    _dense_topk,
    hybrid_retrieval_rrf,
)
from cdc_cascade_spark.llm.similarity import TOPK

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("sf", [SF, SF01])
def test_oracle_agrees(spark, sf):
    from cdc_cascade_spark import registry
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    fn, sql = registry.all_queries()["hybrid_retrieval_rrf"]
    res = compare(
        "hybrid_retrieval_rrf",
        fn(spark, sf).toPandas(),
        duckdb_connect(sf).execute(sql).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_matches_python_rrf_model(spark):
    """Fusion arithmetic and cut, re-derived in plain Python from the
    two constituent result frames (each oracle-verified in its own
    test file)."""
    sparse = {
        (r.qid, r.doc_id): r.rank for r in bm25_topk(spark, SF).collect()
    }
    dense = {
        (r.qid, r.item_id): r.dense_rank
        for r in _dense_topk(spark, SF).collect()
    }
    model: dict[int, list] = {}
    for qid in {q for q, _ in set(sparse) | set(dense)}:
        scored = []
        for key in {k for k in set(sparse) | set(dense) if k[0] == qid}:
            s = sparse.get(key)
            d = dense.get(key)
            ppb = (round(PPB / (RRF_K + s)) if s else 0) + (
                round(PPB / (RRF_K + d)) if d else 0
            )
            scored.append((-ppb, key[1], s, d, ppb))
        model[qid] = sorted(scored)[:TOPK]
    got = hybrid_retrieval_rrf(spark, SF).collect()
    assert got
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.qid, r.rank)):
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(model)
    for qid, rows in by_q.items():
        want = model[qid]
        assert len(rows) == len(want)
        for r, (_, item, s, d, ppb) in zip(rows, want):
            assert (r.item_id, r.sparse_rank, r.dense_rank, r.rrf_ppb) == (
                item,
                s,
                d,
                ppb,
            ), (qid, r)


def test_dense_side_plan_shape(spark):
    """The dense constituent keeps the recall-report ground-truth
    shape: Q-broadcast query set (no shuffle of the corpus), rank
    pushdown (WindowGroupLimit) before the final top-k merge. The
    fusion's own full-outer join runs as SMJ over two (Q·k)-row
    inputs — size-irrelevant by construction."""
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(_dense_topk(spark, SF))
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_fusion_invariants(spark):
    rows = hybrid_retrieval_rrf(spark, SF01).collect()
    assert {r.qid for r in rows} == {q * QUERY_MOD for q in range(Q_CAP)}
    both = 0
    for r in rows:
        assert r.sparse_rank is not None or r.dense_rank is not None
        assert r.item_id != r.qid, "query item must be excluded by both lists"
        # contribution bound: each list adds at most round(1e9/(K+1))
        assert 0 < r.rrf_ppb <= 2 * round(PPB / (RRF_K + 1))
        if r.sparse_rank is not None and r.dense_rank is not None:
            both += 1
    assert both > 0, "eval corpus should produce some dual-modality hits"
    for qid in {r.qid for r in rows}:
        mine = sorted((r for r in rows if r.qid == qid), key=lambda r: r.rank)
        assert [r.rank for r in mine] == list(range(1, len(mine) + 1))
        scores = [r.rrf_ppb for r in mine]
        assert scores == sorted(scores, reverse=True)
        assert len(mine) <= TOPK
