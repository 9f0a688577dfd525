"""BM25 lexical retrieval (llm/bm25.py): oracle parity at two SFs, an
independent pure-Python BM25 model, retrieval invariants, and the
broadcast inverted-index-probe plan shape."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from cdc_cascade_spark.llm.bm25 import (
    B,
    K1,
    K1_PLUS_1,
    ONE_MINUS_B,
    PPB,
    Q_CAP,
    QUERY_MOD,
    QUERY_TERMS,
    TOPK,
    bm25_topk,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _parity(spark, sf):
    from cdc_cascade_spark import registry
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    fn, sql = registry.all_queries()["bm25_topk"]
    res = compare(
        "bm25_topk", fn(spark, sf).toPandas(), duckdb_connect(sf).execute(sql).df()
    )
    assert res.ok, str(res)
    return res


@pytest.mark.parametrize("sf", [SF, SF01])
def test_oracle_agrees(spark, sf):
    res = _parity(spark, sf)
    assert res.spark_rows > 0


def _python_bm25_rows(
    rows: list[tuple[int, str]]
) -> dict[tuple[int, int], tuple[int, int]]:
    """Independent model: {(qid, doc_id): (n_terms, score_ppb)} for all
    candidate pairs (pre-topk), built with plain dicts — no Spark, no
    SQL, no shared code with the implementation."""
    toks = {
        did: [t for t in re.split(r"\s+", text) if t != ""] for did, text in rows
    }
    if not toks:
        return {}
    n_docs = len(toks)
    sum_dl = sum(len(ts) for ts in toks.values())
    avgdl = float(sum_dl) / float(n_docs)
    queries = {
        did: set(ts[:QUERY_TERMS])
        for did, ts in toks.items()
        if did % QUERY_MOD == 0 and did < QUERY_MOD * Q_CAP
    }
    all_qterms = set().union(*queries.values())
    tf: dict[tuple[int, str], int] = {}
    df: dict[str, int] = {}
    for did, ts in toks.items():
        seen = set()
        for t in ts:
            if t not in all_qterms:
                continue
            tf[(did, t)] = tf.get((did, t), 0) + 1
            if t not in seen:
                seen.add(t)
                df[t] = df.get(t, 0) + 1
    out: dict[tuple[int, int], tuple[int, int]] = {}
    for qid, qts in queries.items():
        for did, ts in toks.items():
            if did == qid:
                continue
            score = 0
            n_terms = 0
            for t in qts:
                if (did, t) not in tf:
                    continue
                n_terms += 1
                idf = ((n_docs - df[t]) + 0.5) / (df[t] + 0.5)
                f = float(tf[(did, t)])
                dl = float(len(ts))
                w = (f * K1_PLUS_1) / (
                    f + K1 * (ONE_MINUS_B + (B * dl) / avgdl)
                )
                score += round((idf * w) * PPB)
            if n_terms:
                out[(qid, did)] = (n_terms, score)
    return out


def _python_bm25(sf: str) -> dict[tuple[int, int], tuple[int, int]]:
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    return _python_bm25_rows(rows)


def test_matches_python_model(spark):
    model = _python_bm25(SF)
    got = bm25_topk(spark, SF).collect()
    assert got, "no results"
    for r in got:
        key = (r.qid, r.doc_id)
        assert key in model, f"{key} not a candidate in the model"
        n_terms, score = model[key]
        assert (r.n_terms, r.score_ppb) == (n_terms, score), (key, r)
    # the top-k cut itself: per query, result doc set == model's best k
    by_q: dict[int, list] = {}
    for (qid, did), (_, score) in model.items():
        by_q.setdefault(qid, []).append((-score, did))
    for qid, cands in by_q.items():
        want = [d for _, d in sorted(cands)[:TOPK]]
        have = [r.doc_id for r in sorted(got, key=lambda r: r.rank) if r.qid == qid]
        assert have == want, (qid, have, want)


def test_retrieval_invariants(spark):
    rows = bm25_topk(spark, SF01).collect()
    qids = {r.qid for r in rows}
    assert qids == {q * QUERY_MOD for q in range(Q_CAP)}
    for qid in qids:
        mine = sorted((r for r in rows if r.qid == qid), key=lambda r: r.rank)
        assert [r.rank for r in mine] == list(range(1, len(mine) + 1))
        assert len(mine) <= TOPK
        scores = [r.score_ppb for r in mine]
        assert scores == sorted(scores, reverse=True)
        assert all(r.doc_id != qid for r in mine), "query doc not excluded"
        assert all(1 <= r.n_terms <= QUERY_TERMS for r in mine)


def test_plan_is_broadcast_inverted_index_probe(spark):
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(bm25_topk(spark, SF))
    # qterms and dfr broadcast into the snapshotted postings; the
    # qterm-set probe join lives BELOW the postings snapshot (not in
    # this plan) and is broadcast by an explicit hint in the code —
    # Catalyst always honors broadcast() on an equi-join, so it
    # cannot silently regress. Nothing corpus-sized on any build side.
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]  # 1-row stats
    assert "SortMergeJoin" not in plan, plan[:2000]


# property corpus: (doc_id 0..120, doc as a list of tokens from an
# 8-word alphabet — small alphabet forces heavy df/tf collisions,
# doc_id 0 and 50/100 hitting the eval-query bound exercises the
# qid-present/absent edge; empty docs exercise the dl=0 path)
_doc = st.tuples(
    st.integers(0, 120),
    st.lists(st.sampled_from([f"w{i}" for i in range(8)]), max_size=10),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_doc, min_size=1, max_size=15, unique_by=lambda d: d[0]))
def test_frame_face_matches_python_model_on_random_corpora(spark, docs):
    from cdc_cascade_spark.llm.bm25 import bm25_topk_frame

    rows = [(did, " ".join(ts)) for did, ts in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk_frame(df).collect()
    model = _python_bm25_rows(rows)
    # every emitted row carries the model's exact integers
    for r in got:
        assert model[(r.qid, r.doc_id)] == (r.n_terms, r.score_ppb), r
    # per query: emitted set == model's top-k under the same total order
    by_q: dict[int, list] = {}
    for (qid, did), (_, score) in model.items():
        by_q.setdefault(qid, []).append((-score, did))
    want = {
        (qid, did)
        for qid, cands in by_q.items()
        for _, did in sorted(cands)[:TOPK]
    }
    assert {(r.qid, r.doc_id) for r in got} == want


def test_invariant_to_partitioning_and_order(spark):
    """score_ppb sums are BIGINT (order-free) and every cut is an
    integer total order, so the result must be a pure function of the
    document SET — identical across file order and partition layout."""
    import pyspark.sql.functions as F

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25 import bm25_topk_frame

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    layouts = {
        "fwd": docs.orderBy("doc_id").coalesce(1),
        "rev": docs.orderBy(F.desc("doc_id")).repartition(13),
        "hash": docs.repartition(7, "text"),
    }
    results = {
        name: sorted(
            (r.qid, r.doc_id, r.n_terms, r.score_ppb, r.rank)
            for r in bm25_topk_frame(df).collect()
        )
        for name, df in layouts.items()
    }
    assert results["fwd"] == results["rev"] == results["hash"]
    assert results["fwd"]
