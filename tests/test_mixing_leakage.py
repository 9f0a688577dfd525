"""r9-built surfaces: corpus_mixture_plan/_sample (llm/mixing.py),
split_leakage_pairs (llm/leakage.py), ann_recall_report
(llm/recall.py). Oracle parity at two SFs plus independent pure-Python
models of the decision arithmetic, so the implementation and the SQL
oracle cannot drift together unnoticed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _parity(spark, sf, name):
    from cdc_cascade_spark import registry
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    fn, sql = registry.all_queries()[name]
    res = compare(
        name, fn(spark, sf).toPandas(), duckdb_connect(sf).execute(sql).df()
    )
    assert res.ok, str(res)
    return res


@pytest.mark.parametrize("sf", [SF, SF01])
@pytest.mark.parametrize(
    "name",
    [
        "corpus_mixture_plan",
        "corpus_mixture_sample",
        "split_leakage_pairs",
        "ann_recall_report",
    ],
)
def test_oracle_agrees(spark, sf, name):
    res = _parity(spark, sf, name)
    assert res.spark_rows > 0


def _token_hash_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_mixture_plan_matches_python_model(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.mixing import MIX_BUDGET, corpus_mixture_plan

    docs = load_table(spark, SF, "documents").select("source").collect()
    counts: dict[str, int] = {}
    for r in docs:
        counts[r.source] = counts.get(r.source, 0) + 1
    quota = MIX_BUDGET // len(counts)
    want = {
        s: (n, quota, min(1_000_000, quota * 1_000_000 // n))
        for s, n in counts.items()
    }
    got = {
        r.source: (r.n_docs, r.quota, r.rate_ppm)
        for r in corpus_mixture_plan(spark, SF).collect()
    }
    assert got == want


def test_mixture_sample_matches_python_model(spark):
    """Recompute every document's admission verdict with a from-scratch
    md5 model of the salted draw."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.mixing import (
        corpus_mixture_plan,
        corpus_mixture_sample,
    )

    rates = {
        r.source: r.rate_ppm for r in corpus_mixture_plan(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "lang"
    ).collect()
    want = {}
    for r in docs:
        ppm = _token_hash_py(f"mix:{r.source}:{r.doc_id}") % 1_000_000
        if ppm < rates[r.source]:
            want[r.doc_id] = (r.source, r.lang, ppm)
    got = {
        r.doc_id: (r.source, r.lang, r.mix_ppm)
        for r in corpus_mixture_sample(spark, SF).collect()
    }
    assert got == want
    # the mix is a real cut (some docs dropped) and a real admission
    assert 0 < len(got) < len(docs)


def test_leakage_matches_registered_constituents(spark):
    from cdc_cascade_spark.llm.dedup import dedup_minhash_lsh
    from cdc_cascade_spark.llm.leakage import split_leakage_pairs
    from cdc_cascade_spark.llm.splits import corpus_split

    splits = {r.doc_id: r.split for r in corpus_split(spark, SF).collect()}
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, SF).collect()
    }
    got = {
        (r.doc_a, r.doc_b): (
            r.jaccard,
            r.split_a,
            r.split_b,
            r.is_cross_split,
        )
        for r in split_leakage_pairs(spark, SF).collect()
    }
    assert set(got) == set(pairs)
    for (a, b), (jac, sa, sb, cross) in got.items():
        assert jac == pairs[(a, b)]
        assert sa == splits[a] and sb == splits[b]
        assert cross == (sa != sb)


def test_recall_matches_numpy_brute_force(spark):
    """Independent model: numpy cosines (same strict left-to-right
    fold), python top-k, python bucket assignment — per-query recall
    must match the distributed report exactly."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.recall import Q_CAP, QUERY_MOD, ann_recall_report
    from cdc_cascade_spark.llm.similarity import (
        LSH_PLANES,
        TOPK,
        _planes_matrix,
    )

    rows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    m = np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    planes = _planes_matrix(LSH_PLANES, m.shape[1])
    # same accumulate-fold as _bucket_udf / list_dot_product
    dots = np.add.accumulate(m[:, None, :] * planes[None, :, :], axis=2)[:, :, -1]
    buckets = ((dots > 0) @ np.array(
        [1 << p for p in range(LSH_PLANES)], dtype=np.int64
    )).astype(np.int64)
    norms = np.sqrt(
        np.add.accumulate(m * m, axis=1)[:, -1]
    )

    def cos(i, j):
        d = np.add.accumulate(m[i] * m[j])[-1]
        return round(d / (norms[i] * norms[j]), 9)

    want = {}
    for qi in np.where((ids % QUERY_MOD == 0) & (ids < QUERY_MOD * Q_CAP))[0]:
        qid = int(ids[qi])
        others = [i for i in range(len(ids)) if int(ids[i]) != qid]
        ranked = sorted(others, key=lambda i: (-cos(i, qi), int(ids[i])))
        truth = {int(ids[i]) for i in ranked[:TOPK]}
        inbucket = [i for i in others if buckets[i] == buckets[qi]]
        ranked_b = sorted(inbucket, key=lambda i: (-cos(i, qi), int(ids[i])))
        approx = {int(ids[i]) for i in ranked_b[:TOPK]}
        hits = len(truth & approx)
        want[qid] = (
            len(truth),
            len(approx),
            hits,
            hits * 1_000_000 // len(truth),
        )
    got = {
        r.qid: (r.n_truth, r.n_approx, r.n_hits, r.recall_ppm)
        for r in ann_recall_report(spark, SF).collect()
    }
    assert got == want
    # invariants: honest bounds, and the eval is non-degenerate (the
    # bucketed index neither finds everything nor nothing overall)
    for n_truth, n_approx, n_hits, ppm in got.values():
        assert n_hits <= min(n_truth, n_approx)
        assert 0 <= ppm <= 1_000_000
    assert any(h > 0 for _, _, h, _ in got.values())
    assert any(h < t for t, _, h, _ in got.values())


def test_recall_query_set_is_capped_at_scale(spark):
    """The eval budget is FIXED (r9 verdict #4): at sf0.1 — 2000
    vectors, where the id bound binds — the report has exactly Q_CAP
    rows, so ground-truth cost is O(n·Q_CAP) at any corpus size."""
    from cdc_cascade_spark.llm.recall import Q_CAP, QUERY_MOD, ann_recall_report

    rows = ann_recall_report(spark, "/root/testdata/sf0.1").collect()
    assert len(rows) == Q_CAP
    assert all(r.qid % QUERY_MOD == 0 and r.qid < QUERY_MOD * Q_CAP for r in rows)
