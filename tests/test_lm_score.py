"""Bigram LM scoring: hand-computed model check, reference-vs-gibberish
separation, filter semantics, determinism (two-frame operator — outside
the single-statement oracle gate; see llm/lm_score.py docstring)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.lm_score import (
    LM_ADD_K,
    lm_quality_filter,
    score_documents,
    train_bigram_lm,
)

SF = "/root/testdata/sf0.001"


def test_lm_score_matches_hand_computation(spark):
    """Tiny corpus, every probability recomputed by hand in Python —
    the engine-side join/smoothing formula must agree exactly."""
    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")],
        "doc_id long, text string",
    )
    uni, bi, vocab = train_bigram_lm(ref)
    vocab_words = {r.w for r in uni.collect()}
    assert vocab == len(vocab_words) == 4  # {the, cat, sat, ran}
    uni_c = {r.w: r.n_w for r in uni.collect()}
    bi_c = {(r.w1, r.w2): r.n_bg for r in bi.collect()}

    target = spark.createDataFrame(
        [(10, "the cat sat"), (11, "the dog flew")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_transitions, r.lm_score)
           for r in score_documents(target, uni, bi, vocab).collect()}

    def p(w1, w2):
        return (bi_c.get((w1, w2), 0) + LM_ADD_K) / (
            uni_c.get(w1, 0) + LM_ADD_K * (vocab + 1)
        )

    for doc_id, toks in ((10, ["the", "cat", "sat"]), (11, ["the", "dog", "flew"])):
        trans = list(zip(toks, toks[1:]))
        want = sum(-math.log2(p(a, b)) for a, b in trans) / len(trans)
        n, score = got[doc_id]
        assert n == len(trans)
        assert abs(score - want) < 1e-12, (doc_id, score, want)
    # the in-domain doc must score strictly better (lower)
    assert got[10][1] < got[11][1]


def test_in_domain_beats_gibberish_and_shuffled_text(spark):
    """A reference corpus with real bigram structure must score
    in-domain continuations far better than (a) OOV gibberish and (b)
    the SAME vocabulary in scrambled order — (b) is the discriminative
    property that separates an LM filter from a mere vocabulary
    filter."""
    ref = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps over the lazy dog")
            for i in range(20)
        ]
        + [(100 + i, "the quick brown cat naps under the lazy sun") for i in range(20)],
        "doc_id long, text string",
    )
    uni, bi, vocab = train_bigram_lm(ref)

    probes = spark.createDataFrame(
        [
            (1, "the quick brown fox naps under the lazy sun"),  # in-domain
            (2, "dog lazy the over jumps fox brown quick the"),  # shuffled
            (3, "zxq wvv qqj xxk zzr pplm ovvk"),  # OOV gibberish
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.lm_score for r in score_documents(probes, uni, bi, vocab).collect()}
    # in-domain must beat both degenerate probes by a wide margin.
    # (shuffled text can legitimately score WORSE than OOV gibberish:
    # a frequent word with a zero-count continuation divides k by a
    # large unigram count, while OOV transitions get the uniform
    # 1/(V+1) benefit of the doubt — standard add-k behavior.)
    assert s[1] < min(s[2], s[3]) / 2, s

    # on the real (word-salad) testdata the margin is thin by
    # construction — still, gibberish must score worse than the
    # corpus average under its own LM
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    runi, rbi, rvocab = train_bigram_lm(docs)
    real_scores = [
        r.lm_score
        for r in score_documents(docs.limit(50), runi, rbi, rvocab).collect()
    ]
    gib = spark.createDataFrame(
        [(9001, "zxq wvv qqj xxk zzr pplm ovvk")], "doc_id long, text string"
    )
    gib_score = score_documents(gib, runi, rbi, rvocab).collect()[0].lm_score
    assert gib_score > sum(real_scores) / len(real_scores)


def test_lm_quality_filter_keeps_quantile(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    kept = lm_quality_filter(docs, docs, keep_quantile=0.9)
    n_all = docs.count()
    n_kept = kept.count()
    # exact-percentile threshold with <=: at least 90%, at most all
    assert 0.88 * n_all <= n_kept <= n_all
    assert n_kept < n_all  # something must actually drop at 0.9

    # deterministic across partitionings
    kept2 = lm_quality_filter(docs.repartition(13), docs.repartition(7), keep_quantile=0.9)
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in kept2.collect()}


def test_single_token_docs_score_null_not_fake(spark):
    ref = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    uni, bi, vocab = train_bigram_lm(ref)
    one = spark.createDataFrame([(2, "word")], "doc_id long, text string")
    rows = score_documents(one, uni, bi, vocab).collect()
    # no transitions -> the doc contributes no rows at all (absent, not fake)
    assert rows == []


def test_filter_keeps_unscoreable_docs(spark):
    """Docs the LM cannot judge (≤1 token → no transitions) must pass
    through the filter with NULL score, not be silently dropped."""
    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "word"), (3, "")],
        "doc_id long, text string",
    )
    kept = {r.doc_id: (r.n_transitions, r.lm_score)
            for r in lm_quality_filter(docs, ref, keep_quantile=1.0).collect()}
    assert set(kept) == {1, 2, 3}
    assert kept[2] == (0, None)
    assert kept[3] == (0, None)
    assert kept[1][0] == 2 and kept[1][1] is not None


def test_whitespace_formatting_does_not_change_scores(spark):
    """Leading/trailing whitespace is formatting, not content: it must
    not alter the trained vocabulary or any document's score."""
    ref_clean = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "doc_id long, text string"
    )
    ref_padded = spark.createDataFrame(
        [(1, "  the cat sat "), (2, " the cat ran  ")], "doc_id long, text string"
    )
    u1, b1, v1 = train_bigram_lm(ref_clean)
    u2, b2, v2 = train_bigram_lm(ref_padded)
    assert v1 == v2
    assert {tuple(r) for r in u1.collect()} == {tuple(r) for r in u2.collect()}

    probe = spark.createDataFrame(
        [(10, "the cat sat"), (11, "   the cat sat  ")], "doc_id long, text string"
    )
    s = {r.doc_id: (r.n_transitions, r.lm_score)
         for r in score_documents(probe, u1, b1, v1).collect()}
    assert s[10] == s[11]


# ---------------------------------------------------------------------------
# lm_score_filter: the oracle-registered integer-decision face — pure-
# Python model check + cross-engine agreement on a crafted corpus.
# ---------------------------------------------------------------------------


def _lm_filter_model(docs):
    """Pure-Python replay of lm_score_filter's decision rule."""
    from collections import Counter

    from cdc_cascade_spark.llm.lm_score import LM_IMPROB_DEN, LM_KEEP_PCT

    def toks(t):
        import re

        return [w for w in re.split(r"\s+", t) if w]

    ref = {i: t for i, t in docs.items() if i % 2 == 0}
    uni = Counter(w for t in ref.values() for w in toks(t))
    bi = Counter(
        (a, b)
        for t in ref.values()
        for a, b in zip(toks(t), toks(t)[1:])
    )
    v = len(uni)
    out = {}
    for i, t in docs.items():
        pairs = list(zip(toks(t), toks(t)[1:]))
        n_im = sum(
            1
            for a, b in pairs
            if LM_IMPROB_DEN * (10 * bi.get((a, b), 0) + 1)
            < 10 * uni.get(a, 0) + v + 1
        )
        out[i] = (
            len(pairs),
            n_im,
            n_im * 100 <= len(pairs) * LM_KEEP_PCT,
        )
    return out


_LM_DOCS = {
    # even ids = reference slice; "alpha beta" is a frequent reference
    # transition. Doc 6 pads the reference vocabulary above
    # LM_IMPROB_DEN distinct words — below that, the add-k unknown
    # mass 1/(V+1) exceeds the 1/LM_IMPROB_DEN threshold and no
    # transition can ever be improbable (the small-vocab carve-out the
    # rule's cross-multiplication encodes).
    0: "alpha beta alpha beta alpha beta gamma delta",
    2: "alpha beta alpha beta alpha beta alpha beta",
    4: "alpha beta gamma alpha beta alpha beta alpha",
    6: " ".join(f"filler{i}" for i in range(60)),
    # odd ids are scored only: 1 rides the frequent transition, 3 is
    # OOV-heavy gibberish, 5 has a single token (no transitions).
    1: "alpha beta alpha beta alpha beta",
    3: "zzz yyy zzz yyy zzz yyy zzz yyy",
    5: "alpha",
}


@pytest.fixture(scope="module")
def lm_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lmfilter") / "sf"
    rows = [(i, t, "en", "test", len(t)) for i, t in _LM_DOCS.items()]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def test_lm_score_filter_matches_pure_python_model(spark, lm_dir):
    from cdc_cascade_spark.llm.lm_score import lm_score_filter

    want = _lm_filter_model(_LM_DOCS)
    got = {
        r["doc_id"]: (r["n_transitions"], r["n_improbable"], r["kept"])
        for r in lm_score_filter(spark, lm_dir).collect()
    }
    assert got == want
    # the crafted corpus must exercise both verdicts and the
    # no-transition carve-out, or the test proves nothing
    kept = {i: k for i, (_, _, k) in want.items()}
    assert kept[3] is False and kept[1] is True and kept[5] is True


def test_lm_score_filter_oracle_agrees_on_crafted_corpus(spark, lm_dir):
    import duckdb

    from cdc_cascade_spark.llm.lm_score import (
        ORACLE_LM_SCORE_FILTER,
        lm_score_filter,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{lm_dir}/documents.parquet/*.parquet'"
    )
    odf = (
        con.execute(ORACLE_LM_SCORE_FILTER).df().set_index("doc_id").sort_index()
    )
    sdf = (
        lm_score_filter(spark, lm_dir).toPandas().set_index("doc_id").sort_index()
    )
    for c in sdf.columns:
        assert (sdf[c].values == odf[c].values).all(), c
