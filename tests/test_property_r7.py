"""Hypothesis property tests for the r8-bound operators: random
corpora checked against trivial pure-Python reference models.

Small alphabets + short docs force heavy cross-document segment /
token collisions, exercising the duplicate machinery far harder than
the fixture corpus does.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from cdc_cascade_spark.llm.quality_rules import (
    MAX_MEAN_WORD_LEN,
    MAX_WORDS,
    MIN_MEAN_WORD_LEN,
    MIN_STOPWORDS,
    MIN_WORDS,
    STOPWORDS,
    quality_rule_flags,
)
from cdc_cascade_spark.llm.segdedup import SEGMENT_K, segment_dedup_frame

# token alphabet chosen to hit every rule branch: stopwords, symbols,
# digits, short/long words
_TOKENS = ["a", "the", "word", "abc", "#tag", "so...", "123", "xylophones"]

corpus = st.lists(
    st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=2 * SEGMENT_K + 3),
    min_size=1,
    max_size=8,
)


def _seg_model(rows):
    segs = []
    for doc_id, toks in rows:
        toks = [t for t in toks if t]
        for pos, start in enumerate(range(0, len(toks), SEGMENT_K)):
            seg = " ".join(toks[start : start + SEGMENT_K])
            if seg:
                segs.append((doc_id, pos, seg))
    occ = Counter(s for _, _, s in segs)
    first = {}
    for doc_id, pos, seg in sorted(segs):
        first.setdefault(seg, (doc_id, pos))
    out = {}
    for doc_id, pos, seg in segs:
        n, nd, kept = out.get(doc_id, (0, 0, []))
        ok = occ[seg] == 1 or first[seg] == (doc_id, pos)
        out[doc_id] = (n + 1, nd + (0 if ok else 1), kept + ([(pos, seg)] if ok else []))
    return {
        d: (n, nd, " ".join(s for _, s in sorted(kept)))
        for d, (n, nd, kept) in out.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus)
def test_segment_dedup_matches_model_on_random_corpora(spark, docs):
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in rows], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_segments, r.n_dropped, r.cleaned_text)
        for r in segment_dedup_frame(df).collect()
    }
    assert got == _seg_model(rows)


def _rule_model(toks):
    toks = [t for t in toks if t]
    n = len(toks)
    sum_len = sum(len(t) for t in toks)
    n_sym = sum(1 for t in toks if t.startswith("#") or "..." in t)
    n_alpha = sum(1 for t in toks if any(c.isalpha() for c in t))
    n_stop = len(set(toks) & set(STOPWORDS))
    return {
        "n_words": n,
        "sum_word_len": sum_len,
        "rule_word_count": MIN_WORDS <= n <= MAX_WORDS,
        "rule_mean_word_len": MIN_MEAN_WORD_LEN * n <= sum_len <= MAX_MEAN_WORD_LEN * n,
        "rule_symbol_ratio": 10 * n_sym <= n,
        "rule_alpha_words": 5 * n_alpha >= 4 * n,
        "rule_stopwords": n_stop >= MIN_STOPWORDS,
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=40), min_size=1, max_size=6))
def test_quality_rules_match_model_on_random_corpora(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in quality_rule_flags(df).collect()}
    for i, toks in enumerate(docs):
        want = _rule_model(toks)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i], want)
        assert got[i]["keep"] == all(
            v for k, v in want.items() if k.startswith("rule_")
        )


def _cms_model(token_lists):
    from cdc_cascade_spark.operators.cms import (
        CMS_A,
        CMS_DEPTH,
        CMS_MIN_EST,
        CMS_WIDTH,
    )
    from cdc_cascade_spark.functions.hashing import MINHASH_P
    import hashlib

    def th(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)

    counts = Counter(t for toks in token_lists for t in toks if t)
    grid = Counter()
    for t, n in counts.items():
        for r in range(CMS_DEPTH):
            grid[(r, (th(t) % MINHASH_P) * CMS_A[r] % CMS_WIDTH)] += n
    out = {}
    for t, n in counts.items():
        est = min(
            grid[(r, (th(t) % MINHASH_P) * CMS_A[r] % CMS_WIDTH)]
            for r in range(CMS_DEPTH)
        )
        if est >= CMS_MIN_EST:
            out[t] = (est, n)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(st.sampled_from(_TOKENS[:4]), min_size=30, max_size=120),
        min_size=4,
        max_size=8,
    )
)
def test_cms_matches_model_on_random_corpora(spark, tmp_path_factory, docs):
    """Tiny alphabet × many tokens drives counts over the support
    floor, so the sketch path is exercised end-to-end on every
    example (grid build, min-estimate, threshold, exact audit)."""
    from cdc_cascade_spark.operators.cms import sketch_cms_heavy_hitters

    d = tmp_path_factory.mktemp("cms") / "sf"
    spark.createDataFrame(
        [(i, " ".join(toks), "en", "t", 0) for i, toks in enumerate(docs)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        r.token: (r.cms_estimate, r.exact_count)
        for r in sketch_cms_heavy_hitters(spark, str(d)).collect()
    }
    assert got == _cms_model(docs)
