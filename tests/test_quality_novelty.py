"""Targeted semantics tests for the round-7 operators: Gopher-style
quality rules (integer-arithmetic boundaries), cross-corpus MinHash
novelty (consistency with the pair-level dedup), the fixed-slice drift
report (pure-Python model check), and RANGE-frame window boundaries.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Gopher rules: every threshold is an integer cross-multiplication —
# pin each rule exactly AT and just OFF its boundary, through BOTH
# engines on the same handcrafted corpus.
# ---------------------------------------------------------------------------

_BOUNDARY_DOCS = [
    # (doc_id, text, expect dict)
    (1, " ".join(["the", "a"] + ["word"] * 28),  # 30 words, wc boundary pass
     {"rule_word_count": True, "rule_stopwords": True}),
    (2, " ".join(["the", "a"] + ["word"] * 27),  # 29 words -> wc fail
     {"rule_word_count": False}),
    # mean word len exactly 3: 10 tokens x 3 chars  (sum=30, n=10)
    (3, " ".join(["abc"] * 10), {"rule_mean_word_len": True}),
    # just under 3: nine 3-char + one 2-char (sum=29 < 30)
    (4, " ".join(["abc"] * 9 + ["ab"]), {"rule_mean_word_len": False}),
    # mean exactly 10: 10-char tokens
    (5, " ".join(["abcdefghij"] * 10), {"rule_mean_word_len": True}),
    # just over 10: nine 10-char + one 11-char
    (6, " ".join(["abcdefghij"] * 9 + ["abcdefghijk"]),
     {"rule_mean_word_len": False}),
    # symbol ratio exactly 0.1: 1 of 10 tokens symbolic -> pass
    (7, " ".join(["#tag"] + ["word"] * 9), {"rule_symbol_ratio": True}),
    # 2 of 10 -> fail
    (8, " ".join(["#tag", "so..."] + ["word"] * 8),
     {"rule_symbol_ratio": False}),
    # alpha fraction exactly 0.8: 8 of 10 alphabetic -> pass
    (9, " ".join(["word"] * 8 + ["123", "456"]), {"rule_alpha_words": True}),
    # 7 of 10 -> fail
    (10, " ".join(["word"] * 7 + ["123", "456", "789"]),
     {"rule_alpha_words": False}),
    # stopwords: exactly 2 distinct -> pass; 1 -> fail
    (11, "the the the a word word", {"rule_stopwords": True}),
    (12, "the the the word word word", {"rule_stopwords": False}),
]


@pytest.fixture(scope="module")
def boundary_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gopher") / "sf"
    rows = [(i, t, "en", "test", len(t)) for i, t, _ in _BOUNDARY_DOCS]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def test_gopher_rule_boundaries_spark(spark, boundary_dir):
    from cdc_cascade_spark.llm.quality_rules import gopher_quality_rules

    got = {r["doc_id"]: r.asDict() for r in
           gopher_quality_rules(spark, boundary_dir).collect()}
    for doc_id, _text, expect in _BOUNDARY_DOCS:
        for rule, want in expect.items():
            assert got[doc_id][rule] == want, (doc_id, rule, got[doc_id])


def test_gopher_rule_boundaries_oracle_agrees(spark, boundary_dir):
    from cdc_cascade_spark.llm.quality_rules import (
        ORACLE_GOPHER_RULES,
        gopher_quality_rules,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{boundary_dir}/documents.parquet/*.parquet'"
    )
    odf = con.execute(ORACLE_GOPHER_RULES).df().set_index("doc_id").sort_index()
    sdf = (
        gopher_quality_rules(spark, boundary_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for c in sdf.columns:
        assert (sdf[c] == odf[c]).all(), c


# ---------------------------------------------------------------------------
# Novelty vs pair dedup: the per-batch-doc near-dup counts must equal
# the cross-slice projection of dedup_minhash_lsh's verified pairs.
# ---------------------------------------------------------------------------


def test_minhash_novelty_consistent_with_pair_dedup(spark):
    from cdc_cascade_spark.llm.dedup import dedup_minhash_lsh
    from cdc_cascade_spark.llm.novelty import BATCH_MOD, minhash_novelty

    pairs = dedup_minhash_lsh(spark, SF).collect()
    expected = Counter()
    for r in pairs:
        a, b = r.doc_a, r.doc_b
        if a % BATCH_MOD == 0 and b % BATCH_MOD != 0:
            expected[a] += 1
        if b % BATCH_MOD == 0 and a % BATCH_MOD != 0:
            expected[b] += 1
    got = {r.doc_id: r.n_neardups for r in minhash_novelty(spark, SF).collect()}
    batch_ids = {d for d in got}
    assert batch_ids and all(d % BATCH_MOD == 0 for d in batch_ids)
    for d in batch_ids:
        assert got[d] == expected.get(d, 0), d
    assert sum(got.values()) == sum(expected.values())


# ---------------------------------------------------------------------------
# Drift report: pure-Python model computes the same four rationals.
# ---------------------------------------------------------------------------


def test_drift_report_matches_python_model(spark):
    from cdc_cascade_spark.llm.drift import REPORT_TOP_N, corpus_drift_report

    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    ref = [(l, t) for i, l, t in docs if i % 2 == 0]
    cur = [(l, t) for i, l, t in docs if i % 2 == 1]

    def uni(side):
        c = Counter()
        for _l, t in side:
            c.update(w for w in re.split(r"\s+", t) if w != "")
        return c

    def top(c):
        return {t for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:REPORT_TOP_N]}

    cr, cc = uni(ref), uni(cur)
    vocab = top(cr) | top(cc)

    def fold(c):
        out = Counter()
        for t, n in c.items():
            out[t if t in vocab else "\x00OOV"] += n
        return out

    fr, fc = fold(cr), fold(cc)
    t_ref, t_cur = sum(fr.values()), sum(fc.values())
    num = sum(
        abs(fr.get(t, 0) * t_cur - fc.get(t, 0) * t_ref)
        for t in set(fr) | set(fc)
    )
    vocab_l1 = num / (float(t_ref) * float(t_cur))

    lr = Counter(l if l is not None else "\x00nolang" for l, _ in ref)
    lc = Counter(l if l is not None else "\x00nolang" for l, _ in cur)
    lt_ref, lt_cur = sum(lr.values()), sum(lc.values())
    lnum = sum(
        abs(lr.get(k, 0) * lt_cur - lc.get(k, 0) * lt_ref)
        for k in set(lr) | set(lc)
    )
    lang_l1 = lnum / (float(lt_ref) * float(lt_cur))

    def stats(side):
        n_docs, st, sd = len(side), 0, 0
        for _l, t in side:
            toks = re.split(r"\s+", t)
            st += len(toks)
            sd += len(set(toks))
        return n_docs, st, sd

    n1, st1, sd1 = stats(ref)
    n2, st2, sd2 = stats(cur)
    mean_shift = abs(st2 * n1 - st1 * n2) / (float(n2) * float(st1))
    ttr_shift = abs(sd2 * st1 - sd1 * st2) / (float(st1) * float(st2))

    got = {r.metric: r.value for r in corpus_drift_report(spark, SF).collect()}
    assert got["vocab_l1_distance"] == pytest.approx(vocab_l1, abs=1e-15)
    assert got["lang_mix_l1"] == pytest.approx(lang_l1, abs=1e-15)
    assert got["mean_tokens_rel_shift"] == pytest.approx(mean_shift, abs=1e-15)
    assert got["ttr_shift"] == pytest.approx(ttr_shift, abs=1e-15)
    # drift between the two halves of one corpus should be small but
    # non-degenerate (the halves are different documents)
    assert 0 < got["vocab_l1_distance"] < 0.5


# ---------------------------------------------------------------------------
# RANGE-frame boundaries: peers on the same day, inclusion exactly at
# the 7-day edge, exclusion just past it.
# ---------------------------------------------------------------------------


def test_range_frame_window_boundaries(spark, tmp_path):
    import datetime as dt

    from cdc_cascade_spark.operators.window_frames import (
        CUSTKEY_MOD,
        q32_range_frame_window,
    )

    d = tmp_path / "sf"
    ck = CUSTKEY_MOD  # sampled-in customer
    base = dt.datetime(1995, 1, 1)
    rows = [
        # (orderkey, custkey, day offset from base)
        (1, ck, 0), (2, ck, 0),   # same-day peers: each sees both
        (3, ck, 6),               # day 6: 0,0,6 within trailing 7
        (4, ck, 7),               # day 7: 6,7 in frame; day 0 aged out
        (5, ck, 36),              # day 36: 7 in 30d frame, 6 aged out
    ]
    spark.createDataFrame(
        [
            (ok, c, "O", 100.0, base + dt.timedelta(days=off), "1-URGENT")
            for ok, c, off in rows
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    got = {
        r.o_orderkey: (r.rev_7d, r.n_orders_30d)
        for r in q32_range_frame_window(spark, str(d)).collect()
    }
    assert got[1] == (200.0, 2)  # same-day peer included both ways
    assert got[2] == (200.0, 2)
    assert got[3] == (300.0, 3)  # days 0..6 all inside 7-day frame
    assert got[4] == (200.0, 4)  # day 0 aged out of 7d, still in 30d
    assert got[5] == (100.0, 2)  # only day 7 within 29 preceding


def test_gopher_rules_plan_is_map_only(spark):
    """The quality gate's 100 TB claim: zero exchanges — a pure
    projection the scan can stream through."""
    from cdc_cascade_spark.llm.quality_rules import gopher_quality_rules
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(gopher_quality_rules(spark, SF))
    assert plan.count("Exchange") == 0, plan[:2000]


def test_q32_plan_partitions_by_custkey(spark):
    """RANGE-frame windows must shuffle on the partition key, never
    into a single partition."""
    from cdc_cascade_spark.operators.window_frames import q32_range_frame_window
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(q32_range_frame_window(spark, SF))
    assert "Exchange SinglePartition" not in plan, plan[:2000]
    assert "o_custkey" in plan
