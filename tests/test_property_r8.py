"""Hypothesis property tests for the r9-bound operators built in r8:
random snapshots / corpora checked against trivial pure-Python models.
Random doc-id sets and colliding texts exercise the diff/split/packing
machinery far harder than the fixture corpus does."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st


# --- corpus_diff_frame: random pair of snapshots over a tiny id/text
# space so adds, deletes, changes and no-ops all occur frequently ----

_TEXTS = ["alpha", "beta", "gamma gamma", "", "delta e"]

snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=9), st.sampled_from(_TEXTS), max_size=8
)


def _diff_model(old, new):
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()
    out = {}
    for d in set(old) | set(new):
        if d not in old:
            out[d] = ("c", None, md5(new[d]))
        elif d not in new:
            out[d] = ("d", md5(old[d]), None)
        elif old[d] != new[d]:
            out[d] = ("u", md5(old[d]), md5(new[d]))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snapshot, snapshot)
def test_corpus_diff_matches_model_on_random_snapshots(spark, old, new):
    from cdc_cascade_spark.llm.versioning import corpus_diff_frame

    schema = "doc_id long, text string"
    odf = spark.createDataFrame(list(old.items()) or [(None, None)], schema).filter(
        "doc_id IS NOT NULL"
    )
    ndf = spark.createDataFrame(list(new.items()) or [(None, None)], schema).filter(
        "doc_id IS NOT NULL"
    )
    got = {
        r.doc_id: (r.op, r.old_digest, r.new_digest)
        for r in corpus_diff_frame(odf, ndf).collect()
    }
    assert got == _diff_model(old, new)


# --- corpus_split: band arithmetic and stability over random id sets --


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.sets(st.integers(min_value=0, max_value=10**9), max_size=12))
def test_corpus_split_bands_pure_function_of_id(spark, tmp_path_factory, ids):
    """The split is a pure function of doc_id: replaying the hash in
    Python reproduces every assignment, for ANY id set."""
    import pytest

    if not ids:
        return
    from cdc_cascade_spark.functions.hashing import token_hash
    from cdc_cascade_spark.llm.splits import TEST_PPM, VAL_PPM, corpus_split

    d = tmp_path_factory.mktemp("split_prop")
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in sorted(ids)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r.doc_id: r for r in corpus_split(spark, str(d)).collect()}
    assert set(rows) == ids
    # python replay of the salted hash band
    py_ppm = {
        i: int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        for i in ids
    }
    for i in ids:
        r = rows[i]
        assert r.split_ppm == py_ppm[i], i
        want = (
            "test"
            if py_ppm[i] < TEST_PPM
            else "val"
            if py_ppm[i] < TEST_PPM + VAL_PPM
            else "train"
        )
        assert r.split == want, i


# --- packing_efficiency invariants over the real layout are covered in
# test_packstats; here: the per-shard identity padding = capacity - load
# holds for random token-count corpora ---------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_packing_report_identities_on_random_corpora(
    spark, tmp_path_factory, rows
):
    from cdc_cascade_spark.llm.packing import PACK_BUDGET
    from cdc_cascade_spark.llm.packstats import packing_efficiency

    d = tmp_path_factory.mktemp("pack_prop")
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), "en", "s", n) for i, n in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    for r in packing_efficiency(spark, str(d)).collect():
        cap = r.n_chunks * PACK_BUDGET
        assert r.padding_tokens == cap - r.total_tokens
        assert 0 <= r.padding_tokens < PACK_BUDGET
        assert r.fill_rate == r.total_tokens / cap
        assert 0 <= r.n_straddlers <= r.n_docs
