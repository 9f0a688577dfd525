"""corpus_diff (llm/versioning.py, r8-built, registers r9): CDC-style
corpus snapshot diff — cross-engine oracle agreement, a pure-Python
model on crafted snapshots, and the frame-level op semantics."""

from __future__ import annotations

import hashlib

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_corpus_diff_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.versioning import ORACLE_CORPUS_DIFF, corpus_diff
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "corpus_diff",
        corpus_diff(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_CORPUS_DIFF).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_corpus_diff_exercises_all_three_ops(spark):
    from cdc_cascade_spark.llm.versioning import corpus_diff

    ops = {r.op for r in corpus_diff(spark, SF).collect()}
    assert ops == {"c", "u", "d"}


def test_corpus_diff_frame_matches_python_model(spark):
    from cdc_cascade_spark.llm.versioning import corpus_diff_frame

    old = {1: "alpha", 2: "beta", 3: "gamma", 4: "delta"}
    new = {2: "beta", 3: "gamma CHANGED", 5: "epsilon"}  # 1,4 deleted
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()
    want = {}
    for d in set(old) | set(new):
        if d not in old:
            want[d] = ("c", None, md5(new[d]))
        elif d not in new:
            want[d] = ("d", md5(old[d]), None)
        elif old[d] != new[d]:
            want[d] = ("u", md5(old[d]), md5(new[d]))
    odf = spark.createDataFrame(list(old.items()), "doc_id long, text string")
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.op, r.old_digest, r.new_digest)
        for r in corpus_diff_frame(odf, ndf).collect()
    }
    assert got == want
    assert 2 not in got, "unchanged documents must not emit rows"


def test_corpus_diff_text_never_in_output_schema(spark):
    """The scale contract: only ids and digests cross the join — the
    output schema must not carry text."""
    from cdc_cascade_spark.llm.versioning import corpus_diff

    cols = set(corpus_diff(spark, SF).columns)
    assert cols == {"doc_id", "op", "old_digest", "new_digest"}
