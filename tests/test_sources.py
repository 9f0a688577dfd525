"""source_reputation (llm/sources.py): cross-engine oracle agreement
and rollup semantics. Registered in round 8 (window committed before
it landed); these tests carry the claim until its driver green row.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_source_reputation_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.sources import (
        ORACLE_SOURCE_REPUTATION,
        source_reputation,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "source_reputation",
        source_reputation(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_SOURCE_REPUTATION).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_source_reputation_semantics(spark, tmp_path):
    from cdc_cascade_spark.llm.sources import source_reputation

    long_doc = " ".join(["the", "a"] + ["word"] * 40)  # passes all rules
    short_doc = "the a tiny"  # fails word-count rule
    docs = [
        # srcA: two rule-passing docs, one a cross-source duplicate
        (1, long_doc, "en", "srcA"),
        (2, long_doc + " extrasuffix", "en", "srcA"),
        # srcB: one duplicate of doc 1 (same 50-char prefix), one failing doc
        (3, long_doc, "de", "srcB"),
        (4, short_doc, "en", "srcB"),
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {r.source: r.asDict() for r in source_reputation(spark, str(d)).collect()}
    a, b = got["srcA"], got["srcB"]
    assert a["n_docs"] == 2 and b["n_docs"] == 2
    assert a["n_langs"] == 1 and b["n_langs"] == 2
    assert a["rule_pass_rate"] == 1.0
    assert b["rule_pass_rate"] == 0.5  # short doc fails word count
    # doc 1 and doc 3 share the normalized key: doc 2 shares the same
    # 50-char prefix too (the key is prefix-based), so srcA has both
    # docs flagged, srcB exactly one
    assert a["n_dup_docs"] == 2 and b["n_dup_docs"] == 1
    assert b["dup_doc_rate"] == 0.5
