"""source_dedup_matrix (llm/mirrors.py, r8-built, registers r9):
cross-engine oracle agreement + exact reconciliation with the verified
near-dup pair relation."""

from __future__ import annotations

from collections import defaultdict

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_source_dedup_matrix_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.mirrors import (
        ORACLE_SOURCE_DEDUP_MATRIX,
        source_dedup_matrix,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "source_dedup_matrix",
        source_dedup_matrix(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_SOURCE_DEDUP_MATRIX).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_matrix_reconciles_with_pair_relation(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.dedup import dedup_minhash_lsh
    from cdc_cascade_spark.llm.mirrors import source_dedup_matrix

    src = {
        r.doc_id: r.source
        for r in load_table(spark, SF, "documents").select("doc_id", "source").collect()
    }
    want = defaultdict(lambda: {"n": 0, "da": set(), "db": set()})
    for p in dedup_minhash_lsh(spark, SF).collect():
        sa, sb = src[p.doc_a], src[p.doc_b]
        if sa <= sb:
            key, da, db = (sa, sb), p.doc_a, p.doc_b
        else:
            key, da, db = (sb, sa), p.doc_b, p.doc_a
        want[key]["n"] += 1
        want[key]["da"].add(da)
        want[key]["db"].add(db)
    got = {
        (r.source_a, r.source_b): (r.n_pairs, r.n_docs_a, r.n_docs_b)
        for r in source_dedup_matrix(spark, SF).collect()
    }
    assert got == {
        k: (v["n"], len(v["da"]), len(v["db"])) for k, v in want.items()
    }
    # the fixture must exercise both cross-source mirrors and the
    # canonical ordering (source_a <= source_b everywhere)
    assert any(a != b for a, b in got)
    assert all(a <= b for a, b in got)
