"""corpus_split (llm/splits.py) and embedding_quality_report
(llm/vecquality.py) — both r8-built, register r9: cross-engine oracle
agreement + model checks."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_corpus_split_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.splits import ORACLE_CORPUS_SPLIT, corpus_split
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "corpus_split",
        corpus_split(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_CORPUS_SPLIT).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_corpus_split_properties(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.splits import TEST_PPM, VAL_PPM, corpus_split

    rows = {r.doc_id: r for r in corpus_split(spark, SF).collect()}
    # total function of the corpus: one row per document
    assert len(rows) == load_table(spark, SF, "documents").count()
    splits = {r.split for r in rows.values()}
    assert splits == {"train", "val", "test"}
    for r in rows.values():
        if r.split == "test":
            assert r.split_ppm < TEST_PPM
        elif r.split == "val":
            assert TEST_PPM <= r.split_ppm < TEST_PPM + VAL_PPM
        else:
            assert r.split_ppm >= TEST_PPM + VAL_PPM
    # growth stability: the split of a document depends only on its id,
    # so re-running over a subset assigns identical splits
    half = {
        r.doc_id: r.split
        for r in corpus_split(spark, SF).filter("doc_id % 2 = 0").collect()
    }
    assert half == {d: rows[d].split for d in half}


def test_corpus_split_deterministic_across_runs(spark):
    from cdc_cascade_spark.llm.splits import corpus_split

    a = sorted(map(tuple, corpus_split(spark, SF).collect()))
    b = sorted(map(tuple, corpus_split(spark, SF).collect()))
    assert a == b


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_embedding_quality_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.vecquality import (
        ORACLE_EMBEDDING_QUALITY,
        embedding_quality_report,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "embedding_quality_report",
        embedding_quality_report(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_EMBEDDING_QUALITY).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_embedding_quality_matches_python_model(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.vecquality import (
        LOW_NORM_SQ,
        NAN_MOD,
        SCALE_MOD,
        TRUNC_MOD,
        ZERO_MOD,
        embedding_quality_report,
    )
    import numpy as np

    want = {}
    for r in load_table(spark, SF, "embeddings").collect():
        v = [float(x) for x in r.embedding]
        if r.vec_id % ZERO_MOD == 0:
            v = [0.0] * len(v)
        elif r.vec_id % NAN_MOD == 0:
            v = [math.nan] + v[1:]
        elif r.vec_id % TRUNC_MOD == 0:
            v = v[:8]
        elif r.vec_id % SCALE_MOD == 0:
            v = [float(np.float32(np.float32(x) * np.float32(0.001))) for x in v]
        s = want.setdefault(r.label, [0, 0, 0, 0, 0])
        s[0] += 1
        s[1] += len(v) != 64
        is_nan = any(math.isnan(x) for x in v)
        s[2] += is_nan
        nsq = 0.0
        for x in v:
            if not math.isnan(x):
                nsq += x * x
        s[3] += (not is_nan) and nsq == 0.0
        s[4] += (not is_nan) and 0.0 < nsq < LOW_NORM_SQ
    got = {
        r.label: [r.n_vectors, r.n_wrong_dim, r.n_nan, r.n_zero, r.n_low_norm]
        for r in embedding_quality_report(spark, SF).collect()
    }
    assert got == want
    # every detector bucket must be non-trivially exercised corpus-wide
    totals = [sum(v[i] for v in want.values()) for i in range(1, 5)]
    assert all(t > 0 for t in totals), totals
