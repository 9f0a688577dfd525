"""Probe-path retrieval MRR (llm/retrieval_indexed.py): oracle parity
over the persistent-index lifecycle, row identity to the ad-hoc
summary's corresponding modes, the harness identity, and session index
reuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _duck(sf_dir: str):
    from cdc_cascade_spark.testing.parity import duckdb_connect

    return duckdb_connect(sf_dir)


@pytest.mark.parametrize("sf", SFS)
def test_indexed_mrr_oracle_agrees(spark, sf):
    """The full lifecycle — build → partition-pruned probe → MRR —
    must reproduce the AD-HOC lists' declarative SQL spec exactly:
    the oracle states ORACLE_BM25 / CHUNKED_LIST_SQL verbatim, so
    agreement here is probe ≡ direct as a value-level fact."""
    from cdc_cascade_spark.llm.retrieval_indexed import (
        ORACLE_MRR_INDEXED,
        retrieval_mrr_indexed,
    )
    from cdc_cascade_spark.testing.parity import compare

    got = retrieval_mrr_indexed(spark, sf).toPandas()
    want = _duck(sf).execute(ORACLE_MRR_INDEXED).df()
    r = compare("retrieval_mrr_indexed", got, want)
    assert r.ok, r
    assert set(got["mode"]) == {"sparse_indexed", "chunked_indexed"}


def test_indexed_rows_equal_adhoc_summary_modes(spark):
    """Mode for mode, the index-served summary must equal the
    registered retrieval_mrr_summary's sparse/chunked rows (same
    truth, same lists, different physical path) — the anti-drift pin
    between the ad-hoc and probe-path faces."""
    from cdc_cascade_spark.llm.retrieval_indexed import (
        retrieval_mrr_indexed,
    )
    from cdc_cascade_spark.llm.retrieval_summary import (
        retrieval_mrr_summary,
    )

    sf = SFS[0]
    idx = {
        r.mode: (r.n_queries, r.n_hits, r.sum_rr_ppb, r.mrr_ppb)
        for r in retrieval_mrr_indexed(spark, sf).collect()
    }
    adhoc = {
        r.mode: (r.n_queries, r.n_hits, r.sum_rr_ppb, r.mrr_ppb)
        for r in retrieval_mrr_summary(spark, sf).collect()
    }
    assert idx["sparse_indexed"] == adhoc["sparse"]
    assert idx["chunked_indexed"] == adhoc["chunked"]


def test_sparse_indexed_row_is_the_harness_identity(spark):
    from cdc_cascade_spark.llm.retrieval_indexed import (
        retrieval_mrr_indexed,
    )

    row = (
        retrieval_mrr_indexed(spark, SFS[0])
        .filter(F.col("mode") == "sparse_indexed")
        .collect()[0]
    )
    assert row.n_hits == row.n_queries > 0
    assert row.mrr_ppb == 1_000_000_000


def test_session_index_cache_reuses_the_build(spark):
    """Second call must serve from the session's built indexes (the
    deployment shape: storage-resident index, probe-only queries) —
    same directory object, and the probe plan partition-prunes."""
    from cdc_cascade_spark.llm.retrieval_indexed import (
        indexes_dir,
        retrieval_mrr_indexed,
    )

    sf = SFS[0]
    d1 = indexes_dir(spark, sf)
    d2 = indexes_dir(spark, sf)
    assert d1 == d2
    # and the query itself is stable across calls (served off d1)
    a = sorted(map(tuple, retrieval_mrr_indexed(spark, sf).collect()))
    b = sorted(map(tuple, retrieval_mrr_indexed(spark, sf).collect()))
    assert a == b and a
