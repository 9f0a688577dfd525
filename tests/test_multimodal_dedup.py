"""multimodal_dedup (llm/multimodal.py): exact media dedup by content
digest. Cross-engine oracle agreement + group semantics. Registered in
r8 with the other late round-7 surfaces.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_multimodal_dedup_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.multimodal import (
        ORACLE_MULTIMODAL_DEDUP,
        multimodal_dedup,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "multimodal_dedup",
        multimodal_dedup(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_MULTIMODAL_DEDUP).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0  # injected shared blobs guarantee groups


def test_multimodal_dedup_group_semantics(spark):
    from cdc_cascade_spark.llm.multimodal import multimodal_dedup

    rows = multimodal_dedup(spark, SF).collect()
    # sf0.001: 500 docs, every 20th (25 docs) maps onto 3 shared blobs
    assert len(rows) == 3
    assert sum(r.n_copies for r in rows) == 25
    for r in rows:
        assert r.n_copies > 1
        assert r.keep_doc_id % 20 == 0
        assert r.bytes_reclaimed == (r.n_copies - 1) * r.n_bytes
        # representative is the smallest member: blob b collects doc_ids
        # that are == 0 (mod 20) with doc_id % 3 == b; min is in [0, 40]
        assert r.keep_doc_id in (0, 20, 40)
