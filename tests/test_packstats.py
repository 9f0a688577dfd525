"""packing_efficiency (llm/packstats.py, r8-built, registers r9):
cross-engine oracle agreement + exact reconciliation with the verified
pack_sequences layout + a pure-Python model on a crafted corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_packing_efficiency_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.packstats import (
        ORACLE_PACKING_EFFICIENCY,
        packing_efficiency,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "packing_efficiency",
        packing_efficiency(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_PACKING_EFFICIENCY).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_packing_efficiency_reconciles_with_layout(spark):
    from cdc_cascade_spark.llm.packing import PACK_BUDGET, pack_sequences
    from cdc_cascade_spark.llm.packstats import packing_efficiency

    layout = [r.asDict() for r in pack_sequences(spark, SF).collect()]
    by_shard = {}
    for r in layout:
        s = by_shard.setdefault(
            r["shard"], {"n_docs": 0, "strad": 0, "tok": 0, "maxc": 0}
        )
        s["n_docs"] += 1
        s["strad"] += r["first_chunk"] != r["last_chunk"]
        s["tok"] += r["n_tokens"]
        s["maxc"] = max(s["maxc"], r["last_chunk"])
    got = {r.shard: r for r in packing_efficiency(spark, SF).collect()}
    assert set(got) == set(by_shard)
    some_straddler = False
    for shard, want in by_shard.items():
        g = got[shard]
        n_chunks = want["maxc"] + 1
        assert g.n_docs == want["n_docs"]
        assert g.n_straddlers == want["strad"]
        assert g.total_tokens == want["tok"]
        assert g.n_chunks == n_chunks
        assert g.padding_tokens == n_chunks * PACK_BUDGET - want["tok"]
        assert g.fill_rate == want["tok"] / (n_chunks * PACK_BUDGET)
        # the report is only meaningful if chunks are mostly full:
        # padding exists but is bounded by one chunk's budget
        assert 0 <= g.padding_tokens < PACK_BUDGET
        some_straddler = some_straddler or want["strad"] > 0
    assert some_straddler, "fixture must exercise boundary-straddling docs"
