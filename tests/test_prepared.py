"""llm/prepared.py — the leaf home of the session-shared prepared
relation: identical by construction to llm/dedup.py's copy (the two
caches must never drift while dedup.py is fingerprint-frozen), and the
consumers repointed in r10 (doc_fingerprint, contamination_check)
still match their oracles."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_prepared_relation_identical_on_both_cache_paths(spark):
    from cdc_cascade_spark.llm.dedup import _docs_prepared_cached
    from cdc_cascade_spark.llm.prepared import docs_prepared_cached

    a = {
        (r.doc_id, tuple(sorted(r.hset)), r.block)
        for r in docs_prepared_cached(spark, SF).collect()
    }
    b = {
        (r.doc_id, tuple(sorted(r.hset)), r.block)
        for r in _docs_prepared_cached(spark, SF).collect()
    }
    assert a == b and a


def test_repointed_consumers_still_match_oracles(spark):
    from cdc_cascade_spark import registry
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    con = duckdb_connect(SF)
    for name in ["doc_fingerprint", "contamination_check"]:
        fn, sql = registry.all_queries()[name]
        res = compare(name, fn(spark, SF).toPandas(), con.execute(sql).df())
        assert res.ok, str(res)
