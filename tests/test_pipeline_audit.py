"""curation_audit (llm/pipeline.py): cross-engine oracle agreement and
exact consistency with curate_corpus + the individual stage operators.
Registered in r8.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_curation_audit_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.pipeline import ORACLE_CURATION_AUDIT, curation_audit
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "curation_audit",
        curation_audit(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_CURATION_AUDIT).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_curation_audit_reconciles_with_curate_corpus_and_stages(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.curation import quality_floor_filter
    from cdc_cascade_spark.llm.dedup import dedup_cluster_representatives
    from cdc_cascade_spark.llm.pipeline import curate_corpus, curation_audit

    audit = {r.doc_id: r for r in curation_audit(spark, SF).collect()}
    # one verdict row per raw document
    assert len(audit) == load_table(spark, SF, "documents").count()

    # kept set == curate_corpus output set
    kept = {d for d, r in audit.items() if r.kept}
    curated = {r.doc_id for r in curate_corpus(spark, SF).collect()}
    assert kept == curated

    # stage flags match the stage operators
    reps = dedup_cluster_representatives(spark, SF)
    losers = {
        r.doc_id
        for r in reps.filter(F.col("doc_id") != F.col("rep_doc_id")).collect()
    }
    assert {d for d, r in audit.items() if r.is_dup_loser} == losers
    keep_q = {r.doc_id for r in quality_floor_filter(spark, SF).collect()}
    assert {d for d, r in audit.items() if not r.failed_quality} == keep_q

    # verdicts are mutually consistent: kept and over_budget are
    # disjoint and only reachable by stage survivors
    for d, r in audit.items():
        survivor = not (r.is_dup_loser or r.failed_quality or r.contaminated)
        assert not (r.kept and r.over_budget)
        if r.kept or r.over_budget:
            assert survivor
        if survivor:
            assert r.kept or r.over_budget
    # every verdict class is populated in the fixture
    assert any(r.is_dup_loser for r in audit.values())
    assert any(r.failed_quality for r in audit.values())
    assert any(r.over_budget for r in audit.values())
    assert any(r.kept for r in audit.values())
