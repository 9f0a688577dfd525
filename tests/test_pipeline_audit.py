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


# ---------------------------------------------------------------------------
# Segmented mode (r8): the optional C4 span-dedup stage between PII
# redaction and budgeting — audit and pipeline must reconcile exactly.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_curation_audit_segmented_oracle_agrees(spark, sf):
    """The r9-registered segmented audit (r8 verdict #5): the composed
    oracle embeds the segdedup CTE verbatim over the survivors CTE."""
    from cdc_cascade_spark.llm.pipeline import (
        ORACLE_AUDIT_SEGMENTED,
        curation_audit_segmented,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "curation_audit_segmented",
        curation_audit_segmented(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_AUDIT_SEGMENTED).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_segmented_pipeline_reconciles_with_segmented_audit(spark):
    from cdc_cascade_spark.llm.pipeline import (
        curate_corpus_segmented,
        curation_audit,
    )

    curated = {r.doc_id: r for r in curate_corpus_segmented(spark, SF).collect()}
    audit = {
        r.doc_id: r
        for r in curation_audit(spark, SF, segment_stage=True).collect()
    }
    # kept set matches row-for-row
    assert {d for d, r in audit.items() if r.kept} == set(curated)
    # per-doc segment drop counts agree wherever both report them
    for d, c in curated.items():
        assert audit[d].n_dropped_segments == c.n_dropped_segments, d
    # docs dropped before the segment stage carry NULL, not a fake 0
    pre_stage_drops = [
        r
        for r in audit.values()
        if r.is_dup_loser or r.failed_quality or r.contaminated
    ]
    assert pre_stage_drops and all(
        r.n_dropped_segments is None for r in pre_stage_drops
    )


def test_segment_stage_rewrites_survivor_text_and_repacks_budget(spark):
    """The stage must actually do something on the real corpus: some
    surviving document loses segments, its output text equals the
    stand-alone segment operator's rewrite of the redacted survivor
    corpus, and budget admission is computed on the segmented text."""
    from pyspark.sql import functions as F

    from cdc_cascade_spark.llm.pipeline import curate_corpus, curate_corpus_segmented
    from cdc_cascade_spark.llm.segdedup import segment_dedup_frame

    base = curate_corpus(spark, SF)
    seg = curate_corpus_segmented(spark, SF)
    seg_rows = {r.doc_id: r for r in seg.collect()}
    assert sum(r.n_dropped_segments for r in seg_rows.values()) > 0
    # replay the stage over the base pipeline's survivor text: every
    # kept doc's text in the segmented output must equal the replayed
    # cleaned_text (the near-dup/quality/contamination/PII stages are
    # unaffected by the flag, so base's pre-budget survivors differ
    # from segmented's only in the text rewrite; kept docs are a
    # subset of survivors, so checking kept docs pins the rewrite)
    survivors_text = base.sparkSession.createDataFrame(
        [(r.doc_id, r.text) for r in base.select("doc_id", "text").collect()],
        "doc_id long, text string",
    )
    # base's output is budget-filtered; rebuild the full survivor set
    # through the library path instead for an exact replay
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.curation import (
        contamination_check,
        pii_redaction,
        quality_floor_filter,
    )
    from cdc_cascade_spark.llm.dedup import dedup_cluster_representatives

    docs = load_table(spark, SF, "documents").select("doc_id")
    reps = dedup_cluster_representatives(spark, SF)
    losers = reps.filter(F.col("doc_id") != F.col("rep_doc_id")).select("doc_id")
    keep = quality_floor_filter(spark, SF).select("doc_id")
    contam = contamination_check(spark, SF).select(
        F.col("train_doc").alias("doc_id")
    )
    red = pii_redaction(spark, SF).select("doc_id", "redacted")
    surv = (
        docs.join(losers, "doc_id", "left_anti")
        .join(keep, "doc_id", "left_semi")
        .join(contam, "doc_id", "left_anti")
        .join(red, "doc_id")
        .select("doc_id", F.col("redacted").alias("text"))
    )
    replay = {
        r.doc_id: r.cleaned_text
        for r in segment_dedup_frame(surv).collect()
    }
    for d, r in seg_rows.items():
        assert replay[d] == r.text, d
