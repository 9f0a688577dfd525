"""Duplicated-segment removal (llm/segdedup.py): Python-model check,
cross-engine oracle agreement, and boilerplate semantics.

segment_dedup is built in round 7 but enters the registry's check
window in round 8 (the r7 window was already committed — see
registry.py); until then these tests carry its correctness claim,
including running the future oracle SQL against DuckDB directly.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb

SF = "/root/testdata/sf0.001"
K = 15


def _model(rows):
    """Pure-Python replica of the first-occurrence segment-dedup rule."""
    segs = []  # (doc_id, pos, seg)
    for doc_id, text in rows:
        toks = [t for t in re.split(r"\s+", text) if t != ""]
        for pos, start in enumerate(range(0, len(toks), K)):
            seg = " ".join(toks[start : start + K])
            if seg:
                segs.append((doc_id, pos, seg))
    occ = Counter(s for _, _, s in segs)
    first = {}
    for doc_id, pos, seg in sorted(segs):
        first.setdefault(seg, (doc_id, pos))
    out = {}
    for doc_id, pos, seg in segs:
        n_seg, n_drop, kept = out.get(doc_id, (0, 0, []))
        is_kept = occ[seg] == 1 or first[seg] == (doc_id, pos)
        out[doc_id] = (
            n_seg + 1,
            n_drop + (0 if is_kept else 1),
            kept + ([(pos, seg)] if is_kept else []),
        )
    return {
        d: (n, nd, " ".join(s for _, s in sorted(kept)))
        for d, (n, nd, kept) in out.items()
    }


def test_segment_dedup_matches_python_model(spark):
    from cdc_cascade_spark.llm.segdedup import segment_dedup

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    want = _model(rows)
    got = {
        r.doc_id: (r.n_segments, r.n_dropped, r.cleaned_text)
        for r in segment_dedup(spark, SF).collect()
    }
    assert got == want
    # the synthetic corpus has near-dup docs sharing aligned prefixes,
    # so the operator must actually drop something at sf0.001
    assert sum(nd for _, nd, _ in got.values()) > 0


def test_segment_dedup_oracle_agrees(spark):
    from cdc_cascade_spark.llm.segdedup import ORACLE_SEGMENT_DEDUP, segment_dedup
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    con = duckdb_connect(SF)
    res = compare(
        "segment_dedup",
        segment_dedup(spark, SF).toPandas(),
        con.execute(ORACLE_SEGMENT_DEDUP).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_segment_dedup_keeps_first_occurrence_only(spark, tmp_path):
    from cdc_cascade_spark.llm.segdedup import segment_dedup

    boiler = " ".join(f"b{i}" for i in range(K))  # one full shared segment
    docs = [
        # doc 5 carries the boilerplate FIRST (lowest doc_id)
        (5, boiler + " " + " ".join(f"u5x{i}" for i in range(K))),
        (7, boiler + " " + " ".join(f"u7x{i}" for i in range(K))),
        (9, boiler + " " + " ".join(f"u9x{i}" for i in range(K))),
        (11, " ".join(f"u11x{i}" for i in range(K))),  # no boilerplate
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {
        r.doc_id: (r.n_segments, r.n_dropped, r.cleaned_text)
        for r in segment_dedup(spark, str(d)).collect()
    }
    assert got[5] == (2, 0, docs[0][1])  # first occurrence: untouched
    # later docs lose exactly the boilerplate segment, keep their own
    assert got[7] == (2, 1, " ".join(f"u7x{i}" for i in range(K)))
    assert got[9] == (2, 1, " ".join(f"u9x{i}" for i in range(K)))
    assert got[11] == (1, 0, docs[3][1])


def test_segment_dedup_partitioning_invariant_and_plan_sane(spark):
    """The first-occurrence rule is a total order over (doc_id, pos),
    so output must be identical under any input partitioning; and the
    plan must contain no cartesian/nested-loop join."""
    from cdc_cascade_spark.llm.segdedup import segment_dedup
    from cdc_cascade_spark.plans.explain import physical_plan

    base = {(r.doc_id, r.n_segments, r.n_dropped, r.cleaned_text)
            for r in segment_dedup(spark, SF).collect()}

    from cdc_cascade_spark.catalog import load_table
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        # rewrite the corpus into a deliberately different layout
        load_table(spark, SF, "documents").repartition(7).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "documents.parquet"))
        rep = {(r.doc_id, r.n_segments, r.n_dropped, r.cleaned_text)
               for r in segment_dedup(spark, d).collect()}
    assert rep == base

    plan = physical_plan(segment_dedup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unregistered_surfaces_survive_empty_corpus(spark, tmp_path):
    """The registered-query empty sweep (test_operator_properties)
    covers only registry entries; run the r8-bound surfaces against a
    zero-row corpus too, pre-empting their registration."""
    from cdc_cascade_spark.catalog import TABLES, load_table
    from cdc_cascade_spark.llm.bpe import bpe_encode_corpus
    from cdc_cascade_spark.llm.pipeline import curation_audit
    from cdc_cascade_spark.llm.segdedup import segment_dedup
    from cdc_cascade_spark.llm.sources import source_reputation
    from cdc_cascade_spark.operators.anomaly import events_rate_anomaly
    from cdc_cascade_spark.operators.cms import sketch_cms_heavy_hitters

    empty_dir = str(tmp_path / "sf_empty")
    for t in TABLES:
        load_table(spark, SF, t).limit(0).write.mode("overwrite").parquet(
            f"{empty_dir}/{t}.parquet"
        )
    for fn in (
        segment_dedup,
        source_reputation,
        bpe_encode_corpus,
        sketch_cms_heavy_hitters,
        events_rate_anomaly,
        curation_audit,
    ):
        rows = fn(spark, empty_dir).collect()
        assert len(rows) <= 10, (fn.__name__, len(rows))
