"""Corpus drift report: identity, disjointness, sensitivity, and
determinism pins (two-frame operator — outside the single-statement
oracle gate by design; see llm/drift.py docstring).

Note on the testdata: document TEXT shares one vocabulary across lang
labels (only the lang_id marker words differ), so lang-sliced JS is
legitimately tiny — the disjoint-vocabulary bound is pinned with a
synthetic corpus instead.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.drift import corpus_drift

SF = "/root/testdata/sf0.001"


def _report(df) -> dict[str, float]:
    return {r.metric: r.value for r in df.collect()}


def test_drift_identity_is_zero(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    rep = _report(corpus_drift(docs, docs))
    assert set(rep) == {
        "vocab_js_divergence",
        "lang_mix_l1",
        "mean_tokens_rel_shift",
        "ttr_shift",
    }
    for metric, value in rep.items():
        assert abs(value) < 1e-12, (metric, value)


def test_drift_maximal_on_disjoint_vocab_and_langs(spark):
    """Disjoint token vocabularies must drive JS to its upper bound 1,
    and disjoint language mixes must drive the L1 to its bound 2."""
    a = spark.createDataFrame(
        [(i, "en", f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(50)],
        "doc_id long, lang string, text string",
    )
    b = spark.createDataFrame(
        [(i, "zh", f"omega{i} sigma{i} kappa{i} theta{i}") for i in range(50)],
        "doc_id long, lang string, text string",
    )
    rep = _report(corpus_drift(a, b))
    assert abs(rep["lang_mix_l1"] - 2.0) < 1e-12
    assert abs(rep["vocab_js_divergence"] - 1.0) < 1e-9
    assert not math.isnan(rep["mean_tokens_rel_shift"])


def test_drift_lang_slices_share_vocabulary(spark):
    """On the real testdata, lang labels partition the documents but
    NOT the vocabulary (same generator) — the report must say exactly
    that: maximal language-mix distance, near-zero vocabulary JS. This
    is the 'mix changed but content did not' diagnosis the two metrics
    exist to separate."""
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    rep = _report(corpus_drift(docs.filter("lang = 'en'"), docs.filter("lang != 'en'")))
    assert abs(rep["lang_mix_l1"] - 2.0) < 1e-12
    assert rep["vocab_js_divergence"] < 0.05


def test_drift_detects_boilerplate_flood(spark):
    """The scraper-regression scenario: today's slice is yesterday's
    plus a flood of identical boilerplate docs. The lexical profile
    (ttr) and vocab distribution must move well beyond the random-half
    baseline noise."""
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    flood = spark.range(2000, 3500).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("click here to subscribe to our newsletter now").alias("text"),
    )
    rep_flood = _report(corpus_drift(docs, docs.unionByName(flood)))

    half_a = docs.filter("doc_id % 2 = 0")
    half_b = docs.filter("doc_id % 2 = 1")
    rep_halves = _report(corpus_drift(half_a, half_b))

    assert rep_flood["ttr_shift"] > 5 * max(rep_halves["ttr_shift"], 1e-6)
    assert rep_flood["vocab_js_divergence"] > 5 * rep_halves["vocab_js_divergence"]


def test_drift_deterministic_across_partitionings(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    cur = docs.filter("doc_id % 3 != 0")
    r1 = _report(corpus_drift(docs, cur))
    r2 = _report(corpus_drift(docs.repartition(17), cur.repartition(5)))
    assert set(r1) == set(r2)
    for k in r1:
        # double partial-sum order across partitions is not pinned, so
        # allow ulp-scale drift while still catching any real
        # partitioning dependence
        assert abs(r1[k] - r2[k]) < 1e-9, k


def test_streaming_drift_monitor_flags_flooded_batch(spark, tmp_path):
    """Drive a clean micro-batch and a boilerplate-flooded micro-batch
    through the streaming monitor: the per-batch reports must match the
    batch operator on the same slices, and only the flooded batch's
    metrics move off the clean baseline."""
    from cdc_cascade_spark.streaming.monitor import start_drift_monitor

    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    clean = docs.filter("doc_id % 2 = 0")
    flood = docs.filter("doc_id % 2 = 1").unionByName(
        spark.range(5000, 6500).select(
            F.col("id").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.lit("click here to subscribe to our newsletter now").alias("text"),
        )
    )

    src = tmp_path / "incoming"
    src.mkdir()
    clean.coalesce(1).write.mode("overwrite").parquet(str(src / "a"))
    flood.coalesce(1).write.mode("overwrite").parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(clean.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = str(tmp_path / "reports")
    q = start_drift_monitor(stream, docs, out, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    reports = {}
    for r in spark.read.parquet(out).collect():
        reports.setdefault(r.batch_id, {})[r.metric] = r.value
    assert len(reports) == 2
    # identify which batch was which by row provenance: the flooded
    # batch has the much larger ttr/vocab movement
    vals = sorted(reports.values(), key=lambda m: m["vocab_js_divergence"])
    base, flagged = vals
    assert flagged["vocab_js_divergence"] > 5 * max(base["vocab_js_divergence"], 1e-6)
    assert flagged["ttr_shift"] > 5 * max(base["ttr_shift"], 1e-6)

    # per-batch streaming report == the batch operator on the same slice
    want = {r.metric: r.value for r in corpus_drift(docs, flood).collect()}
    assert set(flagged) == set(want)
    for k in want:
        assert abs(flagged[k] - want[k]) < 1e-9, k


def test_drift_identity_holds_with_null_lang(spark):
    """NULL lang labels fold into one bucket: a slice compared against
    itself must still report zero everywhere (full joins never match
    NULL keys — the fold must happen before grouping)."""
    docs = spark.createDataFrame(
        [(1, None, "alpha beta gamma"), (2, "en", "beta gamma delta")],
        "doc_id long, lang string, text string",
    )
    rep = _report(corpus_drift(docs, docs))
    for metric, value in rep.items():
        assert abs(value) < 1e-12, (metric, value)


def test_drift_empty_reference_trips_not_nulls(spark):
    """'Source went dark' must trip the report, not NULL it out: an
    empty side contributes zero mass, giving JS = 0.5 and lang L1 = 1.0
    — finite, far above same-distribution baselines — and 0.0 for the
    guarded ratios. Two empty slices report zeros."""
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    empty = docs.filter("doc_id < 0")

    rep = _report(corpus_drift(empty, docs))
    assert abs(rep["vocab_js_divergence"] - 0.5) < 1e-9
    assert abs(rep["lang_mix_l1"] - 1.0) < 1e-12
    for m, v in rep.items():
        assert v is not None and not math.isnan(v), (m, v)

    rep0 = _report(corpus_drift(empty, empty))
    for m, v in rep0.items():
        assert v == 0.0, (m, v)
