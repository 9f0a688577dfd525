"""End-to-end composed production ingest (streaming/ingest.py): the
quality-gated near-dup admission, the drift tripwire, the hot-key
monitor and the targeted salted join running together over one
multi-batch document stream — and converging exactly to the batch
reference. Each piece is verified alone elsewhere; this file pins that
they COMPOSE (r7 verdict #5).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

FLOOD_SOURCE = "src3"
# fails the stopword quality rule (no stopwords at all), so the
# admission gate must reject every flood document
FLOOD_TEXT = "spam " * 80
HOT_MIN_COUNT = 30


@pytest.fixture(scope="module")
def ingest_fixture(spark, tmp_path_factory):
    """Incoming = odd-doc_id half of the corpus split across two files,
    plus a third file flooding one source with boilerplate; static =
    the full corpus (self-screen, so real near-dups are rejected).

    The flooded source must be one the organic incoming half actually
    uses (sources correlate with doc_id parity in the testdata — odd
    documents carry odd sources only), or the hot list could never
    intersect an admitted document and the targeted-salting path would
    go unexercised. Organic sources log 25 events each; the flood adds
    40, so a threshold of 30 flags exactly the flooded source."""
    from cdc_cascade_spark.catalog import load_table

    root = tmp_path_factory.mktemp("ingest")
    docs = load_table(spark, SF, "documents")
    static = docs

    src = root / "incoming"
    src.mkdir()
    a = docs.filter(F.col("doc_id") % 4 == 1)
    b = docs.filter(F.col("doc_id") % 4 == 3)
    flood_rows = [
        (10_000 + i, FLOOD_TEXT, "en", FLOOD_SOURCE, len(FLOOD_TEXT))
        for i in range(40)
    ]
    flood = spark.createDataFrame(flood_rows, docs.schema)
    a.coalesce(1).write.mode("overwrite").parquet(str(src / "a"))
    b.coalesce(1).write.mode("overwrite").parquet(str(src / "b"))
    flood.coalesce(1).write.mode("overwrite").parquet(str(src / "c"))
    incoming_all = a.unionByName(b).unionByName(flood)

    # per-source dimension the admitted docs enrich against
    source_meta = (
        docs.select("source")
        .distinct()
        .withColumn("source_tier", F.length("source").cast("int"))
    )

    # ingest-event log for the hot-key monitor: one event per incoming
    # document, all inside one day — the flooded source crosses the
    # heavy-hitter threshold, the organic sources do not
    base = datetime.datetime(2024, 1, 1, 8, 0, 0)
    ev_rows = [
        (base + datetime.timedelta(seconds=i), r.source)
        for i, r in enumerate(incoming_all.select("source").collect())
    ]
    events_dir = root / "ingest_events"
    spark.createDataFrame(ev_rows, "ts timestamp, source string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(events_dir))

    return {
        "root": root,
        "docs": docs,
        "static": static,
        "src": src,
        "incoming_all": incoming_all,
        "source_meta": source_meta,
        "events_dir": events_dir,
    }


@pytest.fixture(scope="module")
def hot_sources(spark, ingest_fixture):
    """The REAL streaming hot-key monitor over the ingest-event log —
    its output is the hot list fed to the salted enrichment join."""
    from cdc_cascade_spark.streaming.windows import hot_keys

    stream = (
        spark.readStream.schema("ts timestamp, source string")
        .parquet(str(ingest_fixture["events_dir"]))
    )
    q = (
        hot_keys(
            stream,
            key_col="source",
            window="1 day",
            watermark="2 hours",
            min_count=HOT_MIN_COUNT,
        )
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ingest_hot_sources")
        .option(
            "checkpointLocation",
            str(ingest_fixture["root"] / "hot_ckpt"),
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT key FROM ingest_hot_sources").collect()
    hot = spark.createDataFrame(
        [(r.key,) for r in rows] or [("__none__",)], "source string"
    )
    return {"frame": hot, "keys": {r.key for r in rows}}


def test_hot_monitor_flags_exactly_the_flooded_source(hot_sources, ingest_fixture):
    n_sources = ingest_fixture["source_meta"].count()
    assert hot_sources["keys"] == {FLOOD_SOURCE}
    assert n_sources > 10  # the threshold pruned a real population


def test_batch_heavy_hitter_face_feeds_the_same_hot_list(
    spark, ingest_fixture, hot_sources
):
    """r8 verdict #4: the nightly batch face (events_hot_keys /
    hot_keys_frame) over the ingest-event log derives the SAME hot list
    the streaming monitor produced — and the composed ingest accepts it
    as the default hot-source path."""
    from cdc_cascade_spark.streaming.ingest import (
        hot_list_from_traffic,
        ingest_batch,
    )

    fx = ingest_fixture
    traffic = spark.read.parquet(str(fx["events_dir"]))
    derived = hot_list_from_traffic(
        traffic, key_col="source", ts_col="ts", min_count=HOT_MIN_COUNT
    )
    assert {r.source for r in derived.collect()} == hot_sources["keys"]

    # the composed batch run fed by the DERIVED list equals the run fed
    # by the streaming monitor's list (salting is semantics-neutral)
    ref = ingest_batch(
        fx["incoming_all"], fx["static"], fx["source_meta"],
        hot_sources["frame"],
    )
    got = ingest_batch(
        fx["incoming_all"], fx["static"], fx["source_meta"], derived
    )
    cols = sorted(ref.columns)
    assert {tuple(r[c] for c in cols) for r in got.collect()} == {
        tuple(r[c] for c in cols) for r in ref.collect()
    }

    # hot_sources=None: each batch self-derives its list — still the
    # same admitted/enriched/sharded rows
    selfd = ingest_batch(fx["incoming_all"], fx["static"], fx["source_meta"])
    assert {tuple(r[c] for c in cols) for r in selfd.collect()} == {
        tuple(r[c] for c in cols) for r in ref.collect()
    }


def test_ingest_stream_converges_to_batch_reference(
    spark, ingest_fixture, hot_sources, tmp_path
):
    from cdc_cascade_spark.streaming.enrich import curate_batch
    from cdc_cascade_spark.streaming.ingest import (
        ingest_batch,
        start_production_ingest,
    )

    fx = ingest_fixture
    out = str(tmp_path / "shards")
    monitor = str(tmp_path / "monitor")
    stream = (
        spark.readStream.schema(fx["docs"].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(fx["src"] / "*"))
    )
    q = start_production_ingest(
        stream,
        fx["static"],
        fx["source_meta"],
        hot_sources["frame"],
        out_dir=out,
        monitor_dir=monitor,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    streamed = spark.read.parquet(out)
    key_cols = sorted(set(streamed.columns) - {"batch_id"})
    got = {tuple(r[c] for c in key_cols) for r in streamed.collect()}

    # 1. micro-batching is an execution detail: union of per-batch
    # outputs == the one-shot batch run of the identical code path
    one_shot = ingest_batch(
        fx["incoming_all"],
        fx["static"],
        fx["source_meta"],
        hot_sources["frame"],
    )
    want = {tuple(r[c] for c in key_cols) for r in one_shot.collect()}
    assert got == want
    assert got, "admission must admit something"

    # 2. the salted enrichment changed nothing semantically: the
    # composition equals admission + PLAIN join + deterministic shard
    from cdc_cascade_spark.llm.shuffling import _order_hash

    plain = (
        curate_batch(fx["incoming_all"], fx["static"])
        .join(fx["source_meta"], "source")
        .withColumn(
            "shard",
            F.pmod(_order_hash(0, F.col("doc_id")), F.lit(8)).cast("int"),
        )
    )
    want_plain = {tuple(r[c] for c in key_cols) for r in plain.collect()}
    assert got == want_plain

    # 3. the hot path was really exercised: some admitted document
    # carries the flooded source, so the targeted join replicated it
    admitted_sources = {t[key_cols.index("source")] for t in got}
    assert FLOOD_SOURCE in admitted_sources

    # 4. the flood batch's documents were all rejected by the quality
    # gate (boilerplate), never reaching the shards
    assert all(t[key_cols.index("doc_id")] < 10_000 for t in got)

    # 5. drift tripwire: one idempotent report per micro-batch, and the
    # flooded batch's vocabulary divergence dwarfs the organic batches'
    reports = spark.read.parquet(monitor)
    by_batch = {
        int(r.batch_id): {}
        for r in reports.select("batch_id").distinct().collect()
    }
    assert len(by_batch) == 3
    for r in reports.collect():
        by_batch[int(r.batch_id)][r.metric] = r.value
    for metrics in by_batch.values():
        assert set(metrics) == {
            "vocab_js_divergence",
            "lang_mix_l1",
            "mean_tokens_rel_shift",
            "ttr_shift",
        }
        assert all(v is not None for v in metrics.values())
    js = sorted(m["vocab_js_divergence"] for m in by_batch.values())
    assert js[2] > 5 * max(js[1], 1e-6), js
