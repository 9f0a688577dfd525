"""The composed production-ingest pipeline: every monitoring and
admission surface wired into ONE document-ingest path.

A 100 TB training-data pipeline does not run its operators in
isolation; per micro-batch of incoming documents it needs, in order:

1. **Drift tripwire** — compare the batch against a trusted reference
   slice (``llm/drift.py::corpus_drift``) and append the four-metric
   report keyed by batch_id, so a scraper regression or a source gone
   dark is visible in the same run that ingested it
   (``streaming/monitor.py``'s idiom, inlined here so the whole path
   is one ``foreachBatch``).
2. **Quality-gated near-dup admission** — the rule gate + band-index
   screen (``streaming/enrich.py::curate_batch``), built from the SAME
   evaluator and index as the batch ``curate_corpus`` stages, so
   stream and batch admission cannot drift.
3. **Skew-aware enrichment** — admitted documents join a per-source
   dimension with ``operators/skew.py::salted_join_targeted``, fed by
   a hot-key list from the live monitor
   (``streaming/windows.py::hot_keys``): a flooded source is exactly
   the key that melts the enrichment join's reducer, and targeted
   salting replicates the dimension ONLY for those keys.
4. **Idempotent shard append** — enriched admissions land as
   ``out_dir/batch_id=N/shard=K/`` parquet: the shard is the seeded
   hash layout of ``llm/shuffling.py`` (deterministic, size-balanced),
   and each batch OVERWRITES its own ``batch_id`` partition, so
   foreachBatch's at-least-once replay cannot duplicate rows (the
   quarantine idiom). Trainers read ``shard=K`` across batches.

Composition guarantee (pinned by tests/test_ingest_e2e.py): because
the admission screen compares incoming docs against the STATIC corpus
only and the rule gate is per-document, the union of per-batch
admissions equals the one-shot batch admission of the full incoming
set — micro-batching is an execution detail, not a semantics change.
The salted enrichment equals the plain join for ANY hot list (the
skew module's property), so the hot list only moves rows between
reducers. The e2e test drives all of it: a multi-batch file stream
with one flooded source, the hot list produced by the real
``hot_keys`` streaming monitor, and the final shard layout compared
row-for-row against the batch reference.

Oracle-gate exclusion: streaming + multi-frame composition (the
standing ``streaming/joins.py`` reason); each constituent operator is
individually oracle-checked or property-tested, and this module's
claim — that they compose — is exactly what the e2e test pins.

Scale shape: one foreachBatch per micro-batch; the static index and
reference snapshot persist once at start; the drift report and hot
list are monitor-sized (not corpus-sized); the only per-batch
shuffles are the band join against the index (O(batch + candidates))
and the salted enrichment (replication proportional to the skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_cascade_spark.llm.drift import corpus_drift
from cdc_cascade_spark.llm.shuffling import _order_hash
from cdc_cascade_spark.operators.heavyhitters import (
    HOT_MIN_COUNT,
    hot_keys_frame,
)
from cdc_cascade_spark.operators.skew import salted_join_targeted
from cdc_cascade_spark.streaming.enrich import build_static_index, curate_batch


def hot_list_from_traffic(
    traffic: DataFrame,
    *,
    key_col: str = "source",
    ts_col: str | None = "ts",
    min_count: int = HOT_MIN_COUNT,
) -> DataFrame:
    """Tomorrow's salting list from yesterday's traffic: the distinct
    keys of the batch heavy-hitter report
    (``operators/heavyhitters.py::hot_keys_frame`` — the same operator
    the driver verifies as ``events_hot_keys``). This is how a
    scheduled pipeline feeds the composed ingest: the nightly
    heavy-hitter run over the ingest-event log becomes the next day's
    ``hot_sources`` (r8 verdict #4)."""
    return (
        hot_keys_frame(traffic, ts_col, key_col, min_count)
        .select(F.col("key").alias(key_col))
        .distinct()
    )


def ingest_batch(
    incoming: DataFrame,
    static_docs: DataFrame,
    source_meta: DataFrame,
    hot_sources: DataFrame | None = None,
    static_index: DataFrame | None = None,
    n_shards: int = 8,
    n_salts: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Batch-semantics core of the ingest pipeline: admission →
    skew-aware enrichment → shard assignment. Factored out of the
    stream so the convergence test can run the IDENTICAL code path on
    the all-at-once reference (the ``curate_batch`` pattern).

    ``hot_sources=None`` self-derives the salting list from the batch's
    own per-source volume via the heavy-hitter operator (the batch IS
    the traffic period) — safe because the targeted salted join equals
    the plain join for ANY hot list (the skew module's property); the
    list only moves rows between reducers. Callers with a real traffic
    log pass :func:`hot_list_from_traffic` output instead."""
    if hot_sources is None:
        hot_sources = hot_list_from_traffic(incoming, ts_col=None)
    admitted = curate_batch(incoming, static_docs, static_index)
    enriched = salted_join_targeted(
        admitted, source_meta, "source", hot_sources, n_salts=n_salts
    )
    return enriched.withColumn(
        "shard",
        F.pmod(_order_hash(seed, F.col("doc_id")), F.lit(n_shards)).cast("int"),
    )


def start_production_ingest(
    stream_docs: DataFrame,
    static_docs: DataFrame,
    source_meta: DataFrame,
    hot_sources: DataFrame | None,
    out_dir: str,
    monitor_dir: str,
    checkpoint_dir: str,
    n_shards: int = 8,
    n_salts: int = 8,
    seed: int = 0,
):
    """Run the composed ingest over a document stream. Returns the
    StreamingQuery; admitted+enriched docs land under
    ``out_dir/batch_id=N/shard=K/``, drift reports under
    ``monitor_dir/batch_id=N/``.

    ``hot_sources`` is the salting list: the live streaming monitor's
    output, :func:`hot_list_from_traffic` over a traffic log (the
    nightly pattern), or ``None`` to let each micro-batch self-derive
    its list from its own source volume (see :func:`ingest_batch`)."""
    index = build_static_index(static_docs)
    ref = static_docs.localCheckpoint(eager=True)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # monitoring first: the tripwire must fire even for a batch
        # whose every document the admission gate would drop
        (
            corpus_drift(ref, batch_df)
            .write.mode("overwrite")
            .parquet(f"{monitor_dir}/batch_id={batch_id}")
        )
        sharded = ingest_batch(
            batch_df,
            static_docs,
            source_meta,
            hot_sources,
            static_index=index,
            n_shards=n_shards,
            n_salts=n_salts,
            seed=seed,
        )
        (
            sharded.write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
