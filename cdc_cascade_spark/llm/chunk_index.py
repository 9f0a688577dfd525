"""Persistent chunk-postings index: build → append → probe at CHUNK
granularity.

llm/chunkeval.py's ad-hoc chunked retrieval re-chunks and re-explodes
the corpus per query batch; its scale note promises the standing-
workload layout — "a deployment persists the chunk postings bucketed
by term with (doc_id, chunk_id) unit keys". This module IS that
layout: the llm/bm25_index.py design (term-hash Hive buckets,
mergeable stats delta rows, O(batch) append, partition-pruned probes)
with chunks as the index units, which is how production RAG indexes
are actually keyed.

Layout under ``out_path``:

- ``postings/bucket=<k>/part-*.parquet`` — one row per (chunk, term):
  ``(term, doc_id, chunk_id, dl, tf, batch_id)`` with ``dl`` the CHUNK
  length, Hive-partitioned by
  ``bucket = pmod(token_hash(term), N_BUCKETS)``.
  A term's postings live in exactly one bucket, so probes partition-
  prune and per-term chunk-df is derivable inside the pruned scan.
- ``stats/part-*.parquet`` — mergeable ``(n_docs, sum_dl, batch_id)``
  delta rows over CHUNKS (the scorer's corpus scalars); readers SUM.

Append ≡ rebuild: postings rows are per-chunk (disjoint across
document batches — chunking is per-document, so a batch's chunks
never interleave another batch's), bucket is a pure function of the
term, stats sum associatively. Probe ≡ direct: the probe feeds the
SAME scorer (chunkeval.chunk_topk_from_postings) the same integer
inputs. Both pinned by tests/test_chunk_index.py.

At-least-once replay safety and crash-safe compaction swaps follow
llm/bm25_index.py exactly (r10 advice #1/#2 — see its module
docstring): every row carries its writing ``batch_id``, readers dedup
on it (postings on ``(batch_id, term, doc_id, chunk_id)``), and the
compaction swap renames the live dir aside before promoting the
compacted copy (``recover_compaction`` repairs any crash point).

Scale (100 TB): identical to the doc-level index — build is one scan
+ one shuffle on (chunk, term) (the chunk explode is map-side,
~CHUNK_SIZE/CHUNK_STRIDE row growth before tf aggregation); probes
read |query terms| buckets regardless of corpus size; small-files
accretion under append ingest is the same problem with the same fix
(:func:`compact_chunk_index` — layout-only, probe-invisible, the
bm25_index compaction over the chunk schema).

Oracle-gate exclusion: path-dependent physical layout (the standing
reasoning of the four sibling index modules); the correctness gate is
row-level probe ≡ the chunkeval face whose eval query is
driver-checked, plus append ≡ rebuild and pruning plan pins.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash
from cdc_cascade_spark.llm.bm25 import eval_query_terms, tokenized_base
from cdc_cascade_spark.llm.bm25_index import (
    BUILD_BATCH_ID,
    _acquire_compaction_lock,
    _append_guard,
    _check_not_compacting,
    _commit_compaction_swap,
    _dedup_stats,
    _live_batches,
    _marker_watermark,
    _release_compaction_lock,
    _repair_for_read,
    _run_rebuild,
    _squash_watermark,
    _stats_raw,
    _stats_summary,
    _WATERMARK_MARKER,
    compact_hot_buckets,  # noqa: F401 — re-export: the per-bucket pass
    # is unit-agnostic (it only rewrites bucket dirs), so it applies to
    # the chunk layout verbatim; recover_compaction likewise sweeps its
    # per-bucket crash residue here, and the _COMPACTING lock sentinel
    # plus the squash watermark (r11 advice) apply unchanged.
    recover_compaction,
)
from cdc_cascade_spark.llm.chunkeval import (
    chunk_topk_from_postings,
    chunk_units_frame,
)

# Same layout constant (and reasoning) as the doc-level index.
N_BUCKETS = 16


def _chunk_postings_frame(docs: DataFrame) -> DataFrame:
    """Full (term, doc_id, chunk_id, dl, tf, bucket) chunk postings
    for a document batch."""
    units = chunk_units_frame(tokenized_base(docs))
    tok = units.select(
        "doc_id",
        "chunk_id",
        F.col("cdl").alias("dl"),
        F.explode("ctoks").alias("term"),
    )
    tf = tok.groupBy("doc_id", "chunk_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return tf.select(
        "term",
        "doc_id",
        "chunk_id",
        "dl",
        "tf",
        F.pmod(token_hash(F.col("term")), F.lit(N_BUCKETS))
        .cast("int")
        .alias("bucket"),
    )


def _write_batch(
    docs: DataFrame,
    out_path: str,
    mode: str,
    batch_id: int,
    postings_dir: str = "postings",
    stats_dir: str = "stats",
    reset_marker: bool = True,
) -> None:
    if mode == "overwrite" and reset_marker:
        # fresh batch-id lineage on rebuild (the bm25_index reasoning;
        # the swap-based rebuild resets the marker in its commit phase)
        (Path(out_path) / _WATERMARK_MARKER).unlink(missing_ok=True)
    post = _chunk_postings_frame(docs).withColumn(
        "batch_id", F.lit(int(batch_id)).cast("long")
    )
    (
        post.repartition("bucket")
        .sortWithinPartitions("bucket", "term", "doc_id", "chunk_id")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{out_path}/{postings_dir}")
    )
    stats = (
        chunk_units_frame(tokenized_base(docs))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("cdl"), F.lit(0)).alias("sum_dl"),
        )
        .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        # squash watermark (r11 advice #2; the bm25_index discipline)
        .withColumn("squashed_through", F.lit(-1).cast("long"))
    )
    stats.coalesce(1).write.mode(
        "overwrite" if mode == "overwrite" else "append"
    ).parquet(f"{out_path}/{stats_dir}")


def write_chunk_index(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Build the chunk index from the catalog's ``documents`` table.

    Takes the compaction LOCK, not an append claim — a build is an
    overwrite of the live layout, so it excludes live appends (and
    other rebuilds/compactors) mechanically; see
    :func:`cdc_cascade_spark.llm.bm25_index.write_postings_index`
    (r13 advice: claim holders never check each other's flags). The
    overwrite is the crash-safe write-temp-then-swap flow of
    :func:`cdc_cascade_spark.llm.bm25_index._run_rebuild`: a failed
    build leaves the old layout serving; a crashed swap rolls forward
    under ``recover_compaction``."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _run_rebuild(
        out_path,
        lambda: _write_batch(
            docs,
            out_path,
            "overwrite",
            BUILD_BATCH_ID,
            postings_dir="postings.compact",
            stats_dir="stats.compact",
            reset_marker=False,
        ),
    )


def append_chunk_index(
    docs_batch: DataFrame, out_path: str, batch_id: int
) -> None:
    """O(batch) ingest: append the batch's chunk postings into the
    bucket directories and one stats delta row. ``batch_id`` must
    uniquely name the logical batch (streaming callers pass the
    foreachBatch epoch id) — readers dedup on it, which is what makes
    at-least-once replay invisible. Epochs at or below the squash
    watermark are skipped outright (via the marker file — one open(),
    never a Spark job), the append refuses while a compaction holds
    the lock sentinel, and the claim file it holds keeps a compaction
    from starting mid-append (the bm25_index two-flag contract,
    including its monotone batch-id assignment rule)."""
    with _append_guard(out_path):
        if batch_id != BUILD_BATCH_ID and batch_id <= _marker_watermark(
            out_path
        ):
            return
        _write_batch(
            docs_batch.select("doc_id", "text"), out_path, "append", batch_id
        )


def probe_chunk_index(
    spark: SparkSession, qterms: DataFrame, out_path: str
) -> DataFrame:
    """Answer an arbitrary ``(qid, term)`` workload from the index:
    top-``TOPK`` DOCUMENTS per query by best-chunk BM25.

    Probed bucket ids are a bounded driver-side collect (≤ the
    workload's term count — the shared index-probe discipline) so the
    ``bucket IN (…)`` predicate partition-prunes the scan.

    Reads refuse while a compaction holds the lock sentinel and
    otherwise self-repair crash residue first (r11 advice #1; the
    bm25_index probe contract — promote-only, so nothing a racing
    live compaction writes can be deleted or unlocked)."""
    _check_not_compacting(out_path)
    _repair_for_read(out_path)
    qterm_set = qterms.select("term").distinct().withColumn(
        "bucket",
        F.pmod(token_hash(F.col("term")), F.lit(N_BUCKETS)).cast("int"),
    )
    buckets = [
        int(r.bucket) for r in qterm_set.select("bucket").distinct().collect()
    ]
    # stats is the authoritative emptiness gate (the bm25_index
    # reasoning: a partitioned write of zero postings emits no part
    # files, so the postings dir cannot even be schema-inferred).
    # Gate on sum_dl, NOT n_docs: an all-empty-documents corpus still
    # has one zero-length chunk per doc (n_docs > 0) but zero
    # postings rows — sum_dl == 0 ⟺ no tokens ⟺ no part files.
    # watermark first, then dropDuplicates(batch_id): replay-appended
    # delta rows — and post-squash replays of squashed epochs — must
    # not double-count (the bm25_index replay discipline; one driver
    # action for watermark + scalars + emptiness gate).
    n_docs, sum_dl, wm = _stats_summary(spark, out_path)
    if not buckets or sum_dl == 0:
        return spark.createDataFrame(
            [], "qid bigint, doc_id bigint, best_ppb bigint, rank int"
        )
    stats = spark.createDataFrame(
        [(n_docs, sum_dl)], "n_docs bigint, sum_dl bigint"
    )
    post = spark.read.parquet(f"{out_path}/postings")
    pruned = post.filter(F.col("bucket").isin(buckets))
    # replay dedup after pruning + the query-term filter (workload-
    # sized): a replayed batch's rows are byte-identical including
    # batch_id, so the chunk-unit key removes exactly the replays;
    # the watermark filter removes epochs a squash already absorbed.
    # The explicit term repartition is the ONE exchange the dedup
    # aggregate and the scorer's df window both ride (r17-opt — the
    # bm25_index probe rationale: term ⊆ the dedup key, so hash
    # partitioning on it satisfies both clusterings; the baseline plan
    # exchanged separately for dedup and df with a second pruned scan).
    tf = (
        _live_batches(pruned, wm)
        .join(F.broadcast(qterm_set.select("term")), "term")
        .repartition("term")
        .dropDuplicates(["batch_id", "term", "doc_id", "chunk_id"])
        .select("doc_id", "chunk_id", "dl", "term", "tf")
    )
    return chunk_topk_from_postings(tf, qterms, stats)


def start_chunk_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Streaming ingest into the chunk index — the production RAG
    ingest loop: consume ``(doc_id, text)`` document batches from a
    file stream and append each micro-batch's chunk postings + stats
    delta. The index stays probe-consistent after every batch because
    append ≡ rebuild (chunking is per-document, so batches never
    interleave), and at-least-once replay is safe because every row
    carries the epoch's ``batch_id`` and readers dedup on it (the
    bm25_index ingest contract, same foreachBatch reasoning)."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_chunk_index(batch_df, out_path, batch_id)

    reader = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        reader.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def chunked_against_index(
    spark: SparkSession, sf_dir: str, out_path: str
) -> DataFrame:
    """The probe under the same eval workload as the registered
    ``chunk_retrieval_eval``'s chunked side — returns the identical
    ``(qid, doc_id, best_ppb, rank)`` rows (pinned by test)."""
    qterms = eval_query_terms(
        tokenized_base(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
    )
    return probe_chunk_index(spark, qterms, out_path)


def compact_chunk_index(
    spark: SparkSession,
    out_path: str,
    wait_for_appends_s: float | None = None,
) -> None:
    """Rewrite the chunk index in place to one sorted file set per
    bucket and a single summed stats row — the bm25_index compaction
    (see its docstring for the small-files rationale, the 100 TB
    per-bucket variant, the replay-residue squash, the squash
    watermark, and the lock-sentinel quiescing) over the chunk schema.
    Pure layout: postings rows are per-chunk facts and stats sum
    associatively, so probes cannot observe the rewrite (pinned by
    test). ``wait_for_appends_s`` opts into the bounded wait-on-claims
    variant (see :func:`bm25_index.compact_postings_index`)."""
    _acquire_compaction_lock(out_path, wait_for_appends_s)
    try:
        recover_compaction(out_path, clear_lock=False)
        raw_stats = _stats_raw(spark, out_path)
        old_wm = _squash_watermark(raw_stats)
        new_wm = int(
            raw_stats.agg(
                F.greatest(
                    F.coalesce(F.max("batch_id"), F.lit(-1)),
                    F.coalesce(F.max("squashed_through"), F.lit(-1)),
                ).alias("wm")
            ).collect()[0]["wm"]
        )
        # drop uncommitted epochs' postings (no stats commit record —
        # a crash between the two artifact writes; the bm25_index
        # squash reasoning): their replay re-appends both cleanly.
        committed = raw_stats.select("batch_id").distinct()
        post = (
            _live_batches(
                spark.read.parquet(f"{out_path}/postings"), old_wm
            )
            .join(F.broadcast(committed), "batch_id", "left_semi")
            .dropDuplicates(["batch_id", "term", "doc_id", "chunk_id"])
            .withColumn("batch_id", F.lit(BUILD_BATCH_ID).cast("long"))
            .localCheckpoint(eager=True)
        )
        stats = (
            _dedup_stats(raw_stats, old_wm)
            .withColumn("batch_id", F.lit(BUILD_BATCH_ID).cast("long"))
            .withColumn("squashed_through", F.lit(new_wm).cast("long"))
            .localCheckpoint(eager=True)
        )
        (
            post.repartition("bucket")
            .sortWithinPartitions("bucket", "term", "doc_id", "chunk_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{out_path}/postings.compact")
        )
        stats.coalesce(1).write.mode("overwrite").parquet(
            f"{out_path}/stats.compact"
        )
    except BaseException:
        # roll back: the live layout was never touched — clear our
        # temp residue and unlock; the compaction simply re-runs.
        import shutil

        for name in ("postings", "stats"):
            shutil.rmtree(f"{out_path}/{name}.compact", ignore_errors=True)
        _release_compaction_lock(out_path)
        raise
    # commit phase — deliberately NOT unlocked on failure (see
    # bm25_index._commit_compaction_swap: a crash or error between the
    # two swap renames keeps the sentinel held and recover_compaction
    # rolls the recorded commit FORWARD, instead of finalizing new
    # postings against old stats and silently losing the watermark
    # advance).
    _commit_compaction_swap(out_path, new_wm)
