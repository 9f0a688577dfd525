"""Persistent BM25 postings index: build → append → probe.

Completes the index-lifecycle story for the sparse retrieval face the
same way the dense family's layouts do (``llm/similarity.py``'s
bucketed LSH, ``llm/dedup_index.py``'s MinHash bands,
``llm/ivf_index.py``'s IVF cells): ``llm/bm25.py::bm25_topk`` is the
ad-hoc plan — one corpus scan filtered to query terms — and this
module is the standing-workload layout its docstring promises, where
the scan is paid once at build time and every probe reads only the
probed terms' partitions.

Layout under ``out_path``:

- ``postings/bucket=<k>/part-*.parquet`` — one row per (doc, term):
  ``(term, doc_id, dl, tf, batch_id)``, Hive-partitioned by
  ``bucket = pmod(token_hash(term), N_BUCKETS)``. Every posting of a
  term lands in exactly one bucket directory, so a probe's
  ``bucket IN (…)`` predicate is PARTITION PRUNING (only the probed
  directories are listed/read) and the per-term document frequency is
  derivable inside the pruned scan — no separate df table to keep
  consistent.
- ``stats/part-*.parquet`` — mergeable corpus scalars: each
  build/append writes one ``(n_docs, sum_dl, batch_id)`` delta row;
  readers SUM the rows. Appends never rewrite anything.

Append ≡ rebuild holds because every artifact is a pure function of
the document set: postings rows are per-doc (disjoint across
batches), the bucket of a term is fixed by its hash, and stats rows
sum associatively — pinned by test.

At-least-once replay safety (r10 advice #1): every row — postings AND
stats — carries the ``batch_id`` that wrote it, and readers dedup on
it before anything is counted (stats rows on ``batch_id``; postings
rows on ``(batch_id, term, doc_id)``, which a byte-identical replayed
file duplicates exactly). A replayed micro-batch therefore re-appends
files whose rows are already present and changes NOTHING a probe can
observe — pinned by the double-replay test. Caller contract: a
``batch_id`` names ONE logical document batch (the streaming path
passes the foreachBatch epoch id, which Structured Streaming keeps
stable across replays; ad-hoc appends must pick unique non-negative
ids). ``BUILD_BATCH_ID = -1`` is reserved for the initial build and
the compaction squash row — never a stream epoch.

Probe ≡ direct holds because the probe feeds the SAME scorer
(``bm25.py::topk_from_postings``) with the same integer inputs
(tf, dl per posting; df = per-term row count, complete because a
term's postings are never split across buckets; N/Σdl from the
summed stats) — pinned row-for-row by test.

Scale (100 TB): the build is one scan + one shuffle on (doc, term);
a probe reads |query terms| buckets ≈ 1/N_BUCKETS of the index each,
independent of corpus growth; ingest is O(batch). The bucket count
is a layout constant — at production scale raise it so a single
bucket directory stays within a few scan tasks.

Oracle-gate exclusion: path-dependent physical layout (same reasoning
as the other three index modules) — the correctness gate is row-level
equivalence to the registered, oracle-checked ``bm25_topk`` plus
append-vs-rebuild and partition-pruning plan pins in
tests/test_bm25_index.py.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash
from cdc_cascade_spark.llm.bm25 import (
    eval_query_terms,
    tokenized_base,
    topk_from_postings,
)

# Term-hash partition count of the postings layout. 16 keeps the
# local test layout readable; a production index raises it (the probe
# cost is |query terms| buckets regardless).
N_BUCKETS = 16

# Reserved batch id for the initial build and the compaction squash —
# stream epochs (the foreachBatch batch ids) are non-negative, so the
# reserved id can never collide with a replayed epoch's rows.
BUILD_BATCH_ID = -1


def _postings_frame(docs: DataFrame) -> DataFrame:
    """Full (term, doc_id, dl, tf, bucket) postings for a document
    batch — the per-doc tf aggregation, then the term-hash bucket."""
    base = tokenized_base(docs)
    tok = base.select("doc_id", "dl", F.explode("toks").alias("term"))
    tf = tok.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return tf.select(
        "term",
        "doc_id",
        "dl",
        "tf",
        F.pmod(token_hash(F.col("term")), F.lit(N_BUCKETS))
        .cast("int")
        .alias("bucket"),
    )


def _write_batch(
    docs: DataFrame, out_path: str, mode: str, batch_id: int
) -> None:
    post = _postings_frame(docs).withColumn(
        "batch_id", F.lit(int(batch_id)).cast("long")
    )
    (
        post.repartition("bucket")
        .sortWithinPartitions("bucket", "term", "doc_id")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{out_path}/postings")
    )
    stats = tokenized_base(docs).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
    ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
    stats.coalesce(1).write.mode(
        "overwrite" if mode == "overwrite" else "append"
    ).parquet(f"{out_path}/stats")


def write_postings_index(
    spark: SparkSession, sf_dir: str, out_path: str
) -> None:
    """Build the index from the catalog's ``documents`` table."""
    _write_batch(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        out_path,
        "overwrite",
        BUILD_BATCH_ID,
    )


def append_postings_index(
    docs_batch: DataFrame, out_path: str, batch_id: int
) -> None:
    """O(batch) ingest: append the batch's postings into the bucket
    directories and one stats delta row. No rebuild, no rewrite.

    ``batch_id`` must uniquely name the logical batch (non-negative;
    the streaming path passes the foreachBatch epoch id): readers
    dedup on it, which is what makes an at-least-once replay of the
    same batch invisible (see the module docstring)."""
    _write_batch(
        docs_batch.select("doc_id", "text"), out_path, "append", batch_id
    )


def _dedup_stats(stats_raw: DataFrame) -> DataFrame:
    """Replay-safe corpus scalars: one delta row per batch_id, summed."""
    return stats_raw.dropDuplicates(["batch_id"]).agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
    )


def probe_postings_index(
    spark: SparkSession, qterms: DataFrame, out_path: str
) -> DataFrame:
    """Answer an arbitrary ``(qid, term)`` workload from the index.

    The probed bucket ids are a bounded driver-side collect (≤ the
    workload's term count — the eval budget, never corpus-sized;
    the ivf_index probe-cell discipline) so the ``bucket IN (…)``
    predicate is a literal list Spark turns into partition pruning."""
    qterm_set = qterms.select("term").distinct().withColumn(
        "bucket",
        F.pmod(token_hash(F.col("term")), F.lit(N_BUCKETS)).cast("int"),
    )
    buckets = [
        int(r.bucket) for r in qterm_set.select("bucket").distinct().collect()
    ]
    # stats is written by every build/append even for an empty batch,
    # so it is the authoritative emptiness gate: an empty-corpus index
    # has NO postings files (a partitioned write of zero rows emits no
    # parts) and the dir cannot even be schema-inferred — short-circuit
    # to the typed empty contract frame (an empty daily partition is a
    # normal pipeline state), likewise for an empty probe workload.
    # dropDuplicates(batch_id) first: an at-least-once replay appends a
    # second identical delta row that must not double-count.
    stats = _dedup_stats(spark.read.parquet(f"{out_path}/stats"))
    # sum_dl == 0 ⟺ zero tokens ⟺ zero postings rows ⟺ no part files
    # (covers both the empty corpus and the all-empty-documents corpus)
    if not buckets or stats.collect()[0]["sum_dl"] == 0:
        return spark.createDataFrame(
            [],
            "qid bigint, doc_id bigint, n_terms bigint, "
            "score_ppb bigint, rank int",
        )
    post = spark.read.parquet(f"{out_path}/postings")
    pruned = post.filter(F.col("bucket").isin(buckets))
    # replay dedup AFTER pruning + the query-term filter, so the extra
    # exchange runs on the workload-sized postings, never the index:
    # a replayed batch's rows are byte-identical including batch_id,
    # so (batch_id, term, doc_id) removes exactly the replays (df is
    # derived downstream as a per-term row count and must not see
    # them).
    tf = (
        pruned.join(F.broadcast(qterm_set.select("term")), "term")
        .dropDuplicates(["batch_id", "term", "doc_id"])
        .select("doc_id", "dl", "term", "tf")
    )
    return topk_from_postings(tf, qterms, stats)


def compact_postings_index(spark: SparkSession, out_path: str) -> None:
    """Rewrite the index in place to one sorted file set per bucket
    and a single summed stats row.

    Streaming ingest appends one file group per micro-batch, so a
    long-running index accretes small files — the classic
    streaming-to-analytics problem: at scale, probe cost becomes
    file-open-bound (thousands of footer reads per bucket) instead of
    byte-bound. Compaction is pure layout: the postings ROWS are
    per-doc facts and the stats rows sum associatively, so rewriting
    them changes nothing a probe can observe (pinned by test).

    Local rewrite is read-all → write-temp → swap. At 100 TB, don't:
    each bucket directory is an independent unit (the point of the
    layout), so production compacts bucket-by-bucket with the
    shuffle-free ``sources.io.compact_table`` pass (coalesce-based,
    sized from on-disk bytes, per-directory atomic swap) and only the
    stats squash below is index-specific. This function is the
    whole-index variant: one shuffled partitioned rewrite + the stats
    squash, which doubles as the equivalence spec the per-bucket path
    must preserve.

    Compaction also SQUASHES replay residue permanently: postings
    dedup on (batch_id, term, doc_id) and the stats rows collapse to
    one ``BUILD_BATCH_ID`` row, so probes after compaction skip the
    read-side dedup work. Run it only with ingest quiesced (stream
    stopped AND its checkpoint committed) — the swap below requires
    exclusive access anyway, and squashing while a batch could still
    replay would let that batch's rows in twice.
    """
    recover_compaction(out_path)
    post = (
        spark.read.parquet(f"{out_path}/postings")
        .dropDuplicates(["batch_id", "term", "doc_id"])
        .withColumn("batch_id", F.lit(BUILD_BATCH_ID).cast("long"))
        .localCheckpoint(eager=True)
    )
    stats = (
        _dedup_stats(spark.read.parquet(f"{out_path}/stats"))
        .withColumn("batch_id", F.lit(BUILD_BATCH_ID).cast("long"))
        .localCheckpoint(eager=True)
    )
    (
        post.repartition("bucket")
        .sortWithinPartitions("bucket", "term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_path}/postings.compact")
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        f"{out_path}/stats.compact"
    )
    _swap_compacted(out_path, "postings")
    _swap_compacted(out_path, "stats")


def _swap_compacted(out_path: str, name: str) -> None:
    """Crash-safe in-place swap of ``<name>.compact`` over ``<name>``
    (r10 advice #2: the old rmtree-then-move sequence deleted the live
    directory BEFORE its replacement was in place — a crash inside
    that window lost the index outright). Order here: (1) clear any
    ``<name>.old`` left by a prior crash, (2) rename the live dir
    aside to ``.old``, (3) rename the compacted dir in, (4) delete
    ``.old``. Renames are atomic on a same-filesystem path and no
    data is ever deleted before its replacement exists, so every crash
    point leaves a state :func:`recover_compaction` repairs."""
    import shutil

    live = Path(out_path) / name
    tmp = Path(out_path) / f"{name}.compact"
    old = Path(out_path) / f"{name}.old"
    if old.exists():
        shutil.rmtree(old)
    live.rename(old)
    tmp.rename(live)
    shutil.rmtree(old)


def recover_compaction(out_path: str, names: tuple = ("postings", "stats")) -> None:
    """Repair the index layout after a crash anywhere inside a
    compaction run. Idempotent, and a no-op on a clean layout — called
    at the top of every compact so an operator can simply re-run it.

    Per artifact directory, exactly one of these crash states exists:

    - live present: any ``.compact``/``.old`` residue is stale (a
      crash before the swap started, or after it finished) — clear it.
    - live absent, ``.compact`` + ``.old`` present: crash between the
      two swap renames; the compacted copy was fully written before
      the swap began — promote it and clear ``.old``.
    - live absent, only ``.old`` present: defensive (the swap's rename
      pair cannot leave this, but a manual intervention might) —
      restore ``.old``.

    It also sweeps PER-BUCKET residue from a crashed
    :func:`compact_hot_buckets` run: that pass rewrites individual
    ``bucket=<k>`` directories via ``sources.io.compact_table``, whose
    transient ``<dir>._compact_tmp`` / ``<dir>._compact_bak`` siblings
    live INSIDE ``postings/`` — left behind by a crash they would
    poison partition discovery (a ``bucket=7._compact_bak`` directory
    parses as the STRING partition value ``7._compact_bak``, flipping
    the bucket column to string and blanking every pruned probe), so
    they must be promoted/cleared before any read.
    """
    import glob as _glob
    import shutil

    for name in names:
        live = Path(out_path) / name
        tmp = Path(out_path) / f"{name}.compact"
        old = Path(out_path) / f"{name}.old"
        if live.exists():
            if tmp.exists():
                shutil.rmtree(tmp)
            if old.exists():
                shutil.rmtree(old)
        elif tmp.exists():
            tmp.rename(live)
            if old.exists():
                shutil.rmtree(old)
        elif old.exists():
            old.rename(live)
    # per-bucket compaction residue (compact_table naming): a bak whose
    # live dir vanished is the data — promote it; everything else is
    # droppable (tmp is pre-swap, bak-with-live is post-swap debris).
    for bak in _glob.glob(f"{out_path}/postings/bucket=*._compact_bak"):
        live_dir = Path(bak[: -len("._compact_bak")])
        if live_dir.exists():
            shutil.rmtree(bak)
        else:
            Path(bak).rename(live_dir)
    for tmp_dir in _glob.glob(f"{out_path}/postings/bucket=*._compact_tmp"):
        shutil.rmtree(tmp_dir)


def compact_hot_buckets(
    spark: SparkSession,
    out_path: str,
    min_files_per_bucket: int = 8,
) -> dict:
    """The 100 TB compaction path the whole-index variant's docstring
    promises: every ``bucket=<k>`` directory is an independent unit of
    the layout, so this pass compacts ONLY the buckets whose file
    count crossed ``min_files_per_bucket`` — each via the shuffle-free
    ``sources.io.compact_table`` rewrite (coalesce sized from on-disk
    bytes, rename-aside atomic swap per directory) — and leaves every
    other bucket's files byte-untouched. At scale this is the nightly
    maintenance job: cost proportional to the buckets the day's ingest
    actually touched, never the index.

    Scope notes: layout-only — rows are preserved INCLUDING any
    replayed duplicates (read-side dedup still applies; only the
    whole-index :func:`compact_postings_index` squashes replay residue
    and the stats rows, which are not bucket-local). Quiesce ingest
    around it (the per-directory swap reasoning).

    Returns ``{bucket_dir_name: {files_before, files_after, bytes}}``
    for the buckets rewritten."""
    import glob as _glob

    from cdc_cascade_spark.sources.io import compact_table

    # clear any crash residue first (incl. per-bucket tmp/bak dirs a
    # prior crashed run left inside postings/ — see recover_compaction)
    recover_compaction(out_path)
    done: dict = {}
    for bdir in sorted(_glob.glob(f"{out_path}/postings/bucket=*")):
        n_files = sum(
            1
            for f in _glob.glob(f"{bdir}/*")
            if not Path(f).name.startswith(("_", "."))
        )
        if n_files >= min_files_per_bucket:
            done[Path(bdir).name] = compact_table(spark, bdir)
    return done


def start_postings_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Streaming ingest into the index: consume ``(doc_id, text)``
    document batches from a file stream and append each micro-batch's
    postings + stats delta — the index stays probe-consistent after
    every batch because append ≡ rebuild (each doc's postings rows and
    the summed stats are batch-order-free).

    foreachBatch rather than a streaming sink because the append is a
    two-artifact transaction (postings dirs + stats row) against a
    layout a plain ``writeStream.parquet`` cannot partition-and-merge.
    At-least-once replay is safe: every appended row (postings AND
    stats) carries the epoch's ``batch_id`` — stable across replays
    because Structured Streaming replays a failed epoch under the SAME
    id — and readers dedup on it (the IdempotentBatchSink discipline
    in streaming/sinks.py, applied to both artifacts; pinned by the
    double-replay test).
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_postings_index(batch_df, out_path, batch_id)

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


def bm25_against_index(
    spark: SparkSession, sf_dir: str, out_path: str
) -> DataFrame:
    """The probe: the same eval workload as ``bm25_topk``, answered
    from the persistent index. Returns the identical
    ``(qid, doc_id, n_terms, score_ppb, rank)`` rows."""
    qterms = eval_query_terms(
        tokenized_base(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
    )
    return probe_postings_index(spark, qterms, out_path)
