"""Persistent BM25 postings index (llm/bm25_index.py): probe ≡ direct,
append ≡ rebuild, and the bucket partition-pruning plan shape."""

from __future__ import annotations

import glob
import os
import time
from pathlib import Path

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.qid, r.doc_id, r.n_terms, r.score_ppb, r.rank) for r in df.collect()
    )


def test_index_probe_matches_direct(spark, tmp_path):
    from cdc_cascade_spark.llm.bm25 import bm25_topk
    from cdc_cascade_spark.llm.bm25_index import (
        bm25_against_index,
        write_postings_index,
    )

    idx = str(tmp_path / "bm25")
    write_postings_index(spark, SF, idx)
    got = _rows(bm25_against_index(spark, SF, idx))
    want = _rows(bm25_topk(spark, SF))
    assert got == want and got


def test_index_append_equals_rebuild(spark, tmp_path):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        append_postings_index,
        bm25_against_index,
        write_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    full = str(tmp_path / "full")
    write_postings_index(spark, SF, full)

    inc = str(tmp_path / "inc")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    # build from the even half, append the odd half
    from cdc_cascade_spark.llm.bm25_index import _write_batch

    _write_batch(first, inc, "overwrite", -1)
    append_postings_index(second, inc, batch_id=1)

    got = _rows(bm25_against_index(spark, SF, inc))
    want = _rows(bm25_against_index(spark, SF, full))
    assert got == want and got

    # the mergeable stats rows sum to the full-corpus scalars
    sf_stats = spark.read.parquet(f"{full}/stats").agg(
        F.sum("n_docs"), F.sum("sum_dl")
    ).collect()[0]
    inc_stats = spark.read.parquet(f"{inc}/stats").agg(
        F.sum("n_docs"), F.sum("sum_dl")
    ).collect()[0]
    assert tuple(sf_stats) == tuple(inc_stats)
    assert spark.read.parquet(f"{inc}/stats").count() == 2


def test_streaming_ingest_converges_to_batch_build(spark, tmp_path):
    """File-stream the corpus in as three micro-batches via
    foreachBatch append; the resulting index must answer the eval
    probe identically to the one-shot batch build — the full
    ingest → index → probe lifecycle."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        bm25_against_index,
        start_postings_ingest_stream,
        write_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    src = str(tmp_path / "doc_stream")
    docs.withColumn("slice", F.pmod(F.col("doc_id"), F.lit(3))).repartition(
        3, "slice"
    ).drop("slice").write.mode("overwrite").parquet(src)

    inc = str(tmp_path / "inc")
    q = start_postings_ingest_stream(spark, src, inc, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "full")
    write_postings_index(spark, SF, full)
    got = _rows(bm25_against_index(spark, SF, inc))
    want = _rows(bm25_against_index(spark, SF, full))
    assert got == want and got
    # one mergeable stats row per non-empty micro-batch (slice-hash
    # collisions can leave a source file empty; empty batches append
    # nothing)
    import pyarrow.parquet as pq

    n_nonempty = sum(
        1 for f in glob.glob(f"{src}/part-*.parquet")
        if pq.ParquetFile(f).metadata.num_rows > 0
    )
    assert 1 < spark.read.parquet(f"{inc}/stats").count() == n_nonempty


def test_compaction_is_probe_invisible_and_shrinks_files(spark, tmp_path):
    """After many small appends, compaction must collapse the file
    count (one stats row, one file set per bucket) while the probe
    answers byte-identically — pure layout, no semantics."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        append_postings_index,
        bm25_against_index,
        compact_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs.filter(F.col("doc_id") % 4 == 0), idx, "overwrite", -1)
    for k in (1, 2, 3):
        append_postings_index(docs.filter(F.col("doc_id") % 4 == k), idx, batch_id=k)

    before_rows = _rows(bm25_against_index(spark, SF, idx))
    files_before = len(glob.glob(f"{idx}/postings/bucket=*/*.parquet"))
    assert spark.read.parquet(f"{idx}/stats").count() == 4

    compact_postings_index(spark, idx)

    assert _rows(bm25_against_index(spark, SF, idx)) == before_rows
    files_after = len(glob.glob(f"{idx}/postings/bucket=*/*.parquet"))
    n_buckets = len(glob.glob(f"{idx}/postings/bucket=*"))
    assert files_after == n_buckets < files_before
    assert spark.read.parquet(f"{idx}/stats").count() == 1
    # stats totals preserved exactly
    s = spark.read.parquet(f"{idx}/stats").collect()[0]
    base = docs.count()
    assert s.n_docs == base


def test_empty_corpus_index_probes_to_typed_empty(spark, tmp_path):
    """An index built over an empty corpus (no postings files can even
    be schema-inferred) and an empty probe workload both yield the
    typed empty contract frame, not an AnalysisException."""
    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        probe_postings_index,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    idx = str(tmp_path / "bm25")
    _write_batch(empty_docs, idx, "overwrite", -1)
    qterms = spark.createDataFrame([(0, "tok0")], "qid long, term string")
    # non-empty workload against the file-less postings dir must
    # short-circuit: there is nothing to read, so Spark must not try
    assert probe_postings_index(spark, qterms, idx).count() == 0

    no_q = spark.createDataFrame([], "qid long, term string")
    empty = probe_postings_index(spark, no_q, idx)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "qid", "doc_id", "n_terms", "score_ppb", "rank",
    ]

    # all-empty-documents corpus: n_docs > 0 but zero tokens → still
    # no postings part files; the sum_dl gate must catch it too
    blank = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string"
    )
    idx2 = str(tmp_path / "blank")
    _write_batch(blank, idx2, "overwrite", -1)
    assert probe_postings_index(spark, qterms, idx2).count() == 0


def test_index_probe_prunes_bucket_partitions(spark, tmp_path):
    """A 200-term synthetic corpus (the shipped testdata's 31-term
    vocabulary populates and probes nearly every bucket, leaving no
    pruning headroom to observe): a 3-term workload must read only
    its own bucket directories."""
    from cdc_cascade_spark.functions.hashing import token_hash
    from cdc_cascade_spark.llm.bm25_index import (
        N_BUCKETS,
        _write_batch,
        probe_postings_index,
    )
    from cdc_cascade_spark.plans.explain import physical_plan

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{(i * 7 + j) % 200}" for j in range(12)))
         for i in range(300)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)

    qterms = spark.createDataFrame(
        [(0, "tok0"), (0, "tok7"), (1, "tok14")], "qid long, term string"
    )
    df = probe_postings_index(spark, qterms, idx)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan and "bucket" in plan, plan[:2000]
    assert df.count() > 0

    probed = {
        int(r.bucket)
        for r in qterms.select(
            F.pmod(token_hash(F.col("term")), F.lit(N_BUCKETS))
            .cast("int")
            .alias("bucket")
        )
        .distinct()
        .collect()
    }
    n_dirs = len(glob.glob(f"{idx}/postings/bucket=*"))
    assert 0 < len(probed) <= 3 < n_dirs <= N_BUCKETS, (probed, n_dirs)
    # the pruned scan's file set is exactly the probed directories
    n_probed_files = sum(
        len(glob.glob(f"{idx}/postings/bucket={b}/*.parquet")) for b in probed
    )
    n_total_files = len(glob.glob(f"{idx}/postings/bucket=*/*.parquet"))
    assert 0 < n_probed_files < n_total_files


def test_replayed_micro_batch_is_invisible(spark, tmp_path):
    """At-least-once replay (r10 advice #1): re-appending the SAME
    logical batch under the SAME batch_id — exactly what a foreachBatch
    replay does after a crash between the append and the checkpoint
    commit — must change nothing a probe can observe (stats must not
    double-count, df must not see duplicate postings rows), and
    compaction must squash the replay residue permanently."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        append_postings_index,
        bm25_against_index,
        compact_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    append_postings_index(odd, idx, batch_id=7)
    want = _rows(bm25_against_index(spark, SF, idx))
    n_post_rows = spark.read.parquet(f"{idx}/postings").dropDuplicates(
        ["batch_id", "term", "doc_id"]
    ).count()

    append_postings_index(odd, idx, batch_id=7)  # replay
    append_postings_index(odd, idx, batch_id=7)  # replay again

    assert _rows(bm25_against_index(spark, SF, idx)) == want and want
    # the replays DID append files/rows (at-least-once is real) …
    assert spark.read.parquet(f"{idx}/stats").count() == 4
    assert spark.read.parquet(f"{idx}/postings").count() > n_post_rows
    # … and compaction squashes them permanently
    compact_postings_index(spark, idx)
    assert _rows(bm25_against_index(spark, SF, idx)) == want
    assert spark.read.parquet(f"{idx}/stats").count() == 1
    assert spark.read.parquet(f"{idx}/postings").count() == n_post_rows


def test_compaction_swap_is_crash_recoverable(spark, tmp_path):
    """r10 advice #2: the old rmtree-then-move swap had a window with
    NO live directory — a crash there lost the index. The new swap
    renames the live dir aside first; recover_compaction must restore
    a probing index from every crash state, and compact itself must
    succeed when re-run over one."""
    import shutil
    from pathlib import Path

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        bm25_against_index,
        compact_postings_index,
        recover_compaction,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)
    want = _rows(bm25_against_index(spark, SF, idx))

    # state A — crash after writing the compacted copies, before the
    # swap: live + .compact both present. Recover drops the residue.
    shutil.copytree(f"{idx}/postings", f"{idx}/postings.compact")
    shutil.copytree(f"{idx}/stats", f"{idx}/stats.compact")
    recover_compaction(idx)
    assert not Path(f"{idx}/postings.compact").exists()
    assert _rows(bm25_against_index(spark, SF, idx)) == want

    # state B — crash BETWEEN the two swap renames: live renamed aside,
    # compacted copy not yet promoted. No live dir exists — the state
    # the old sequence lost outright. Recover promotes the copy.
    shutil.copytree(f"{idx}/postings", f"{idx}/postings.compact")
    Path(f"{idx}/postings").rename(f"{idx}/postings.old")
    recover_compaction(idx)
    assert Path(f"{idx}/postings").exists()
    assert not Path(f"{idx}/postings.old").exists()
    assert _rows(bm25_against_index(spark, SF, idx)) == want

    # state C — only the aside dir survives (manual intervention shape).
    Path(f"{idx}/stats").rename(f"{idx}/stats.old")
    recover_compaction(idx)
    assert _rows(bm25_against_index(spark, SF, idx)) == want

    # and compact re-run over a crash state recovers then compacts
    shutil.copytree(f"{idx}/postings", f"{idx}/postings.compact")
    Path(f"{idx}/postings").rename(f"{idx}/postings.old")
    compact_postings_index(spark, idx)
    assert _rows(bm25_against_index(spark, SF, idx)) == want


def test_hot_bucket_compaction_touches_only_crossed_buckets(spark, tmp_path):
    """Per-bucket threshold compaction (the 100 TB maintenance pass):
    a bucket hammered by many small appends collapses to few files; a
    bucket below the threshold keeps its files byte-identical; probes
    cannot observe the rewrite; stats rows are untouched."""
    import glob as g
    from pathlib import Path

    from cdc_cascade_spark.functions.hashing import token_hash
    from cdc_cascade_spark.llm.bm25_index import (
        N_BUCKETS,
        _write_batch,
        append_postings_index,
        compact_hot_buckets,
        probe_postings_index,
    )

    # two terms in DIFFERENT buckets: "hot" rides every append, "cold"
    # only the build — so the threshold genuinely splits the buckets
    def bucket_of(term):
        return spark.range(1).select(
            F.pmod(token_hash(F.lit(term)), F.lit(N_BUCKETS)).cast("int")
        ).collect()[0][0]

    hot = "alpha"
    cold = next(
        t for t in ("beta", "gamma", "delta", "epsilon")
        if bucket_of(t) != bucket_of(hot)
    )
    idx = str(tmp_path / "bm25")
    base = spark.createDataFrame(
        [(1, f"{hot} {cold}"), (2, cold)], "doc_id long, text string"
    )
    _write_batch(base, idx, "overwrite", -1)
    for k in range(1, 5):
        append_postings_index(
            spark.createDataFrame(
                [(10 + k, f"{hot} {hot} filler{k}")],
                "doc_id long, text string",
            ),
            idx,
            batch_id=k,
        )

    qterms = spark.createDataFrame(
        [(1, hot), (2, cold)], "qid long, term string"
    )
    want = sorted(map(tuple, probe_postings_index(spark, qterms, idx).collect()))

    def files_by_bucket():
        return {
            Path(b).name: sorted(
                (Path(f).name, Path(f).stat().st_size)
                for f in g.glob(f"{b}/*")
                if not Path(f).name.startswith(("_", "."))
            )
            for b in g.glob(f"{idx}/postings/bucket=*")
        }

    before = files_by_bucket()
    hot_dir, cold_dir = f"bucket={bucket_of(hot)}", f"bucket={bucket_of(cold)}"
    assert len(before[hot_dir]) >= 4 > len(before[cold_dir])

    done = compact_hot_buckets(spark, idx, min_files_per_bucket=4)
    after = files_by_bucket()

    assert hot_dir in done and cold_dir not in done
    assert len(after[hot_dir]) < len(before[hot_dir])
    assert after[cold_dir] == before[cold_dir], "cold bucket changed"
    got = sorted(map(tuple, probe_postings_index(spark, qterms, idx).collect()))
    assert got == want and want
    # stats rows untouched (not bucket-local; whole-index compaction
    # owns them)
    assert spark.read.parquet(f"{idx}/stats").count() == 5


def test_recover_clears_per_bucket_compaction_residue(spark, tmp_path):
    """Crash residue from the per-bucket pass is INSIDE postings/ —
    a lingering bucket=K._compact_bak would parse as a STRING
    partition value and silently blank every pruned probe — so
    recover_compaction must promote/clear it before any read."""
    import shutil
    from pathlib import Path

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        bm25_against_index,
        compact_hot_buckets,
        recover_compaction,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)
    want = _rows(bm25_against_index(spark, SF, idx))

    buckets = sorted(
        p for p in Path(f"{idx}/postings").iterdir() if p.name.startswith("bucket=")
    )
    b0, b1 = buckets[0], buckets[1]
    # crash state A: bak present, live gone (mid-swap crash)
    b0.rename(Path(f"{b0}._compact_bak"))
    # crash state B: tmp written, live intact (pre-swap crash)
    shutil.copytree(b1, f"{b1}._compact_tmp")

    recover_compaction(idx)
    assert b0.exists() and not Path(f"{b0}._compact_bak").exists()
    assert not Path(f"{b1}._compact_tmp").exists()
    assert _rows(bm25_against_index(spark, SF, idx)) == want and want

    # and compact_hot_buckets over a crash state recovers first
    b0.rename(Path(f"{b0}._compact_bak"))
    compact_hot_buckets(spark, idx, min_files_per_bucket=10_000)
    assert b0.exists()
    assert _rows(bm25_against_index(spark, SF, idx)) == want


def test_compaction_lock_blocks_appends_and_probes(spark, tmp_path):
    """r11 verdict #5: the quiesce-ingest/reads contract is mechanical
    now — while a compaction holds the _COMPACTING sentinel, appends
    and probes raise loudly instead of racing the per-directory swaps;
    recover_compaction clears a crashed run's sentinel."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_compaction_lock,
        _write_batch,
        append_postings_index,
        bm25_against_index,
        recover_compaction,
        write_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)
    want = _rows(bm25_against_index(spark, SF, idx))

    _acquire_compaction_lock(idx)  # a compaction is (claimed) running
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        append_postings_index(batch, idx, batch_id=1)
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        bm25_against_index(spark, SF, idx)
    # a rebuild takes the SENTINEL side of the protocol now (r13
    # advice: writer-vs-writer exclusion) — under a held lock it fails
    # the exclusive create, exactly like a second compactor
    with pytest.raises(FileExistsError, match="_COMPACTING"):
        write_postings_index(spark, SF, idx)
    # a second compactor cannot take the lock either
    with pytest.raises(FileExistsError):
        _acquire_compaction_lock(idx)

    # crash repair clears the sentinel; reads and writes resume
    recover_compaction(idx)
    assert _rows(bm25_against_index(spark, SF, idx)) == want and want
    append_postings_index(batch, idx, batch_id=1)


def test_post_squash_replay_is_rejected_by_watermark(spark, tmp_path):
    """r11 advice #2: compaction squashes every epoch to BUILD_BATCH_ID;
    an uncommitted streaming epoch replayed AFTER the squash used to be
    permanently double-counted. The squash row now records the highest
    absorbed epoch id (squashed_through) and (a) append skips epochs at
    or below it, (b) the read side drops any such rows that bypassed
    the append guard, (c) the next compaction removes them for good."""
    import glob as g

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        append_postings_index,
        bm25_against_index,
        compact_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    append_postings_index(odd, idx, batch_id=3)
    want = _rows(bm25_against_index(spark, SF, idx))

    compact_postings_index(spark, idx)  # squashes epoch 3; watermark=3
    s = spark.read.parquet(f"{idx}/stats").collect()
    assert len(s) == 1 and s[0].squashed_through == 3

    # (a) the replayed epoch is skipped outright: no new files anywhere
    files_before = sorted(g.glob(f"{idx}/postings/bucket=*/*.parquet"))
    append_postings_index(odd, idx, batch_id=3)
    assert sorted(g.glob(f"{idx}/postings/bucket=*/*.parquet")) == files_before
    assert spark.read.parquet(f"{idx}/stats").count() == 1
    assert _rows(bm25_against_index(spark, SF, idx)) == want and want
    # a FRESH epoch above the watermark still appends normally
    append_postings_index(odd.limit(0), idx, batch_id=4)
    assert spark.read.parquet(f"{idx}/stats").count() == 2

    # (b) rows that bypassed the guard (a replay racing the squash)
    # are invisible to probes via the read-side watermark filter
    _write_batch(odd, idx, "append", 3)
    assert spark.read.parquet(f"{idx}/stats").count() == 3
    assert _rows(bm25_against_index(spark, SF, idx)) == want

    # (c) and the next compaction drops them permanently — the postings
    # row count equals a clean full build's (no double-counted rows)
    compact_postings_index(spark, idx)
    n_after = spark.read.parquet(f"{idx}/postings").count()
    full = str(tmp_path / "full")
    _write_batch(docs, full, "overwrite", -1)
    assert n_after == spark.read.parquet(f"{full}/postings").count()
    assert _rows(bm25_against_index(spark, SF, idx)) == want


def test_probe_self_repairs_hidden_crash_residue(spark, tmp_path):
    """r11 advice #1: a crashed per-bucket compaction must not leave
    probes silently wrong until the next maintenance run. The transient
    siblings are dot-hidden now (Spark listing skips them — no more
    partition-type poisoning), and the probe itself promotes a bak
    whose live bucket vanished mid-swap, so the very next read is
    already correct with no operator action."""
    import shutil
    from pathlib import Path

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        bm25_against_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)
    want = _rows(bm25_against_index(spark, SF, idx))

    buckets = sorted(
        p for p in Path(f"{idx}/postings").iterdir()
        if p.name.startswith("bucket=")
    )
    b0, b1 = buckets[0], buckets[1]
    # crash state A: live bucket renamed aside to the HIDDEN bak form
    # (compact_table crashed between its two renames)
    b0.rename(b0.parent / f".{b0.name}._compact_bak")
    # crash state B: hidden tmp fully written, live intact (pre-swap)
    shutil.copytree(b1, b1.parent / f".{b1.name}._compact_tmp")

    # NO explicit recover_compaction: the probe repairs first
    assert _rows(bm25_against_index(spark, SF, idx)) == want and want
    assert b0.exists()
    assert not (b0.parent / f".{b0.name}._compact_bak").exists()
    # the probe-side repair is PROMOTE-ONLY: a hidden tmp next to an
    # intact live dir is exactly what a LIVE compaction mid-write
    # looks like, so the probe must leave it (it is reader-invisible;
    # the next compaction's full recover sweeps it)
    assert (b1.parent / f".{b1.name}._compact_tmp").exists()
    from cdc_cascade_spark.llm.bm25_index import recover_compaction

    recover_compaction(idx)
    assert not (b1.parent / f".{b1.name}._compact_tmp").exists()


def test_compact_table_transients_are_invisible_to_spark(spark, tmp_path):
    """The r11 advice's discovery-poisoning scenario, pinned at the
    source: hidden-form residue inside a Hive-partitioned root must not
    flip the partition column to string or change a typed pruned read
    (the old visible naming did both)."""
    import shutil

    df = spark.createDataFrame(
        [(i, i % 4) for i in range(64)], "v long, bucket int"
    )
    root = str(tmp_path / "tbl")
    df.write.partitionBy("bucket").parquet(root)
    want = sorted(
        tuple(r) for r in spark.read.parquet(root)
        .filter(F.col("bucket") == 2).collect()
    )
    # hidden residue of a crashed compact_table over bucket=1
    shutil.copytree(f"{root}/bucket=1", f"{root}/.bucket=1._compact_bak")
    shutil.copytree(f"{root}/bucket=1", f"{root}/.bucket=1._compact_tmp")

    got_df = spark.read.parquet(root).filter(F.col("bucket") == 2)
    assert dict(got_df.dtypes)["bucket"] == "int"  # type not poisoned
    assert sorted(tuple(r) for r in got_df.collect()) == want and want


def test_watermark_is_monotone_across_squash_cycles(spark, tmp_path):
    """Two full append → compact cycles: the second squash's watermark
    must cover BOTH the new epochs and the first squash's (monotone
    max), fresh epochs above the watermark always land, and the final
    index equals a clean one-shot build — the long-running-deployment
    lifecycle in miniature."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        append_postings_index,
        bm25_against_index,
        compact_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    thirds = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    idx = str(tmp_path / "bm25")

    # cycle 1: build + epoch 0, squash
    _write_batch(thirds[0], idx, "overwrite", -1)
    append_postings_index(thirds[1], idx, batch_id=0)
    compact_postings_index(spark, idx)
    s1 = spark.read.parquet(f"{idx}/stats").collect()[0]
    assert s1.squashed_through == 0

    # cycle 2: epoch 1 (fresh, above wm — must land), replay epoch 0
    # (squashed — must skip), squash again
    append_postings_index(thirds[2], idx, batch_id=1)
    append_postings_index(thirds[1], idx, batch_id=0)  # skipped
    assert spark.read.parquet(f"{idx}/stats").count() == 2
    compact_postings_index(spark, idx)
    s2 = spark.read.parquet(f"{idx}/stats").collect()[0]
    assert s2.squashed_through == 1  # monotone: max(epoch 1, prior 0)

    # epoch 1 replayed after ITS squash is rejected by the new wm too
    append_postings_index(thirds[2], idx, batch_id=1)
    assert spark.read.parquet(f"{idx}/stats").count() == 1

    full = str(tmp_path / "full")
    _write_batch(docs, full, "overwrite", -1)
    got = _rows(bm25_against_index(spark, SF, idx))
    want = _rows(bm25_against_index(spark, SF, full))
    assert got == want and got
    # scalars equal the clean build's exactly
    f = spark.read.parquet(f"{full}/stats").collect()[0]
    assert (s2.n_docs, s2.sum_dl) == (f.n_docs, f.sum_dl) == (
        spark.read.parquet(f"{idx}/stats").collect()[0].n_docs,
        spark.read.parquet(f"{idx}/stats").collect()[0].sum_dl,
    )


def test_random_lifecycle_walk_matches_live_batch_model(spark, tmp_path):
    """Seeded random walk over the index's whole operational alphabet —
    append / replay / compact / crash-mid-swap / recover — checked
    after every step against a pure-Python model of which documents
    are LIVE (appended once, under the replay/watermark rules). The
    deterministic suites above pin each transition; this pins the
    COMPOSITIONS (replay after two squashes, crash between appends,
    compact twice in a row, ...)."""
    import random
    import shutil
    from pathlib import Path

    from cdc_cascade_spark.llm.bm25_index import (
        _write_batch,
        append_postings_index,
        compact_postings_index,
        probe_postings_index,
        recover_compaction,
    )

    rng = random.Random(20260815)
    # tiny synthetic corpus: doc i holds tokens tok{i%5} tok{(i*3)%7}
    def batch(ids):
        return spark.createDataFrame(
            [(i, f"tok{i % 5} tok{(i * 3) % 7} common") for i in ids],
            "doc_id long, text string",
        )

    idx = str(tmp_path / "walk")
    _write_batch(batch(range(0, 4)), idx, "overwrite", -1)
    live = set(range(0, 4))         # model: docs visible to probes
    appended: dict[int, list[int]] = {}  # epoch → doc ids
    wm = -1                          # model watermark
    next_doc = 4
    qterms = spark.createDataFrame(
        [(0, "common"), (1, "tok1"), (2, "tok3")], "qid long, term string"
    )

    def check():
        got = {
            r.doc_id
            for r in probe_postings_index(spark, qterms, idx)
            .select("doc_id")
            .distinct()
            .collect()
        }
        # every live doc contains 'common', and TOPK=10 may cut the
        # list — so check via a full-width probe instead: the tf rows
        # behind rank are cut, but n_terms/rank only reorder; use the
        # model as a SUPERSET check plus exact equality on the ranked
        # ids being live
        assert got <= live, (got - live, "probe surfaced a dead doc")
        # and the probe's corpus scalars must equal the model's
        from cdc_cascade_spark.llm.bm25_index import _stats_summary

        n_docs, _sum_dl, got_wm = _stats_summary(spark, idx)
        assert n_docs == len(live)
        assert got_wm == wm

    for step in range(14):
        op = rng.choice(["append", "replay", "compact", "crash", "append"])
        if op == "append":
            epoch = max(appended, default=-1) + 1
            ids = list(range(next_doc, next_doc + rng.randint(1, 3)))
            next_doc += len(ids)
            append_postings_index(batch(ids), idx, batch_id=epoch)
            if epoch > wm:  # model: lands iff above the watermark
                appended[epoch] = ids
                live |= set(ids)
        elif op == "replay" and appended:
            epoch = rng.choice(sorted(appended))
            append_postings_index(batch(appended[epoch]), idx, batch_id=epoch)
            # model: no change (dedup or watermark rejects it)
        elif op == "compact":
            compact_postings_index(spark, idx)
            if appended:
                wm = max(max(appended), wm)
        elif op == "crash":
            # simulate a crash mid whole-index swap: live aside, the
            # compacted copy present — then recover (as a probe would)
            shutil.copytree(f"{idx}/postings", f"{idx}/postings.compact")
            Path(f"{idx}/postings").rename(f"{idx}/postings.old")
            recover_compaction(idx)
        check()


def test_lock_first_ordering_and_scoped_recover(spark, tmp_path):
    """Lock-state refinements: (a) a compactor entering over a CRASHED
    sentinel raises instead of silently unlocking it (the operator
    repairs once with recover_compaction); (b) the probe-side recover
    leaves the sentinel alone (clear_lock=False), so a recover racing
    a just-started compaction can never unlock it."""
    import pytest
    from pathlib import Path

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_compaction_lock,
        _write_batch,
        compact_postings_index,
        recover_compaction,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)

    _acquire_compaction_lock(idx)  # a prior run "crashed" holding it
    with pytest.raises(FileExistsError):
        compact_postings_index(spark, idx)
    # scoped recover must NOT unlock
    recover_compaction(idx, clear_lock=False)
    assert (Path(idx) / "_COMPACTING").exists()
    # operator repair unlocks; compaction then runs clean
    recover_compaction(idx)
    assert not (Path(idx) / "_COMPACTING").exists()
    compact_postings_index(spark, idx)
    assert spark.read.parquet(f"{idx}/stats").count() == 1


def test_uncommitted_epoch_is_dropped_by_squash_and_replays_cleanly(
    spark, tmp_path
):
    """The stats delta row is an epoch's COMMIT RECORD (r12 review
    finding): postings whose stats write crashed must be DROPPED by
    the squash — not absorbed under BUILD_BATCH_ID (their replay
    would double-count) and not watermarked past (their replay would
    be skipped while the scalars never counted them). After the
    squash, the replay re-appends both artifacts cleanly and the
    index equals a clean full build."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _postings_frame,
        _write_batch,
        append_postings_index,
        bm25_against_index,
        compact_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    thirds = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    idx = str(tmp_path / "bm25")
    _write_batch(thirds[0], idx, "overwrite", -1)
    append_postings_index(thirds[1], idx, batch_id=1)

    # epoch 2 crashed between the two artifact writes: postings only
    post = _postings_frame(thirds[2]).withColumn(
        "batch_id", F.lit(2).cast("long")
    )
    (
        post.repartition("bucket").write.mode("append")
        .partitionBy("bucket").parquet(f"{idx}/postings")
    )

    compact_postings_index(spark, idx)
    s = spark.read.parquet(f"{idx}/stats").collect()[0]
    # watermark covers only COMMITTED epochs …
    assert s.squashed_through == 1
    # … and the uncommitted postings are gone, not squashed
    two_docs = {r.doc_id for r in thirds[2].select("doc_id").collect()}
    left = {
        r.doc_id
        for r in spark.read.parquet(f"{idx}/postings")
        .select("doc_id").distinct().collect()
    }
    assert not (left & two_docs)

    # the replay lands as a fresh committed epoch above the watermark
    append_postings_index(thirds[2], idx, batch_id=2)
    full = str(tmp_path / "full")
    _write_batch(docs, full, "overwrite", -1)
    got = _rows(bm25_against_index(spark, SF, idx))
    want = _rows(bm25_against_index(spark, SF, full))
    assert got == want and got


def test_watermark_marker_lifecycle(spark, tmp_path):
    """The append guard's marker file: absent until the first squash
    (appends pay NO Spark job), written by compaction, reset by a
    rebuild so a fresh batch-id lineage is not gated by a previous
    life's watermark."""
    from pathlib import Path

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _marker_watermark,
        _write_batch,
        append_postings_index,
        compact_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    assert _marker_watermark(idx) == -1
    assert not (Path(idx) / "_SQUASH_WATERMARK").exists()

    odd = docs.filter(F.col("doc_id") % 2 == 1)
    append_postings_index(odd, idx, batch_id=4)
    compact_postings_index(spark, idx)
    assert _marker_watermark(idx) == 4

    # a replayed squashed epoch is skipped via the marker alone
    append_postings_index(odd, idx, batch_id=4)
    assert spark.read.parquet(f"{idx}/stats").count() == 1

    # rebuild resets the lineage: epoch 0 must land again
    _write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    assert _marker_watermark(idx) == -1
    append_postings_index(odd, idx, batch_id=0)
    assert spark.read.parquet(f"{idx}/stats").count() == 2


def test_live_append_claim_blocks_compaction(spark, tmp_path):
    """r12 advice (medium): the old single entry-check let a compactor
    acquire the lock DURING a multi-second append write and rmtree
    files that landed after its snapshot — silent data loss on a
    committed epoch. The two-flag protocol closes it: while an append
    holds its claim file, a compactor raises at acquisition (touching
    nothing and leaving no sentinel), and with the sentinel already
    held the append raises BEFORE writing anything, so its streaming
    epoch fails before the checkpoint commits and replays cleanly."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_append_claim,
        _acquire_compaction_lock,
        _live_append_claims,
        _sentinel,
        _write_batch,
        append_postings_index,
        bm25_against_index,
        compact_postings_index,
        recover_compaction,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)
    want = _rows(bm25_against_index(spark, SF, idx))

    # an append is mid-write (its claim is on disk): both the raw lock
    # and the full compaction refuse, and neither leaves a sentinel
    # behind (a stuck sentinel would block the append's own retry)
    claim = _acquire_append_claim(idx)
    with pytest.raises(RuntimeError, match="append"):
        _acquire_compaction_lock(idx)
    assert not _sentinel(idx).exists()
    with pytest.raises(RuntimeError, match="append"):
        compact_postings_index(spark, idx)
    assert not _sentinel(idx).exists()
    # the index itself is untouched — probes still serve
    assert _rows(bm25_against_index(spark, SF, idx)) == want

    # append finishes → claim released → compaction proceeds
    claim.unlink()
    compact_postings_index(spark, idx)
    assert _rows(bm25_against_index(spark, SF, idx)) == want and want


def test_crashed_append_claim_is_swept_by_recover_only(spark, tmp_path):
    """A claim left by a CRASHED writer blocks compaction loudly until
    the operator's recover_compaction sweeps it; the probe-side
    promote-only repair must NOT sweep it (it could be a live append's)."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_append_claim,
        _live_append_claims,
        _repair_for_read,
        _write_batch,
        bm25_against_index,
        compact_postings_index,
        recover_compaction,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)
    _acquire_append_claim(idx)  # crashed writer: never released

    # probes still run (reads race nothing) and their repair pass
    # leaves the claim alone
    assert _rows(bm25_against_index(spark, SF, idx))
    _repair_for_read(idx)
    assert len(_live_append_claims(idx)) == 1

    with pytest.raises(RuntimeError, match="append"):
        compact_postings_index(spark, idx)

    # r13 advice: the sweep runs on the operator's word alone, so a
    # FRESH claim (a strong hint the writer is live, since claims span
    # one append) is refused without force=True...
    with pytest.raises(RuntimeError, match="force=True"):
        recover_compaction(idx)
    assert len(_live_append_claims(idx)) == 1
    # ...force overrides for the operator who just killed the ingest
    recover_compaction(idx, force=True)
    assert _live_append_claims(idx) == []

    # a claim that has AGED past the threshold sweeps without force —
    # the genuinely-crashed-writer path (backdate via utime)
    import os
    import time

    claim = _acquire_append_claim(idx)
    past = time.time() - 3600
    os.utime(claim, (past, past))
    recover_compaction(idx)  # operator repair: contract is nothing runs
    assert _live_append_claims(idx) == []
    compact_postings_index(spark, idx)


def test_append_guard_releases_claim_on_every_exit(spark, tmp_path):
    """Success, the watermark skip, and the sentinel raise must all
    leave zero claim files — a leaked claim would block every future
    compaction."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_compaction_lock,
        _live_append_claims,
        _release_compaction_lock,
        _write_batch,
        _write_watermark_marker,
        append_postings_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    _write_batch(docs, idx, "overwrite", -1)
    batch = docs.filter(F.col("doc_id") % 7 == 0)

    append_postings_index(batch, idx, batch_id=1)  # success path
    assert _live_append_claims(idx) == []

    _write_watermark_marker(idx, 5)
    append_postings_index(batch, idx, batch_id=3)  # watermark skip path
    assert _live_append_claims(idx) == []

    _acquire_compaction_lock(idx)
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        append_postings_index(batch, idx, batch_id=9)
    assert _live_append_claims(idx) == []
    _release_compaction_lock(idx)


def test_chunk_index_append_holds_claim_too(spark, tmp_path):
    """The chunk layout shares the writer guard: a live claim blocks
    its compaction, the sentinel blocks its appends pre-write."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_append_claim,
        _acquire_compaction_lock,
        _live_append_claims,
        _release_compaction_lock,
    )
    from cdc_cascade_spark.llm.chunk_index import (
        append_chunk_index,
        compact_chunk_index,
        write_chunk_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "chunks")
    write_chunk_index(spark, SF, idx)
    assert _live_append_claims(idx) == []

    _acquire_append_claim(idx)
    with pytest.raises(RuntimeError, match="append"):
        compact_chunk_index(spark, idx)
    for c in _live_append_claims(idx):
        c.unlink()

    _acquire_compaction_lock(idx)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        append_chunk_index(batch, idx, batch_id=1)
    assert _live_append_claims(idx) == []
    _release_compaction_lock(idx)


def test_live_interleaved_append_blocks_compactor_until_landed(
    spark, tmp_path, monkeypatch
):
    """LIVE interleaving (not simulated claim files): an append is
    suspended INSIDE its write — after its claim/sentinel entry checks
    passed — while a compactor attempts to start. The compactor must
    fail loudly (it can no longer acquire mid-append, the r12-advice
    data-loss window), the suspended append must then land in full,
    and the post-drain compaction must observe it."""
    import threading

    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    bi._write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)

    in_write = threading.Event()
    release = threading.Event()
    real_write = bi._write_batch

    def paused_write(b_docs, out, mode, bid):
        in_write.set()
        assert release.wait(timeout=60), "test deadlock"
        real_write(b_docs, out, mode, bid)

    monkeypatch.setattr(bi, "_write_batch", paused_write)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    errors: list[BaseException] = []

    def appender() -> None:
        try:
            bi.append_postings_index(batch, idx, batch_id=1)
        except BaseException as e:  # pragma: no cover - failure detail
            errors.append(e)

    t = threading.Thread(target=appender)
    t.start()
    assert in_write.wait(timeout=60)
    # append is mid-write, claim held: the compactor cannot begin
    with pytest.raises(RuntimeError, match="append"):
        bi.compact_postings_index(spark, idx)
    assert not bi._sentinel(idx).exists()

    release.set()
    t.join(timeout=120)
    assert not t.is_alive() and not errors, errors
    assert bi._live_append_claims(idx) == []

    # the suspended append landed in full: stats has both batches and
    # the post-drain compaction preserves the probe rows
    monkeypatch.setattr(bi, "_write_batch", real_write)
    assert spark.read.parquet(f"{idx}/stats").count() == 2
    want = _rows(bi.bm25_against_index(spark, SF, idx))
    bi.compact_postings_index(spark, idx)
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want and want


def test_sequential_ingest_with_concurrent_compactor_loses_nothing(
    spark, tmp_path
):
    """Stress the two-flag protocol with REAL concurrency in the
    SUPPORTED shape: one sequential writer (the streaming contract —
    epoch ids monotone, a refused epoch retries under the SAME id)
    races a compactor loop and a prober loop. Every compaction attempt
    either raises loudly or completes; a refused epoch's retry can
    never be watermark-skipped (its commit record had not landed, so
    no squash absorbed it); and the final index must equal a
    from-scratch rebuild over the same documents.

    (A first version of this test ran appends with CONCURRENT
    independent ids — that violates the documented monotone-id
    contract and loses exactly the batch the r12-advice note predicts:
    a compaction committing id 3 while id 2 is in flight makes 2's
    replay watermark-skipped. Kept sequential here on purpose.)"""
    import threading

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    bi._write_batch(docs.filter(F.col("doc_id") % 5 == 0), idx, "overwrite", -1)

    append_errors: list[BaseException] = []
    probe_errors: list[BaseException] = []
    done = threading.Event()

    def writer() -> None:
        try:
            for epoch in (1, 2, 3, 4):  # monotone ids, the epoch contract
                batch = docs.filter(F.col("doc_id") % 5 == epoch)
                while True:
                    try:
                        bi.append_postings_index(batch, idx, batch_id=epoch)
                        break
                    except RuntimeError as e:
                        if "_COMPACTING" not in str(e):
                            raise  # loud, unexpected
                        # the epoch failed BEFORE writing: replay it
                        # under the same id (streaming semantics)
        except BaseException as e:  # pragma: no cover - failure detail
            append_errors.append(e)

    def compactor() -> None:
        while not done.is_set():
            try:
                bi.compact_postings_index(spark, idx)
            except (RuntimeError, FileExistsError):
                pass  # claims in flight — the loud refusal path

    def prober() -> None:
        while not done.is_set():
            try:
                bi.bm25_against_index(spark, SF, idx).count()
            except RuntimeError as e:
                if "_COMPACTING" not in str(e):
                    probe_errors.append(e)
                    return

    comp = threading.Thread(target=compactor)
    prb = threading.Thread(target=prober)
    wrt = threading.Thread(target=writer)
    comp.start(); prb.start(); wrt.start()
    wrt.join(timeout=600)
    done.set()
    comp.join(timeout=600)
    prb.join(timeout=600)
    assert not wrt.is_alive()
    assert not append_errors, append_errors
    assert not probe_errors, probe_errors
    assert bi._live_append_claims(idx) == []
    assert not bi._sentinel(idx).exists()

    rebuilt = str(tmp_path / "rebuild")
    bi._write_batch(docs, rebuilt, "overwrite", -1)
    got = _rows(bi.bm25_against_index(spark, SF, idx))
    want = _rows(bi.bm25_against_index(spark, SF, rebuilt))
    assert got == want and got


def test_rebuild_takes_sentinel_and_excludes_live_appends(spark, tmp_path):
    """r13 advice (writer-vs-writer): claim files exclude writers
    against the COMPACTOR only — two claim holders never check each
    other's flags, so a rebuild racing a live append used to be able
    to interleave its overwrite with the append's in-flight files.
    Builds take the sentinel side of the two-flag protocol now: a
    rebuild refuses while any append claim is live (leaving no
    sentinel behind), and a mid-rebuild append raises at its sentinel
    check before writing anything."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_append_claim,
        _live_append_claims,
        _sentinel,
        bm25_against_index,
        write_postings_index,
    )
    from cdc_cascade_spark.llm.chunk_index import (
        chunked_against_index,
        write_chunk_index,
    )

    # first-ever build on a fresh path exercises the lock's mkdir
    idx = str(tmp_path / "bm25")
    write_postings_index(spark, SF, idx)
    assert not _sentinel(idx).exists()
    want = _rows(bm25_against_index(spark, SF, idx))
    assert want

    # an append is mid-write: the rebuild refuses at its claim check,
    # leaves no sentinel (a stuck one would block the append's retry),
    # and touches nothing — the live index still serves
    claim = _acquire_append_claim(idx)
    with pytest.raises(RuntimeError, match="append"):
        write_postings_index(spark, SF, idx)
    assert not _sentinel(idx).exists()
    assert _rows(bm25_against_index(spark, SF, idx)) == want

    # append done → rebuild proceeds and releases the sentinel
    claim.unlink()
    write_postings_index(spark, SF, idx)
    assert not _sentinel(idx).exists()
    assert _live_append_claims(idx) == []
    assert _rows(bm25_against_index(spark, SF, idx)) == want

    # chunk twin shares the contract
    cidx = str(tmp_path / "chunks")
    write_chunk_index(spark, SF, cidx)
    cwant = sorted(map(tuple, chunked_against_index(spark, SF, cidx).collect()))
    cclaim = _acquire_append_claim(cidx)
    with pytest.raises(RuntimeError, match="append"):
        write_chunk_index(spark, SF, cidx)
    assert not _sentinel(cidx).exists()
    cclaim.unlink()
    write_chunk_index(spark, SF, cidx)
    cgot = sorted(map(tuple, chunked_against_index(spark, SF, cidx).collect()))
    assert cgot == cwant and cwant


def test_compactor_wait_drains_live_append_then_compacts(
    spark, tmp_path, monkeypatch
):
    """Opt-in liveness variant (r13 verdict #7, reworked after the r14
    self-review): with ``wait_for_appends_s`` set, a compactor that
    finds a LIVE append in flight polls the claim listing WITHOUT any
    flag held until a claim-free instant — so for the whole wait no
    sentinel exists, probes keep serving, and new appends keep
    landing. The suspended append lands in full and the compaction
    that follows observes it."""
    import threading
    import time

    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25")
    bi._write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)

    in_write = threading.Event()
    release = threading.Event()
    real_write = bi._write_batch

    def paused_write(b_docs, out, mode, bid):
        in_write.set()
        assert release.wait(timeout=60), "test deadlock"
        real_write(b_docs, out, mode, bid)

    monkeypatch.setattr(bi, "_write_batch", paused_write)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    errors: list[BaseException] = []

    def appender() -> None:
        try:
            bi.append_postings_index(batch, idx, batch_id=1)
        except BaseException as e:  # pragma: no cover - failure detail
            errors.append(e)

    compacted = threading.Event()

    def compactor() -> None:
        try:
            bi.compact_postings_index(spark, idx, wait_for_appends_s=120)
            compacted.set()
        except BaseException as e:  # pragma: no cover - failure detail
            errors.append(e)

    t = threading.Thread(target=appender)
    t.start()
    assert in_write.wait(timeout=60)
    c = threading.Thread(target=compactor)
    c.start()
    time.sleep(1.0)  # several poll cycles with the claim held
    # the compactor is WAITING flaglessly: not done, claim live, and
    # NO sentinel exists (the pre-rework draft held the sentinel here,
    # blocking every read for up to the full timeout)
    assert not compacted.is_set()
    assert bi._live_append_claims(idx)
    assert not bi._sentinel(idx).exists()
    # probes keep serving DURING the wait...
    monkeypatch.setattr(bi, "_write_batch", real_write)
    assert _rows(bi.bm25_against_index(spark, SF, idx))
    # ...and a NEW append lands during the wait too (an empty batch:
    # disjoint from both halves, so the final equality check below
    # stays exact). It extends the wait rather than deadlocking it.
    bi.append_postings_index(docs.filter(F.lit(False)), idx, batch_id=2)
    assert not compacted.is_set()

    release.set()
    t.join(timeout=120)
    c.join(timeout=120)
    assert not t.is_alive() and not c.is_alive() and not errors, errors
    assert compacted.is_set()
    assert not bi._sentinel(idx).exists()
    assert bi._live_append_claims(idx) == []

    # the drained-then-compacted index equals a from-scratch rebuild
    rebuilt = str(tmp_path / "rebuild")
    bi._write_batch(docs, rebuilt, "overwrite", -1)
    got = _rows(bi.bm25_against_index(spark, SF, idx))
    want = _rows(bi.bm25_against_index(spark, SF, rebuilt))
    assert got == want and got
    # replay residue squashed: one stats row, watermark ≥ the epoch
    assert spark.read.parquet(f"{idx}/stats").count() == 1


def test_compactor_wait_deadline_raises_on_crashed_writer_claim(
    spark, tmp_path
):
    """The bounded wait preserves the loud default for exactly the
    case where waiting would hang: a CRASHED writer's claim never
    drains, so the deadline raise fires with no sentinel ever created
    (the wait polls flaglessly) and the index keeps serving
    throughout. Chunk twin shares the contract."""
    import pytest

    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_append_claim,
        _live_append_claims,
        _sentinel,
        bm25_against_index,
        compact_postings_index,
        write_postings_index,
    )
    from cdc_cascade_spark.llm.chunk_index import (
        chunked_against_index,
        compact_chunk_index,
        write_chunk_index,
    )

    idx = str(tmp_path / "bm25")
    write_postings_index(spark, SF, idx)
    want = _rows(bm25_against_index(spark, SF, idx))
    claim = _acquire_append_claim(idx)
    with pytest.raises(RuntimeError, match="waited up to 0.3"):
        compact_postings_index(spark, idx, wait_for_appends_s=0.3)
    assert not _sentinel(idx).exists()
    assert _live_append_claims(idx) == [claim]
    assert _rows(bm25_against_index(spark, SF, idx)) == want and want

    cidx = str(tmp_path / "chunks")
    write_chunk_index(spark, SF, cidx)
    cwant = sorted(map(tuple, chunked_against_index(spark, SF, cidx).collect()))
    _acquire_append_claim(cidx)
    with pytest.raises(RuntimeError, match="waited up to 0.2"):
        compact_chunk_index(spark, cidx, wait_for_appends_s=0.2)
    assert not _sentinel(cidx).exists()
    cgot = sorted(map(tuple, chunked_against_index(spark, SF, cidx).collect()))
    assert cgot == cwant and cwant


def test_failed_rebuild_leaves_old_layout_serving(spark, tmp_path, monkeypatch):
    """Review finding r14 (the serious one): a rebuild that FAILS
    mid-write must leave the live layout byte-untouched and serving —
    the old in-place overwrite unlocked a half-overwritten layout on
    any failure. The swap-based build never touches the live dirs
    until both fresh artifacts are complete."""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    bi.write_postings_index(spark, SF, idx)
    want = _rows(bi.bm25_against_index(spark, SF, idx))
    assert want

    real_frame = bi._postings_frame

    def exploding_frame(docs):
        raise RuntimeError("executor lost (injected)")

    monkeypatch.setattr(bi, "_postings_frame", exploding_frame)
    with pytest.raises(RuntimeError, match="injected"):
        bi.write_postings_index(spark, SF, idx)

    # rolled back: unlocked, no temp residue, no commit record, and
    # the live layout still answers identically
    assert not bi._sentinel(idx).exists()
    assert not (tmp_path / "bm25" / "postings.compact").exists()
    assert not (tmp_path / "bm25" / "stats.compact").exists()
    assert not (tmp_path / "bm25" / bi._REBUILD_COMMIT).exists()
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want

    # and a re-run (the documented repair) succeeds
    monkeypatch.setattr(bi, "_postings_frame", real_frame)
    bi.write_postings_index(spark, SF, idx)
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want

    # chunk twin shares the flow
    from cdc_cascade_spark.llm import chunk_index as ci

    cidx = str(tmp_path / "chunks")
    ci.write_chunk_index(spark, SF, cidx)
    cwant = sorted(map(tuple, ci.chunked_against_index(spark, SF, cidx).collect()))

    def exploding_chunk_frame(docs):
        raise RuntimeError("executor lost (injected)")

    monkeypatch.setattr(ci, "_chunk_postings_frame", exploding_chunk_frame)
    with pytest.raises(RuntimeError, match="injected"):
        ci.write_chunk_index(spark, SF, cidx)
    assert not bi._sentinel(cidx).exists()
    cgot = sorted(map(tuple, ci.chunked_against_index(spark, SF, cidx).collect()))
    assert cgot == cwant and cwant


def test_rebuild_swap_crash_rolls_forward_under_recover(
    spark, tmp_path, monkeypatch
):
    """A crash INSIDE the rebuild's swap phase (after the commit
    record, between the two artifact swaps — the state that used to
    decay into new postings served against old stats) must: block
    reads loudly (sentinel held), and roll FORWARD under
    recover_compaction to the consistent new build."""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    # old life: even docs only, plus an append to give it a marker
    from cdc_cascade_spark.catalog import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bi._write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    bi.append_postings_index(docs.filter(F.col("doc_id") % 2 == 1), idx, batch_id=1)
    bi.compact_postings_index(spark, idx)  # leaves a watermark marker
    assert bi._marker_watermark(idx) == 1

    real_swap = bi._swap_compacted
    swapped: list[str] = []

    def crashing_swap(out_path, name):
        if name == "stats":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)
        swapped.append(name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        bi.write_postings_index(spark, SF, idx)
    assert swapped == ["postings"]

    # mid-commit: sentinel held, reads refuse loudly (the
    # inconsistent postings-new/stats-old mix must not serve)
    assert bi._sentinel(idx).exists()
    assert (Path(idx) / bi._REBUILD_COMMIT).exists()
    with pytest.raises(RuntimeError, match="compacted or rebuilt"):
        bi.bm25_against_index(spark, SF, idx).collect()

    # operator repair: the commit record rolls the swap FORWARD
    monkeypatch.setattr(bi, "_swap_compacted", real_swap)
    bi.recover_compaction(idx)
    assert not bi._sentinel(idx).exists()
    assert not (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert not (Path(idx) / "stats.compact").exists()
    assert not (Path(idx) / "postings.compact").exists()
    # fresh lineage: the old life's squash marker was reset
    assert bi._marker_watermark(idx) == -1

    rebuilt = str(tmp_path / "reference")
    bi.write_postings_index(spark, SF, rebuilt)
    got = _rows(bi.bm25_against_index(spark, SF, idx))
    want = _rows(bi.bm25_against_index(spark, SF, rebuilt))
    assert got == want and got


def test_crashed_first_build_partial_temp_is_cleared_not_promoted(
    spark, tmp_path
):
    """A FIRST-ever build that dies mid-write leaves a possibly-PARTIAL
    postings.compact with no live layout, no .old, and no commit
    record. recover_compaction must clear it (never promote a temp it
    cannot prove complete), unlock, and let the build simply re-run."""
    from cdc_cascade_spark.llm import bm25_index as bi

    idx = tmp_path / "bm25"
    idx.mkdir()
    # simulate process death mid-write: sentinel held, garbage temp
    bi._sentinel(str(idx)).write_text("compaction/rebuild in progress\n")
    partial = idx / "postings.compact" / "bucket=0"
    partial.mkdir(parents=True)
    (partial / "part-00000.parquet").write_bytes(b"NOT A PARQUET FILE")

    bi.recover_compaction(str(idx))
    assert not bi._sentinel(str(idx)).exists()
    assert not (idx / "postings.compact").exists()
    assert not (idx / "postings").exists()  # nothing was promoted

    bi.write_postings_index(spark, SF, str(idx))
    assert _rows(bi.bm25_against_index(spark, SF, str(idx)))


def test_compact_missing_path_fails_fast(spark, tmp_path):
    """Review finding r14: compacting a mistyped or never-built path
    must raise FileNotFoundError immediately — not mkdir a junk tree
    and die later inside a parquet scan."""
    import pytest

    from cdc_cascade_spark.llm.bm25_index import compact_postings_index
    from cdc_cascade_spark.llm.chunk_index import compact_chunk_index

    missing = str(tmp_path / "no_such_index")
    with pytest.raises(FileNotFoundError, match="nothing to compact"):
        compact_postings_index(spark, missing)
    with pytest.raises(FileNotFoundError, match="nothing to compact"):
        compact_chunk_index(spark, missing)
    assert not Path(missing).exists()


def test_compaction_swap_crash_rolls_forward_under_recover(
    spark, tmp_path, monkeypatch
):
    """r14 verdict finding #2: a crash BETWEEN compaction's two
    artifact swaps left new postings + OLD stats live — and
    recover_compaction's "live present → residue is stale" rule then
    deleted the complete ``stats.compact``, FINALIZING the mix. The
    BM25 scalars still summed right, but the squash-watermark advance
    was lost, so an at-least-once replay of an epoch the squash had
    already absorbed landed ABOVE the stale watermark and silently
    double-counted term frequencies. With the fsynced commit record
    around the swap pair (the rebuild protocol, shared): the crash
    state blocks reads loudly (sentinel held), recover rolls the
    commit FORWARD to the consistent new layout with the recorded
    watermark re-written, and the replayed squashed epoch is
    rejected."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    bi._write_batch(half, idx, "overwrite", -1)
    bi.append_postings_index(rest, idx, batch_id=1)
    want = _rows(bi.bm25_against_index(spark, SF, idx))

    real_swap = bi._swap_compacted
    swapped: list[str] = []

    def crashing_swap(out_path, name):
        if name == "stats":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)
        swapped.append(name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        bi.compact_postings_index(spark, idx)
    assert swapped == ["postings"]

    # the EXACT cross-artifact crash state the r14 verdict named:
    # postings swapped (live = new squash), stats not (live = old
    # deltas, COMPLETE stats.compact still beside it), commit record
    # present carrying the compaction watermark — and the sentinel
    # held, so the inconsistent mix cannot serve
    assert (Path(idx) / "stats.compact").exists()
    assert not (Path(idx) / "postings.compact").exists()
    assert bi._sentinel(idx).exists()
    assert (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert bi._commit_record_watermark(idx) == 1
    with pytest.raises(RuntimeError, match="compacted or rebuilt"):
        bi.bm25_against_index(spark, SF, idx).collect()

    # operator repair: the record rolls the swap FORWARD — never the
    # pre-fix finalized mix (which deleted stats.compact and kept the
    # old stats' watermark)
    monkeypatch.setattr(bi, "_swap_compacted", real_swap)
    bi.recover_compaction(idx)
    assert not bi._sentinel(idx).exists()
    assert not (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert not (Path(idx) / "stats.compact").exists()
    assert not (Path(idx) / "postings.compact").exists()
    # the compaction's watermark advance SURVIVED the crash (the
    # pre-fix mix silently reverted it)
    assert bi._marker_watermark(idx) == 1

    # the repaired layout serves the same rows as before the crash
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want

    # the at-least-once replay of the squashed epoch is REJECTED — the
    # silent double-count the pre-fix state allowed
    bi.append_postings_index(rest, idx, batch_id=1)
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want


def test_chunk_compaction_swap_crash_rolls_forward_too(
    spark, tmp_path, monkeypatch
):
    """The chunk twin of the cross-artifact compaction crash: the
    chunk compactor shares bm25_index's commit phase, so the same
    crash point rolls forward under recover with the watermark
    intact."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi
    from cdc_cascade_spark.llm import chunk_index as ci

    idx = str(tmp_path / "chunks")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    ci._write_batch(half, idx, "overwrite", -1)
    ci.append_chunk_index(rest, idx, batch_id=1)

    def _chunk_rows(df):
        return sorted(tuple(r) for r in df.collect())

    want = _chunk_rows(ci.chunked_against_index(spark, SF, idx))

    real_swap = bi._swap_compacted

    def crashing_swap(out_path, name):
        if name == "stats":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        ci.compact_chunk_index(spark, idx)
    assert (Path(idx) / "stats.compact").exists()
    assert bi._sentinel(idx).exists()
    assert bi._commit_record_watermark(idx) == 1

    monkeypatch.setattr(bi, "_swap_compacted", real_swap)
    bi.recover_compaction(idx)
    assert bi._marker_watermark(idx) == 1
    assert _chunk_rows(ci.chunked_against_index(spark, SF, idx)) == want
    ci.append_chunk_index(rest, idx, batch_id=1)  # squashed replay
    assert _chunk_rows(ci.chunked_against_index(spark, SF, idx)) == want


def test_failed_compaction_rolls_back_and_rerunns_cleanly(
    spark, tmp_path, monkeypatch
):
    """A compaction that FAILS before its commit record (e.g. the
    stats.compact write dies) must roll BACK: temps cleared, lock
    released, live layout byte-untouched and serving — and the
    compaction simply re-runs. (The commit-phase restructure removed
    the old unlock-always ``finally``; this pins that the rollback
    path still unlocks.)"""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bi._write_batch(docs, idx, "overwrite", -1)
    want = _rows(bi.bm25_against_index(spark, SF, idx))

    # inject the failure INSIDE the try block (well before the commit
    # record): the stats read is the first thing the compactor does
    real_stats_raw = bi._stats_raw

    def failing_stats_raw(spark_, out_path):
        raise RuntimeError("write failure (injected)")

    monkeypatch.setattr(bi, "_stats_raw", failing_stats_raw)
    with pytest.raises(RuntimeError, match="injected"):
        bi.compact_postings_index(spark, idx)
    assert not bi._sentinel(idx).exists()  # rolled back AND unlocked
    assert not (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert not (Path(idx) / "postings.compact").exists()
    assert not (Path(idx) / "stats.compact").exists()

    monkeypatch.setattr(bi, "_stats_raw", real_stats_raw)
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want
    bi.compact_postings_index(spark, idx)  # re-run compacts cleanly
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want


def test_failed_first_build_removes_created_empty_dir(
    spark, tmp_path, monkeypatch
):
    """r14 advice #3: a FAILED first-ever build used to leave the
    freshly-mkdir'd EMPTY out_path behind — which then passed the
    compactor's is_dir() fail-fast (added precisely to catch
    never-built paths) and died later inside the stats parquet scan.
    The rollback now removes the directory it created, so the
    compactor's FileNotFoundError fires as designed."""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "never_built")

    def failing_write_batch(*a, **kw):
        raise RuntimeError("build failure (injected)")

    monkeypatch.setattr(bi, "_write_batch", failing_write_batch)
    with pytest.raises(RuntimeError, match="injected"):
        bi.write_postings_index(spark, SF, idx)
    assert not Path(idx).exists()
    with pytest.raises(FileNotFoundError, match="nothing to compact"):
        bi.compact_postings_index(spark, idx)


def test_restricted_names_recover_never_consumes_commit_record(
    spark, tmp_path, monkeypatch
):
    """Second-review hardening of the r15 commit-record extension: a
    caller-restricted ``names`` (public API) repairing only ONE swap
    artifact must neither unlink the commit record (the only proof the
    other artifact's ``.compact`` is complete) nor release the
    sentinel over the still-mid-commit layout — unlocking there would
    let appends land stats deltas that the eventual full roll-forward
    would silently discard with the stats swap."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bi._write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    bi.append_postings_index(
        docs.filter(F.col("doc_id") % 2 == 1), idx, batch_id=1
    )
    want = _rows(bi.bm25_against_index(spark, SF, idx))

    real_swap = bi._swap_compacted

    def crashing_swap(out_path, name):
        if name == "stats":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        bi.compact_postings_index(spark, idx)
    monkeypatch.setattr(bi, "_swap_compacted", real_swap)

    # postings-only repair: refuses to unlock, record + sentinel stay
    with pytest.raises(RuntimeError, match="still present"):
        bi.recover_compaction(idx, names=("postings",))
    assert (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert bi._sentinel(idx).exists()
    assert (Path(idx) / "stats.compact").exists()

    # the default full-names recover finishes the committed swap
    bi.recover_compaction(idx)
    assert not (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert not bi._sentinel(idx).exists()
    assert bi._marker_watermark(idx) == 1
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want


def test_compaction_crash_recovery_advances_marker_across_cycles(
    spark, tmp_path, monkeypatch
):
    """The commit record must carry the SECOND compaction's watermark,
    not resurrect the first's: compact cleanly (marker=1), append
    epoch 2, crash the second compaction between its swaps, recover —
    the marker reads 2 and a replay of epoch 2 is rejected. Also pins
    the tail's idempotence: a crash AFTER both swaps but BEFORE the
    record unlink re-enters recover's roll-forward with no temps left
    and must still finish (marker re-written, record consumed)."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    third = docs.filter(F.col("doc_id") % 3 == 0)
    rest1 = docs.filter(F.col("doc_id") % 3 == 1)
    rest2 = docs.filter(F.col("doc_id") % 3 == 2)
    bi._write_batch(third, idx, "overwrite", -1)
    bi.append_postings_index(rest1, idx, batch_id=1)
    bi.compact_postings_index(spark, idx)
    assert bi._marker_watermark(idx) == 1

    bi.append_postings_index(rest2, idx, batch_id=2)
    want = _rows(bi.bm25_against_index(spark, SF, idx))

    real_swap = bi._swap_compacted

    def crashing_swap(out_path, name):
        if name == "stats":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        bi.compact_postings_index(spark, idx)
    monkeypatch.setattr(bi, "_swap_compacted", real_swap)
    # mid-crash, the live marker still reads the FIRST squash
    assert bi._marker_watermark(idx) == 1
    assert bi._commit_record_watermark(idx) == 2

    bi.recover_compaction(idx)
    assert bi._marker_watermark(idx) == 2  # advanced, not resurrected
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want
    bi.append_postings_index(rest2, idx, batch_id=2)  # squashed replay
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want

    # tail idempotence: crash AFTER both swaps, BEFORE the unlink —
    # simulate by re-creating the record on the healthy layout
    bi._write_commit_record(idx, f"{bi._COMPACT_PAYLOAD} 2")
    bi._sentinel(idx).write_text("compaction/rebuild in progress\n")
    bi.recover_compaction(idx)
    assert not (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert bi._marker_watermark(idx) == 2
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want


def test_random_lifecycle_walk_with_crashing_compactions(
    spark, tmp_path, monkeypatch
):
    """Composition walk for the r15 commit-record protocol: a seeded
    sequence of appends / replays / compactions in which EVERY crash
    point of a compaction fires exactly once (in seeded order, with
    random traffic between): during the temp write (the rollback path
    — auto-unlocked, watermark must NOT advance), after the temps but
    before the record (sentinel held, recover rolls BACK, no advance),
    at the postings swap, between the two swaps, and after both swaps
    before the marker write (record present — recover rolls FORWARD,
    watermark must advance exactly as a clean compaction's would).
    After every step the probe's corpus scalars, watermark, and marker
    file must match a pure-Python model in which a
    crashed-then-recovered compaction is indistinguishable from either
    a no-op (rolled back) or a clean compaction (rolled forward). The
    deterministic tests pin each crash point once; this pins their
    COMPOSITIONS across cycles (crash, recover, append, crash again at
    a different point, replay a squashed epoch, ...).

    r15 verdict #7 extension: at the INSTANT each crash point fires —
    sentinel held, layout frozen mid-commit — a probe AND an append
    each run from separate threads, and the walk pins that both
    observe the NAMED sentinel raise (never a stale/mixed read, never
    a landed write, never a leaked claim); after every recover, a
    threaded probe must see exactly the model state."""
    import random
    import threading

    from cdc_cascade_spark.llm import bm25_index as bi

    rng = random.Random(20260816)

    def batch(ids):
        return spark.createDataFrame(
            [(i, f"tok{i % 5} tok{(i * 3) % 7} common") for i in ids],
            "doc_id long, text string",
        )

    idx = str(tmp_path / "crashwalk")
    bi._write_batch(batch(range(0, 4)), idx, "overwrite", -1)
    live = set(range(0, 4))
    appended: dict[int, list[int]] = {}
    wm = -1
    next_doc = 4
    qterms = spark.createDataFrame(
        [(0, "common"), (1, "tok1"), (2, "tok3")], "qid long, term string"
    )
    real_swap = bi._swap_compacted
    real_marker = bi._write_watermark_marker
    real_commit = bi._commit_compaction_swap

    def check():
        got = {
            r.doc_id
            for r in bi.probe_postings_index(spark, qterms, idx)
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert got <= live, (got - live, "probe surfaced a dead doc")
        n_docs, _sum_dl, got_wm = bi._stats_summary(spark, idx)
        assert n_docs == len(live)
        assert got_wm == wm
        # marker agrees with the authoritative stats watermark (-1 ⇒
        # marker may be absent; after any recovered compaction the
        # marker must carry the recorded value)
        assert bi._marker_watermark(idx) == wm

    real_stats_raw = bi._stats_raw
    crash_points = [
        "during_temp_write",  # inside the try → rollback, auto-unlock
        "before_record",      # temps done, record not written yet
        "postings_swap",
        "stats_swap",
        "before_marker",
    ]

    def probe_in_thread():
        """Run a probe from a SEPARATE thread and report what it saw:
        {'docs': set} for a served read, {'raise': msg} for a refusal.
        Concurrency is the point — the mid-commit refusal must not
        depend on being on the compactor's own thread."""
        out: dict = {}

        def run():
            try:
                rows = (
                    bi.probe_postings_index(spark, qterms, idx)
                    .select("doc_id")
                    .distinct()
                    .collect()
                )
                out["docs"] = {r.doc_id for r in rows}
            except Exception as e:  # noqa: BLE001 — observation, not control
                out["raise"] = str(e)

        t = threading.Thread(target=run)
        t.start()
        t.join(120)
        assert not t.is_alive(), "concurrent probe thread hung"
        return out

    def append_in_thread():
        """Attempt an append from a separate thread; report the raise
        (or that it landed). A mid-commit append must refuse at its
        sentinel check AND release its claim on the way out — a leaked
        claim would block the eventual recover."""
        out: dict = {}

        def run():
            try:
                bi.append_postings_index(
                    batch([next_doc + 10_000]), idx, batch_id=wm + 10_000
                )
                out["landed"] = True
            except Exception as e:  # noqa: BLE001 — observation
                out["raise"] = str(e)

        t = threading.Thread(target=run)
        t.start()
        t.join(120)
        assert not t.is_alive(), "concurrent append thread hung"
        return out

    def crashing_compact(point):
        # at the crash instant — BEFORE the injected error unwinds the
        # compactor, with the sentinel held and the layout frozen at
        # this exact mid-commit state — a concurrent probe must see
        # the named sentinel raise (never a stale or mixed read), a
        # concurrent append must refuse at its sentinel check without
        # leaking its claim, and neither may write anything
        seen_at_crash: dict = {}
        append_at_crash: dict = {}

        def observe_then_crash():
            seen_at_crash.update(probe_in_thread())
            append_at_crash.update(append_in_thread())
            raise RuntimeError("crash (injected)")

        if point == "during_temp_write":
            def crash_stats_raw(spark_, out_path):
                observe_then_crash()
            monkeypatch.setattr(bi, "_stats_raw", crash_stats_raw)
        elif point == "before_record":
            def no_commit(out_path, new_wm):
                observe_then_crash()
            monkeypatch.setattr(bi, "_commit_compaction_swap", no_commit)
        elif point in ("postings_swap", "stats_swap"):
            target = "postings" if point == "postings_swap" else "stats"
            def crash_swap(out_path, name):
                if name == target:
                    observe_then_crash()
                real_swap(out_path, name)
            monkeypatch.setattr(bi, "_swap_compacted", crash_swap)
        elif point == "before_marker":
            def crash_marker(out_path, new_wm):
                observe_then_crash()
            monkeypatch.setattr(bi, "_write_watermark_marker", crash_marker)
        import pytest as _pytest

        try:
            with _pytest.raises(RuntimeError, match="injected"):
                bi.compact_postings_index(spark, idx)
        finally:
            monkeypatch.setattr(bi, "_stats_raw", real_stats_raw)
            monkeypatch.setattr(bi, "_swap_compacted", real_swap)
            monkeypatch.setattr(bi, "_write_watermark_marker", real_marker)
            monkeypatch.setattr(bi, "_commit_compaction_swap", real_commit)
        # every crash point fires under the held sentinel (the lock is
        # taken before the temp write), so the concurrent observation
        # must be the refusal — a {'docs': ...} here would mean a read
        # was SERVED against a frozen mid-commit layout
        assert "raise" in seen_at_crash, (point, seen_at_crash)
        assert "compacted or rebuilt" in seen_at_crash["raise"], (
            point,
            seen_at_crash,
        )
        # the concurrent append refused at its sentinel check and its
        # claim was released on the raise path (_append_guard finally)
        assert "compacted or rebuilt" in append_at_crash.get("raise", ""), (
            point,
            append_at_crash,
        )
        assert bi._live_append_claims(idx) == [], (
            point,
            "mid-commit append leaked a claim",
        )
        if point == "during_temp_write":
            # the rollback path: temps cleared AND auto-unlocked
            assert not bi._sentinel(idx).exists()
            assert not Path(f"{idx}/postings.compact").exists()
            return False  # watermark did NOT advance
        # every commit-phase crash keeps the sentinel: reads refuse
        # loudly until the operator recovers — from a separate thread
        # too (the crashed run is GONE now, unlike the mid-commit
        # observation above)
        assert bi._sentinel(idx).exists()
        with _pytest.raises(RuntimeError, match="compacted or rebuilt"):
            bi.bm25_against_index(spark, SF, idx).collect()
        crashed_seen = probe_in_thread()
        assert "compacted or rebuilt" in crashed_seen.get("raise", ""), (
            point,
            crashed_seen,
        )
        bi.recover_compaction(idx)
        assert not bi._sentinel(idx).exists()
        # post-recover, a threaded probe serves exactly the live set
        recovered_seen = probe_in_thread()
        assert recovered_seen.get("docs", set()) <= live, (
            point,
            recovered_seen,
        )
        if point == "before_record":
            # no record → recover rolled BACK (temps cleared)
            assert not Path(f"{idx}/postings.compact").exists()
            return False
        return True  # record present → roll-forward: wm advanced

    # every crash point fires exactly once, in a seeded order, with
    # random append/replay/compact traffic between — so the walk
    # composes ALL of them across cycles rather than sampling a few
    forced = list(crash_points)
    rng.shuffle(forced)
    crash_steps = dict(zip(range(2, 3 * len(forced) + 2, 3), forced))
    for step in range(3 * len(forced) + 2):
        if step in crash_steps:
            advanced = crashing_compact(crash_steps[step])
            if advanced and appended:
                wm = max(max(appended), wm)
            check()
            continue
        op = rng.choice(["append", "append", "replay", "compact"])
        if op == "append":
            epoch = max(max(appended, default=-1), wm) + 1
            ids = list(range(next_doc, next_doc + rng.randint(1, 3)))
            next_doc += len(ids)
            bi.append_postings_index(batch(ids), idx, batch_id=epoch)
            appended[epoch] = ids
            live |= set(ids)
        elif op == "replay" and appended:
            epoch = rng.choice(sorted(appended))
            bi.append_postings_index(
                batch(appended[epoch]), idx, batch_id=epoch
            )
            # model: dedup or watermark rejects it — no change
        elif op == "compact":
            bi.compact_postings_index(spark, idx)
            if appended:
                wm = max(max(appended), wm)
        check()


def test_torn_commit_record_refuses_recovery(spark, tmp_path):
    """r15 verdict #1: a commit-record payload that fails to parse used
    to silently decode as the REBUILD form, so recover unlinked the
    squash-watermark marker — the lost-watermark → replayed-squashed-
    epoch double-count the record exists to prevent. The parser now
    enforces a strict grammar with the terminating newline as the
    torn-write sentinel and recover REFUSES (named error, layout and
    marker byte-untouched) on anything else. The nastiest tear —
    ``compact 12\\n`` losing its tail to ``compact 1`` — would parse
    as a VALID record with the WRONG watermark without the newline
    requirement; pinned explicitly."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bi._write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    bi.append_postings_index(
        docs.filter(F.col("doc_id") % 2 == 1), idx, batch_id=1
    )
    bi.compact_postings_index(spark, idx)
    assert bi._marker_watermark(idx) == 1
    bi.append_postings_index(
        docs.filter(F.col("doc_id") % 2 == 1), idx, batch_id=2
    )
    want = _rows(bi.bm25_against_index(spark, SF, idx))

    record = Path(idx) / bi._REBUILD_COMMIT
    for torn in (
        b"compac",            # prefix tear inside the token
        b"compact 1",         # 'compact 12\n' torn — would be VALID+WRONG
        b"rebuil",            # rebuild form torn
        b"compact xyz\n",     # newline intact, non-integer watermark
        b"garbage payload\n", # newline intact, unknown grammar
        b"\x00" * 16,         # NUL-filled journal block
    ):
        record.write_bytes(torn)
        bi._sentinel(idx).write_text("compaction/rebuild in progress\n")
        with pytest.raises(bi.TornCommitRecordError):
            bi.recover_compaction(idx)
        # the refusal changed NOTHING: record, sentinel, marker intact
        assert record.read_bytes() == torn
        assert bi._sentinel(idx).exists()
        assert bi._marker_watermark(idx) == 1

    # the documented operator remediation: no .old artifacts exist, so
    # remove the record and re-run — recover proceeds and unlocks
    record.unlink()
    assert not list(Path(idx).glob("*.old"))
    bi.recover_compaction(idx)
    assert not bi._sentinel(idx).exists()
    assert bi._marker_watermark(idx) == 1  # marker never lost
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want
    # the squashed epoch's replay is still rejected (the double-count
    # the pre-fix rebuild-default silently allowed)
    bi.append_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), idx, batch_id=1
    )
    assert _rows(bi.bm25_against_index(spark, SF, idx)) == want


def test_legacy_rebuild_payload_still_recovers(spark, tmp_path):
    """One-round upgrade window: a layout that crashed mid-rebuild-swap
    under the pre-r16 writer carries the legacy prose payload — the
    strict parser must still decode it as the rebuild form (marker
    unlinked, fresh lineage), not refuse it as torn."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bi._write_batch(docs, idx, "overwrite", -1)
    bi._write_watermark_marker(idx, 7)
    bi._write_commit_record(idx, bi._LEGACY_REBUILD_PAYLOAD)
    bi._sentinel(idx).write_text("compaction/rebuild in progress\n")
    assert bi._commit_record_watermark(idx) is None  # rebuild form
    bi.recover_compaction(idx)
    assert not (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert not bi._sentinel(idx).exists()
    assert bi._marker_watermark(idx) == -1  # fresh lineage: unlinked


def test_refused_restricted_recover_sweeps_no_claims(
    spark, tmp_path, monkeypatch
):
    """r15 verdict #2: the restricted-``names`` refusal used to fire
    AFTER the claim sweep, so a refused recover had already unlinked
    the crashed writer's claims. The check now runs first: a refused
    recover changes nothing — the claims are still on disk for the
    full-names re-run to sweep."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi

    idx = str(tmp_path / "bm25")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bi._write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    bi.append_postings_index(
        docs.filter(F.col("doc_id") % 2 == 1), idx, batch_id=1
    )

    real_swap = bi._swap_compacted

    def crashing_swap(out_path, name):
        if name == "stats":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        bi.compact_postings_index(spark, idx)
    monkeypatch.setattr(bi, "_swap_compacted", real_swap)

    # a crashed writer's claim, aged past the fresh-claim threshold
    claim = Path(idx) / f"{bi._APPEND_CLAIM_PREFIX}deadbeef"
    claim.write_text("append in progress\n")
    aged = time.time() - 300
    os.utime(claim, (aged, aged))

    with pytest.raises(RuntimeError, match="still present"):
        bi.recover_compaction(idx, names=("postings",))
    assert claim.exists()  # pre-fix: already swept before the raise
    assert (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert bi._sentinel(idx).exists()

    bi.recover_compaction(idx)  # full-names run finishes + sweeps
    assert not claim.exists()
    assert not bi._sentinel(idx).exists()
    assert bi._marker_watermark(idx) == 1


def test_append_claim_retries_when_out_path_vanishes(tmp_path, monkeypatch):
    """r15 advice #2: a failed first-ever rebuild's rollback rmdirs the
    empty out_path it created; an append racing into the window between
    its own mkdir and its claim ``open('x')`` used to die with a raw
    FileNotFoundError. The claim acquire now re-mkdirs and retries, so
    the append proceeds against a fresh empty layout (its epoch replays
    cleanly either way)."""
    import builtins

    from cdc_cascade_spark.llm import bm25_index as bi

    idx = tmp_path / "racy"
    real_open = builtins.open
    raced = {"done": False}

    def racing_open(file, *args, **kwargs):
        mode = args[0] if args else kwargs.get("mode", "r")
        if (
            not raced["done"]
            and "x" in mode
            and str(file).startswith(str(idx / bi._APPEND_CLAIM_PREFIX))
        ):
            # the racing rollback removes the dir AFTER our mkdir and
            # BEFORE the claim create — the real open then raises the
            # organic FileNotFoundError
            raced["done"] = True
            os.rmdir(idx)
        return real_open(file, *args, **kwargs)

    monkeypatch.setattr(builtins, "open", racing_open)
    claim = bi._acquire_append_claim(str(idx))
    assert raced["done"]
    assert claim.exists()
    claim.unlink()


def test_every_proper_prefix_of_a_valid_record_refuses(tmp_path):
    """Exhaustive torn-write sweep: for every payload the two writers
    can produce (and the legacy prose form), the FULL record parses to
    exactly the writer's intent, and EVERY proper byte-prefix — every
    possible suffix-losing tear, including the empty file — refuses
    with the named error. This is the complete tear space: the payload
    is written in one ``write()`` and fsynced before any rename, so a
    tear can only lose a suffix."""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi

    out = tmp_path / "idx"
    out.mkdir()
    rec = out / bi._REBUILD_COMMIT
    cases = [
        (bi._REBUILD_PAYLOAD, None),
        (bi._LEGACY_REBUILD_PAYLOAD, None),
        ("rebuild features,bands", None),   # pair-qualified rebuild
        ("rebuild postings,stats", None),   # the r17 default-writer form
        ("compact 0", 0),
        ("compact 7", 7),
        ("compact 12", 12),
        ("compact 987654321", 987654321),
        ("compact -1", -1),  # a first-ever squash can record wm=-1
    ]
    for payload, want in cases:
        full = (payload + "\n").encode()
        rec.write_bytes(full)
        got = bi._commit_record_watermark(str(out))
        assert (got is None) if want is None else got == want, (payload, got)
        for i in range(len(full)):
            rec.write_bytes(full[:i])
            with pytest.raises(bi.TornCommitRecordError):
                bi._commit_record_watermark(str(out))
    # invalid UTF-8 refuses with the SAME named error, never a leaked
    # UnicodeDecodeError
    rec.write_bytes(b"compact \xff\xfe\n")
    with pytest.raises(bi.TornCommitRecordError, match="UTF-8"):
        bi._commit_record_watermark(str(out))
    rec.unlink()
    assert bi._commit_record_watermark(str(out)) is None  # no record


def test_commit_record_parser_matches_grammar_model(tmp_path):
    """Differential fuzz of the strict parser against an independent
    restatement of the grammar: for arbitrary unicode payloads (with
    and without the terminator) the parser must return exactly what
    the grammar says or raise exactly when the grammar says refuse —
    no third behavior (wrong value, silent rebuild default, leaked
    non-named exception)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from cdc_cascade_spark.llm import bm25_index as bi

    out = tmp_path / "idx"
    out.mkdir()
    rec = out / bi._REBUILD_COMMIT

    import re as _re

    def grammar(raw: str):
        """(kind, value): the spec, restated independently."""
        if not raw.endswith("\n"):
            return ("refuse", None)
        text = raw.strip()
        if text in (bi._REBUILD_PAYLOAD, bi._LEGACY_REBUILD_PAYLOAD):
            return ("rebuild", None)
        parts = text.split()
        if (
            len(parts) == 2
            and parts[0] == bi._REBUILD_PAYLOAD
            and _re.match(r"^[a-z_]+(,[a-z_]+)+$", parts[1])
        ):
            return ("rebuild", None)  # pair-qualified rebuild form
        if len(parts) == 2 and parts[0] == bi._COMPACT_PAYLOAD:
            # anchored ASCII digits, NOT bare int() (r16 ADVICE low:
            # int() leniencies — underscores, '+', unicode digits —
            # would let a corrupt payload parse as valid with the
            # wrong watermark; restating int() here would blind the
            # fuzz to exactly that class)
            if _re.fullmatch(r"-?[0-9]+", parts[1]):
                return ("compact", int(parts[1]))
            return ("refuse", None)
        return ("refuse", None)

    payloads = st.one_of(
        st.text(max_size=40),
        st.from_regex(r"compact -?[0-9]{1,12}", fullmatch=True),
        st.sampled_from(
            [bi._REBUILD_PAYLOAD, bi._LEGACY_REBUILD_PAYLOAD, "compact",
             "compact 1 2", "COMPACT 5", "rebuild extra",
             "rebuild features,bands", "rebuild postings,stats",
             "rebuild features,", "rebuild ,x", "rebuild a,b extra",
             # int() leniencies the anchored grammar must refuse
             "compact 1_0", "compact +5", "compact １２",
             "compact ١٢", "compact - 1", "compact --1"]
        ),
    )

    @settings(
        max_examples=200,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(payloads, st.booleans())
    def run(payload, terminated):
        raw = payload + ("\n" if terminated else "")
        rec.write_bytes(raw.encode())
        kind, value = grammar(raw)
        if kind == "refuse":
            try:
                bi._commit_record_watermark(str(out))
            except bi.TornCommitRecordError:
                pass
            else:
                raise AssertionError(f"parser accepted {raw!r}")
        else:
            got = bi._commit_record_watermark(str(out))
            if kind == "rebuild":
                assert got is None, (raw, got)
            else:
                assert got == value, (raw, got, value)

    run()


def test_stats_collect_guard_warns_when_compaction_overdue(
    spark, tmp_path, monkeypatch
):
    """_stats_summary's driver collect is bounded only by the
    compaction cadence; past _STATS_COLLECT_WARN_ROWS delta rows the
    probe must warn (compaction overdue) while still returning the
    exact scalars (r18-opt guard; r17 ADVICE #4)."""
    import warnings

    import cdc_cascade_spark.llm.bm25_index as bi

    idx = str(tmp_path / "bm25")
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    bi._write_batch(docs, idx, "overwrite", bi.BUILD_BATCH_ID)
    more = spark.createDataFrame([(3, "alpha")], "doc_id long, text string")
    bi.append_postings_index(more, idx, batch_id=0)
    bi.append_postings_index(
        spark.createDataFrame([(4, "beta")], "doc_id long, text string"),
        idx,
        batch_id=1,
    )
    # 3 delta rows (build + 2 epochs); no warning at the real threshold
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        n_docs, sum_dl, wm = bi._stats_summary(spark, idx)
    assert (n_docs, wm) == (4, -1)

    # lower the threshold below the live row count: the guard must
    # fire AND the scalars must be unchanged
    monkeypatch.setattr(bi, "_STATS_COLLECT_WARN_ROWS", 2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        n2, s2, w2 = bi._stats_summary(spark, idx)
    assert (n2, s2, w2) == (n_docs, sum_dl, wm)
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "compaction is overdue" in str(w.message)
        for w in caught
    )
