"""Persistent chunk-postings index (llm/chunk_index.py): probe ≡ the
ad-hoc chunked face, append ≡ rebuild, bucket partition pruning, and
the empty-index guard."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted((r.qid, r.doc_id, r.best_ppb, r.rank) for r in df.collect())


def test_index_probe_matches_direct(spark, tmp_path):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.chunk_index import (
        chunked_against_index,
        write_chunk_index,
    )
    from cdc_cascade_spark.llm.chunkeval import chunked_topk_frame

    idx = str(tmp_path / "cidx")
    write_chunk_index(spark, SF, idx)
    got = _rows(chunked_against_index(spark, SF, idx))
    want = _rows(chunked_topk_frame(load_table(spark, SF, "documents")))
    assert got == want and got


def test_index_append_equals_rebuild(spark, tmp_path):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.chunk_index import (
        _write_batch,
        append_chunk_index,
        chunked_against_index,
        write_chunk_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    full = str(tmp_path / "full")
    write_chunk_index(spark, SF, full)

    inc = str(tmp_path / "inc")
    _write_batch(docs.filter(F.col("doc_id") % 2 == 0), inc, "overwrite", -1)
    append_chunk_index(docs.filter(F.col("doc_id") % 2 == 1), inc, batch_id=1)

    got = _rows(chunked_against_index(spark, SF, inc))
    want = _rows(chunked_against_index(spark, SF, full))
    assert got == want and got
    # mergeable stats deltas sum to the full-corpus chunk scalars
    f = spark.read.parquet(f"{full}/stats").agg(
        F.sum("n_docs"), F.sum("sum_dl")
    ).collect()[0]
    i = spark.read.parquet(f"{inc}/stats").agg(
        F.sum("n_docs"), F.sum("sum_dl")
    ).collect()[0]
    assert tuple(f) == tuple(i)
    assert spark.read.parquet(f"{inc}/stats").count() == 2


def test_probe_partition_prunes_to_query_buckets(spark, tmp_path):
    from cdc_cascade_spark.functions.hashing import token_hash
    from cdc_cascade_spark.llm.chunk_index import (
        N_BUCKETS,
        _write_batch,
        probe_chunk_index,
    )
    from cdc_cascade_spark.plans.explain import physical_plan

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{(i * 7 + j) % 200}" for j in range(40)))
         for i in range(300)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "cidx")
    _write_batch(docs, idx, "overwrite", -1)

    qterms = spark.createDataFrame(
        [(0, "tok0"), (0, "tok7"), (1, "tok14")], "qid long, term string"
    )
    df = probe_chunk_index(spark, qterms, idx)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan and "bucket" in plan, plan[:2000]
    assert df.count() > 0
    probed = {
        int(r.bucket)
        for r in qterms.select(
            F.pmod(token_hash(F.col("term")), F.lit(N_BUCKETS))
            .cast("int")
            .alias("bucket")
        ).collect()
    }
    assert len(probed) < N_BUCKETS  # pruning is real, not vacuous


def test_empty_index_and_empty_workload_guards(spark, tmp_path):
    from cdc_cascade_spark.llm.chunk_index import (
        _write_batch,
        probe_chunk_index,
    )

    # all-empty-documents corpus: chunks exist (one zero-length chunk
    # per doc) but there are NO postings part files — the sum_dl gate
    # must short-circuit instead of failing schema inference
    docs = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string"
    )
    idx = str(tmp_path / "cidx")
    _write_batch(docs, idx, "overwrite", -1)
    qterms = spark.createDataFrame([(0, "tok0")], "qid long, term string")
    out = probe_chunk_index(spark, qterms, idx)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "qid", "doc_id", "best_ppb", "rank",
    ]
    # empty workload against a real index
    real = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    idx2 = str(tmp_path / "cidx2")
    _write_batch(real, idx2, "overwrite", -1)
    empty_q = qterms.filter(F.lit(False))
    assert probe_chunk_index(spark, empty_q, idx2).count() == 0


def test_compaction_is_probe_invisible_and_shrinks_files(spark, tmp_path):
    import glob

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.chunk_index import (
        _write_batch,
        append_chunk_index,
        chunked_against_index,
        compact_chunk_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "cidx")
    # 4 appended slices → 4 file groups per touched bucket, 4 stats rows
    _write_batch(docs.filter(F.col("doc_id") % 4 == 0), idx, "overwrite", -1)
    for k in (1, 2, 3):
        append_chunk_index(docs.filter(F.col("doc_id") % 4 == k), idx, batch_id=k)
    before = _rows(chunked_against_index(spark, SF, idx))
    n_files_before = len(glob.glob(f"{idx}/postings/bucket=*/part-*"))
    assert spark.read.parquet(f"{idx}/stats").count() == 4

    compact_chunk_index(spark, idx)

    assert _rows(chunked_against_index(spark, SF, idx)) == before and before
    n_files_after = len(glob.glob(f"{idx}/postings/bucket=*/part-*"))
    assert n_files_after < n_files_before
    assert spark.read.parquet(f"{idx}/stats").count() == 1


def test_probe_answers_arbitrary_workloads(spark, tmp_path):
    """Bucket pruning must never LOSE postings: for a workload the
    index has never seen (multi-query, terms spanning several buckets,
    one term absent from the corpus, one query that is all-absent),
    the pruned probe must equal scoring the FULL unpruned postings
    relation through the same scorer."""
    from cdc_cascade_spark.llm.chunk_index import (
        _chunk_postings_frame,
        _write_batch,
        probe_chunk_index,
    )
    from cdc_cascade_spark.llm.chunkeval import chunk_topk_from_postings

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{(i * 11 + j) % 60}" for j in range(50)))
         for i in range(120)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "cidx")
    _write_batch(docs, idx, "overwrite", -1)

    qterms = spark.createDataFrame(
        [(7, "tok1"), (7, "tok2"), (7, "ghost-term"),
         (8, "tok30"), (8, "tok59"),
         (9, "never-a"), (9, "never-b")],  # all-absent query
        "qid long, term string",
    )
    got = sorted(
        tuple(r) for r in probe_chunk_index(spark, qterms, idx).collect()
    )

    full = _chunk_postings_frame(docs).join(
        qterms.select("term").distinct(), "term"
    ).select("doc_id", "chunk_id", "dl", "term", "tf")
    stats = spark.read.parquet(f"{idx}/stats")
    want = sorted(
        tuple(r)
        for r in chunk_topk_from_postings(full, qterms, stats).collect()
    )
    assert got == want and got
    qids = {r[0] for r in got}
    assert 7 in qids and 8 in qids  # partial-hit queries answered
    assert 9 not in qids  # all-absent query returns no rows


def test_chunk_replayed_batch_is_invisible(spark, tmp_path):
    """The bm25_index replay discipline over the chunk schema: a
    replayed append under the same batch_id changes nothing a probe
    observes, and compaction squashes the residue."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.chunk_index import (
        _write_batch,
        append_chunk_index,
        chunked_against_index,
        compact_chunk_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "chunkidx")
    _write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    append_chunk_index(odd, idx, batch_id=3)
    want = _rows(chunked_against_index(spark, SF, idx))

    append_chunk_index(odd, idx, batch_id=3)  # replay

    assert _rows(chunked_against_index(spark, SF, idx)) == want and want
    assert spark.read.parquet(f"{idx}/stats").count() == 3
    compact_chunk_index(spark, idx)
    assert _rows(chunked_against_index(spark, SF, idx)) == want
    assert spark.read.parquet(f"{idx}/stats").count() == 1


def test_chunk_streaming_ingest_converges_to_batch_build(spark, tmp_path):
    """File-stream the corpus into the chunk index as micro-batches;
    the probe must answer identically to the one-shot build — the
    production RAG ingest lifecycle."""
    import glob

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.chunk_index import (
        chunked_against_index,
        start_chunk_ingest_stream,
        write_chunk_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    src = str(tmp_path / "doc_stream")
    docs.withColumn("slice", F.pmod(F.col("doc_id"), F.lit(3))).repartition(
        3, "slice"
    ).drop("slice").write.mode("overwrite").parquet(src)

    inc = str(tmp_path / "inc")
    q = start_chunk_ingest_stream(spark, src, inc, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "full")
    write_chunk_index(spark, SF, full)
    got = _rows(chunked_against_index(spark, SF, inc))
    want = _rows(chunked_against_index(spark, SF, full))
    assert got == want and got
    # one mergeable stats row per non-empty micro-batch
    import pyarrow.parquet as pq

    n_nonempty = sum(
        1 for f in glob.glob(f"{src}/part-*.parquet")
        if pq.ParquetFile(f).metadata.num_rows > 0
    )
    assert 1 < spark.read.parquet(f"{inc}/stats").count() == n_nonempty


def test_chunk_lock_and_squash_watermark(spark, tmp_path):
    """The bm25_index operational contract applies to the chunk layout
    verbatim: the _COMPACTING sentinel blocks appends/probes, and an
    epoch replayed after its compaction squash is skipped by the append
    guard and invisible to the read side (r11 advice #2 / verdict #5)."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bm25_index import (
        _acquire_compaction_lock,
        recover_compaction,
    )
    from cdc_cascade_spark.llm.chunk_index import (
        _write_batch,
        append_chunk_index,
        chunked_against_index,
        compact_chunk_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "chunks")
    _write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    append_chunk_index(odd, idx, batch_id=5)
    want = _rows(chunked_against_index(spark, SF, idx))

    _acquire_compaction_lock(idx)
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        append_chunk_index(odd, idx, batch_id=6)
    with pytest.raises(RuntimeError, match="_COMPACTING"):
        chunked_against_index(spark, SF, idx)
    recover_compaction(idx)

    compact_chunk_index(spark, idx)  # squash; watermark = 5
    s = spark.read.parquet(f"{idx}/stats").collect()
    assert len(s) == 1 and s[0].squashed_through == 5

    # replayed squashed epoch: append skips; probe unchanged
    append_chunk_index(odd, idx, batch_id=5)
    assert spark.read.parquet(f"{idx}/stats").count() == 1
    assert _rows(chunked_against_index(spark, SF, idx)) == want and want
    # a raced replay that bypassed the guard is read-side invisible
    _write_batch(odd, idx, "append", 5)
    assert _rows(chunked_against_index(spark, SF, idx)) == want
