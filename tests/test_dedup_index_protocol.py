"""MinHash dedup index maintenance protocol (r16): the fifth index
lifecycle adopts bm25_index's claim/sentinel exclusion and crash-safe
commit-record swap, with probe-side replay immunity.

Pre-r16, `write_minhash_index` was two bare overwrite writes (a crash
between them served a mixed features/bands index silently), appends had
no writer claim, and a replayed append duplicated probe result rows.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _load(spark):
    from cdc_cascade_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    return (
        docs.filter("doc_id % 5 IN (1, 2)"),
        docs.filter("doc_id % 5 IN (3, 4)"),
        docs.filter("doc_id % 5 = 0"),
    )


def _probe_rows(spark, batch, idx):
    from cdc_cascade_spark.llm.dedup_index import dedup_against_index

    return sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_against_index(batch, spark, idx).collect()
    )


def test_replayed_append_leaves_probe_rows_identical(spark, tmp_path):
    """An at-least-once replay of an append batch lands byte-duplicate
    rows on disk (O(batch) parquet append by design) — the probe must
    return the EXACT same row multiset as before the replay: same
    pairs, same jaccards, and crucially no duplicated result rows (the
    pre-fix probe multiplied verified pairs by the replay count). A
    rebuild — this index's compaction — then squashes the disk
    duplicates away."""
    from cdc_cascade_spark.llm.dedup_index import (
        append_minhash_index,
        write_minhash_index,
    )

    day1, day2, batch = _load(spark)
    idx = str(tmp_path / "mh")
    write_minhash_index(day1, idx)
    append_minhash_index(day2, idx)
    want = _probe_rows(spark, batch, idx)
    assert want, "expected cross near-dup pairs"

    append_minhash_index(day2, idx)  # the at-least-once replay
    assert _probe_rows(spark, batch, idx) == want
    append_minhash_index(day2, idx)  # and again
    assert _probe_rows(spark, batch, idx) == want

    # rows really are duplicated on disk (the probe immunity is doing
    # work, not the append silently deduping)
    n_feat = spark.read.parquet(f"{idx}/features").count()
    day1_n = day1.count()
    day2_n = day2.count()
    assert n_feat == day1_n + 3 * day2_n

    # rebuild over the union squashes the duplicates
    write_minhash_index(day1.unionByName(day2), idx)
    assert spark.read.parquet(f"{idx}/features").count() == day1_n + day2_n
    assert _probe_rows(spark, batch, idx) == want


def test_failed_rebuild_leaves_old_minhash_index_serving(
    spark, tmp_path, monkeypatch
):
    """A rebuild that fails while writing its temps rolls BACK: temps
    cleared, lock released, the old index byte-untouched and serving —
    and the rebuild simply re-runs. (The pre-r16 overwrite form had
    already destroyed the live features at this point.)"""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi
    from cdc_cascade_spark.llm import dedup_index as di

    day1, day2, batch = _load(spark)
    idx = str(tmp_path / "mh")
    di.write_minhash_index(day1, idx)
    want = _probe_rows(spark, batch, idx)

    real_bands = di._batch_bands

    def failing_bands(features):
        raise RuntimeError("bands write failure (injected)")

    monkeypatch.setattr(di, "_batch_bands", failing_bands)
    with pytest.raises(RuntimeError, match="injected"):
        di.write_minhash_index(day1.unionByName(day2), idx)
    monkeypatch.setattr(di, "_batch_bands", real_bands)

    assert not bi._sentinel(idx).exists()  # rolled back AND unlocked
    assert not Path(f"{idx}/features.compact").exists()
    assert not Path(f"{idx}/bands.compact").exists()
    assert _probe_rows(spark, batch, idx) == want  # old index serving

    di.write_minhash_index(day1.unionByName(day2), idx)  # re-run clean
    assert len(_probe_rows(spark, batch, idx)) >= len(want)


def test_crashed_rebuild_swap_rolls_forward_under_recover(
    spark, tmp_path, monkeypatch
):
    """A crash BETWEEN the features and bands swap renames leaves the
    sentinel held (probes refuse loudly — never a mixed new-features/
    old-bands read) and the pair-qualified commit record rolls the
    swap FORWARD under recover_minhash_index to the consistent NEW
    index."""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi
    from cdc_cascade_spark.llm import dedup_index as di

    day1, day2, batch = _load(spark)
    idx = str(tmp_path / "mh")
    di.write_minhash_index(day1, idx)

    # the rebuild target: union index — compute its expected answer on
    # a scratch path first
    scratch = str(tmp_path / "scratch")
    di.write_minhash_index(day1.unionByName(day2), scratch)
    want_new = _probe_rows(spark, batch, scratch)

    real_swap = bi._swap_compacted

    def crashing_swap(out_path, name):
        if name == "bands":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        di.write_minhash_index(day1.unionByName(day2), idx)
    monkeypatch.setattr(bi, "_swap_compacted", real_swap)

    # the frozen mid-commit state: features swapped, bands not, the
    # record carrying this layout's pair, sentinel held
    assert (Path(idx) / "bands.compact").exists()
    assert not (Path(idx) / "features.compact").exists()
    assert bi._sentinel(idx).exists()
    assert bi._commit_record_pair(idx) == ("features", "bands")
    with pytest.raises(RuntimeError, match="compacted or rebuilt"):
        _probe_rows(spark, batch, idx)

    di.recover_minhash_index(idx)
    assert not bi._sentinel(idx).exists()
    assert not (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert _probe_rows(spark, batch, idx) == want_new


def test_default_pair_recover_refuses_on_minhash_record(
    spark, tmp_path, monkeypatch
):
    """A recover mis-invoked with the bm25 DEFAULT names against a
    mid-commit MinHash layout must refuse — the record's own pairspec
    outranks the caller's hint, so the record (the only proof
    bands.compact is complete) survives, the sentinel stays, and the
    correct recover entry then finishes the swap. Pre-guard, the
    default-names call consumed the record without promoting either
    artifact and unlocked the mixed layout."""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi
    from cdc_cascade_spark.llm import dedup_index as di

    day1, day2, batch = _load(spark)
    idx = str(tmp_path / "mh")
    di.write_minhash_index(day1, idx)

    real_swap = bi._swap_compacted

    def crashing_swap(out_path, name):
        if name == "bands":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        di.write_minhash_index(day1.unionByName(day2), idx)
    monkeypatch.setattr(bi, "_swap_compacted", real_swap)

    with pytest.raises(RuntimeError, match="features.*bands"):
        bi.recover_compaction(idx)  # bm25 defaults — wrong layout
    assert (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert bi._sentinel(idx).exists()
    assert (Path(idx) / "bands.compact").exists()

    di.recover_minhash_index(idx)  # the right entry finishes the swap
    assert not bi._sentinel(idx).exists()
    assert _probe_rows(spark, batch, idx)


def test_minhash_two_flag_exclusion(spark, tmp_path):
    """The two-flag protocol covers this layout: an append refuses
    under a held sentinel (claim released on the way out), and a
    rebuild refuses while a writer claim is live."""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi
    from cdc_cascade_spark.llm import dedup_index as di

    day1, day2, _batch = _load(spark)
    idx = str(tmp_path / "mh")
    di.write_minhash_index(day1, idx)

    bi._sentinel(idx).write_text("compaction/rebuild in progress\n")
    with pytest.raises(RuntimeError, match="compacted or rebuilt"):
        di.append_minhash_index(day2, idx)
    assert bi._live_append_claims(idx) == []  # claim not leaked
    bi._sentinel(idx).unlink()

    claim = Path(idx) / f"{bi._APPEND_CLAIM_PREFIX}live"
    claim.write_text("append in progress\n")
    with pytest.raises(RuntimeError, match="appends in flight"):
        di.write_minhash_index(day1.unionByName(day2), idx)
    assert not bi._sentinel(idx).exists()  # refusal never held the lock
    claim.unlink()
    di.write_minhash_index(day1.unionByName(day2), idx)  # now clean


def test_probe_plan_still_never_shuffles_the_corpus(spark, tmp_path):
    """The replay-immunity dedup must not change the probe's scale
    shape: no sort-merge join, both corpus joins still broadcast, and
    the only added exchange hangs off the candidate-pruned subtree
    (the corpus-sized scans still stream map-side)."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.dedup_index import (
        dedup_against_index,
        write_minhash_index,
    )

    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "planidx")
    write_minhash_index(docs.filter("doc_id % 5 != 0"), idx)
    result = dedup_against_index(docs.filter("doc_id % 5 = 0"), spark, idx)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def _crashed_bm25_compaction(spark, tmp_path, monkeypatch):
    """A bm25 layout frozen BETWEEN its compaction's two swap renames:
    postings swapped, COMPLETE stats.compact unpromoted, sentinel held,
    `compact 1` commit record on disk."""
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
    return idx


def test_minhash_recover_refuses_on_bm25_compact_record(
    spark, tmp_path, monkeypatch
):
    """The MIRROR of test_default_pair_recover_refuses_on_minhash_record
    (r16 verdict #1 / ADVICE #1, empirically reproduced there):
    `recover_minhash_index` mis-invoked on a bm25/chunk layout crashed
    between its compaction's two swap renames must REFUSE — pre-fix,
    the `compact <wm>` record carried no pairspec, the tail gate fell
    back to the caller's features/bands hint, and the mis-invocation
    consumed the record, unlinked the sentinel, stranded the complete
    `stats.compact` unpromoted (a later recover rolled it BACK → new
    postings serving old stats), and wrote the watermark marker AHEAD
    of the authoritative stats squash row (appends of epochs ≤ wm then
    skipped as already-squashed — silently lost)."""
    import pytest

    from cdc_cascade_spark.llm import bm25_index as bi
    from cdc_cascade_spark.llm import dedup_index as di

    idx = _crashed_bm25_compaction(spark, tmp_path, monkeypatch)
    assert bi._commit_record_watermark(idx) == 1
    assert bi._commit_record_pair(idx) == ("postings", "stats")

    with pytest.raises(RuntimeError, match="postings.*stats"):
        di.recover_minhash_index(idx)  # MinHash entry — wrong layout
    # a true no-op: record + sentinel survive, stats.compact intact,
    # and the watermark marker was NOT written ahead of the stats row
    assert (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert bi._sentinel(idx).exists()
    assert (Path(idx) / "stats.compact").exists()
    assert bi._marker_watermark(idx) == -1

    bi.recover_compaction(idx)  # the right entry finishes the swap
    assert not bi._sentinel(idx).exists()
    assert not (Path(idx) / bi._REBUILD_COMMIT).exists()
    assert not (Path(idx) / "stats.compact").exists()
    assert bi._marker_watermark(idx) == 1
    # the repaired layout rejects a replay of the squashed epoch
    from cdc_cascade_spark.catalog import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    want = sorted(
        map(tuple, bi.bm25_against_index(spark, SF, idx).collect())
    )
    bi.append_postings_index(
        docs.filter(F.col("doc_id") % 2 == 1), idx, batch_id=1
    )
    got = sorted(map(tuple, bi.bm25_against_index(spark, SF, idx).collect()))
    assert got == want and want


def test_minhash_recover_refuses_on_bm25_rebuild_record(
    spark, tmp_path, monkeypatch
):
    """Same mirror for the REBUILD form: the bm25 writer now records
    `rebuild postings,stats` (pairspec unconditional since r17), so a
    mis-invoked `recover_minhash_index` on a bm25 layout crashed
    mid-rebuild-swap refuses instead of consuming the record. The
    pre-r17 bare `rebuild` form — accepted on read only — must refuse
    identically (only the bm25/chunk writers ever wrote it, so it is
    self-describing too)."""
    import pytest

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bm25_index as bi
    from cdc_cascade_spark.llm import dedup_index as di

    idx = str(tmp_path / "bm25")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bi._write_batch(docs.filter(F.col("doc_id") % 2 == 0), idx, "overwrite", -1)

    real_swap = bi._swap_compacted

    def crashing_swap(out_path, name):
        if name == "stats":
            raise RuntimeError("process death (injected)")
        real_swap(out_path, name)

    monkeypatch.setattr(bi, "_swap_compacted", crashing_swap)
    with pytest.raises(RuntimeError, match="injected"):
        bi.write_postings_index(spark, SF, idx)
    monkeypatch.setattr(bi, "_swap_compacted", real_swap)

    rec = Path(idx) / bi._REBUILD_COMMIT
    assert rec.read_text() == "rebuild postings,stats\n"
    assert bi._commit_record_pair(idx) == ("postings", "stats")

    for payload in (None, "rebuild", "rebuild swap in progress"):
        if payload is not None:  # replay the state under a legacy record
            rec.write_text(payload + "\n")
            assert bi._commit_record_pair(idx) == ("postings", "stats")
        with pytest.raises(RuntimeError, match="postings.*stats"):
            di.recover_minhash_index(idx)
        assert rec.exists()
        assert bi._sentinel(idx).exists()
        assert (Path(idx) / "stats.compact").exists()

    bi.recover_compaction(idx)  # completes under the legacy record too
    assert not bi._sentinel(idx).exists()
    assert not rec.exists()
    got = sorted(map(tuple, bi.bm25_against_index(spark, SF, idx).collect()))
    rebuilt = str(tmp_path / "reference")
    bi.write_postings_index(spark, SF, rebuilt)
    want = sorted(
        map(tuple, bi.bm25_against_index(spark, SF, rebuilt).collect())
    )
    assert got == want and want
