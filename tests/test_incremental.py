"""Incremental curation capstone (llm/incremental.py): oracle parity,
incremental ≡ from-scratch equality, multi-batch convergence, the
representative-deletion resurrect cascade, and the long-format SimHash
equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _parity(spark, sf, name):
    from cdc_cascade_spark import registry
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    fn, sql = registry.all_queries()[name]
    res = compare(
        name, fn(spark, sf).toPandas(), duckdb_connect(sf).execute(sql).df()
    )
    assert res.ok, str(res)
    return res


@pytest.mark.parametrize("sf", [SF, SF01])
@pytest.mark.parametrize(
    "name", ["curate_corpus_incremental", "curation_invalidation_report"]
)
def test_oracle_agrees(spark, sf, name):
    """curate_corpus_incremental's oracle IS the full curate_corpus
    rebuild over the v2 snapshot, so its row is the machine proof of
    incremental ≡ rebuild; the invalidation report composes that,
    curate_corpus and corpus_diff verbatim."""
    res = _parity(spark, sf, name)
    assert res.spark_rows > 0


def test_invalidation_report_semantics(spark):
    """Every flip row is consistent with the three faces it composes,
    deleted docs can only leave, created docs can only enter, and the
    NULL-op CASCADE rows — membership flips of documents the diff
    never touched — exist (they are the reason the report exists)."""
    from cdc_cascade_spark.llm import incremental as inc
    from cdc_cascade_spark.llm.pipeline import curate_corpus
    from cdc_cascade_spark.llm.versioning import corpus_diff

    rows = inc.curation_invalidation_report(spark, SF01).collect()
    assert rows
    v1_kept = {r.doc_id for r in curate_corpus(spark, SF01).collect()}
    v2_kept = {
        r.doc_id for r in inc.curate_corpus_incremental(spark, SF01).collect()
    }
    ops = {r.doc_id: r.op for r in corpus_diff(spark, SF01).collect()}
    flipped = {r.doc_id for r in rows}
    assert flipped == v1_kept ^ v2_kept  # exactly the membership flips
    cascade = 0
    for r in rows:
        assert r.kept_v1 == (r.doc_id in v1_kept)
        assert r.kept_v2 == (r.doc_id in v2_kept)
        assert r.op == ops.get(r.doc_id)
        if r.op == "d":
            assert r.kept_v1 and not r.kept_v2
        if r.op == "c":
            assert r.kept_v2 and not r.kept_v1
        if r.op is None:
            cascade += 1
    assert cascade > 0, "diff-untouched docs must flip via the cascade"


def test_simhash_long_format_is_bit_identical(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.dedup import _simhash64_frame
    from cdc_cascade_spark.llm.incremental import _simhash64_frame_long

    docs = load_table(spark, SF01, "documents").select("doc_id", "text")
    wide = {r.doc_id: (r.sim_hi, r.sim_lo) for r in _simhash64_frame(docs).collect()}
    long = {
        r.doc_id: (r.sim_hi, r.sim_lo)
        for r in _simhash64_frame_long(docs).collect()
    }
    assert wide == long and len(wide) == 500


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_from_scratch_build(spark):
    """The incremental path (reuse v1 state, featurize only the diff,
    CDC-maintain the pair graph) must equal featurizing the v2 corpus
    from scratch and running the same decision layers."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import incremental as inc

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v2 = inc._v2_full(docs)
    scratch_state = inc.doc_state_frame(v2).localCheckpoint(eager=False)
    scratch = inc.curate_from_state(
        scratch_state, inc.pairs_from_state(scratch_state)
    )
    incr = inc.curate_corpus_incremental(spark, SF)
    assert _rows(incr) == _rows(scratch)
    # and the maintained pair graph equals the from-scratch pair graph
    assert _rows(inc._face_pairs_cached(spark, SF)) == _rows(
        inc.pairs_from_state(scratch_state)
    )


def test_base_state_cache_equals_from_scratch_featurization(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import incremental as inc

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    cached = inc.base_state_cached(spark, SF)
    scratch = inc.doc_state_frame(docs)
    cols = sorted(cached.columns)
    assert cols == sorted(scratch.columns)
    assert _rows(cached.select(*cols)) == _rows(scratch.select(*cols))


def test_multi_batch_diff_converges_to_one_shot(spark):
    """A diff applied as two sequential batches (the stream shape)
    must land on the same (state, pairs) — and therefore the same
    curated corpus — as the one-shot application: apply_diff composes.
    Batches split by id hash so creates/updates/deletes appear in
    both."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import incremental as inc

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v2 = inc._v2_full(docs)
    diff = inc.corpus_diff_frame(
        docs.select("doc_id", "text"), v2.select("doc_id", "text")
    ).localCheckpoint(eager=True)
    state = inc.doc_state_frame(docs).localCheckpoint(eager=True)
    pairs = inc.pairs_from_state(state).localCheckpoint(eager=True)

    def parts(d):
        payload = v2.join(
            d.filter(F.col("op").isin("c", "u")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        removed = d.filter(F.col("op").isin("d", "u")).select("doc_id")
        return payload, removed

    # one-shot
    p_all, r_all = parts(diff)
    s_one, pr_one = inc.apply_diff(state, pairs, p_all, r_all)
    out_one = inc.curate_from_state(s_one, pr_one)

    # two batches by id parity — pmod, not %, because created docs
    # have NEGATIVE synthetic ids and Spark's % keeps the dividend's
    # sign (odd negatives give -1, silently emptying the k=1 batch)
    s_cur, pr_cur = state, pairs
    n_batches = 0
    for k in (0, 1):
        d = diff.filter(F.pmod(F.col("doc_id"), F.lit(2)) == k)
        assert d.count() > 0
        p, r = parts(d)
        s_cur, pr_cur = inc.apply_diff(s_cur, pr_cur, p, r)
        s_cur = s_cur.localCheckpoint(eager=True)
        pr_cur = pr_cur.localCheckpoint(eager=True)
        n_batches += 1
    assert n_batches == 2
    out_batched = inc.curate_from_state(s_cur, pr_cur)
    assert _rows(out_batched) == _rows(out_one)
    # state convergence, not only output convergence
    cols = sorted(s_one.columns)
    assert _rows(s_cur.select(*cols)) == _rows(s_one.select(*cols))
    assert _rows(pr_cur) == _rows(pr_one)


def test_diff_stream_converges_to_one_shot_curation(spark, tmp_path):
    """End-to-end: the diff consumed as a real file STREAM (one file
    per micro-batch through foreachBatch) must land on the same
    curated corpus as the one-shot batch application — the
    reference's invalidation loop with curation state as the store."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import incremental as inc

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v2 = inc._v2_full(docs)
    diff = inc.corpus_diff_frame(
        docs.select("doc_id", "text"), v2.select("doc_id", "text")
    )
    # envelope + payload rows; op='d' rows carry NULL payload
    rows = (
        diff.join(v2, "doc_id", "left")
        .select("doc_id", "op", "text", "lang", "source")
    )
    src = str(tmp_path / "diff_stream")
    # three id-sliced files → three micro-batches (pmod: created docs
    # have negative ids)
    rows.withColumn("slice", F.pmod(F.col("doc_id"), F.lit(3))).repartition(
        3, "slice"
    ).drop("slice").write.mode("overwrite").parquet(src)

    state = inc.doc_state_frame(docs).localCheckpoint(eager=True)
    pairs = inc.pairs_from_state(state).localCheckpoint(eager=True)
    q, holder = inc.start_incremental_curation_stream(
        spark, src, state, pairs, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = inc.curate_from_state(holder["state"], holder["pairs"])

    payload = v2.join(
        diff.filter(F.col("op").isin("c", "u")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    removed = diff.filter(F.col("op").isin("d", "u")).select("doc_id")
    s_one, p_one = inc.apply_diff(state, pairs, payload, removed)
    assert _rows(streamed) == _rows(inc.curate_from_state(s_one, p_one))
    cols = sorted(holder["state"].columns)
    assert _rows(holder["state"].select(*cols)) == _rows(s_one.select(*cols))


def test_deleting_a_representative_resurrects_its_near_dup(spark):
    """The cascade the capstone exists for: v1 elects min-id
    representatives, so a duplicate document is a loser; deleting the
    representative must bring the survivor back into the curated
    corpus — the incremental engine has to re-elect, not just replay
    per-document verdicts."""
    from cdc_cascade_spark.llm import incremental as inc

    # 40 distinct docs + one exact duplicate pair (1, 2). Texts are
    # ≥ 3 tokens, one language, one source; ids dodge the PII/bench
    # moduli where convenient (the stages still run — determinism is
    # what matters, not avoiding them).
    rows = [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d", "en", "src0") for i in range(3, 43)]
    dup_text = "alpha bravo charlie delta echo"
    rows += [(1, dup_text, "en", "src0"), (2, dup_text, "en", "src0")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    state1 = inc.doc_state_frame(docs).localCheckpoint(eager=True)
    pairs1 = inc.pairs_from_state(state1).localCheckpoint(eager=True)
    assert (1, 2) in {(r.doc_a, r.doc_b) for r in pairs1.collect()}
    out1 = inc.curate_from_state(state1, pairs1)
    kept1 = {r.doc_id for r in out1.collect()}
    assert 1 in kept1 and 2 not in kept1, "v1 must keep the rep, drop the dup"

    # the diff deletes ONLY the representative
    removed = spark.createDataFrame([(1,)], "doc_id long")
    payload = docs.filter(F.lit(False))  # no creates/updates
    state2, pairs2 = inc.apply_diff(state1, pairs1, payload, removed)
    out2 = inc.curate_from_state(state2, pairs2)
    kept2 = {r.doc_id for r in out2.collect()}
    assert 1 not in kept2
    assert 2 in kept2, "deleting the rep must resurrect the surviving dup"
    # and the pair graph no longer contains the deleted edge
    assert (1, 2) not in {(r.doc_a, r.doc_b) for r in pairs2.collect()}


def test_real_corpus_has_live_cascade_cases(spark):
    """The fixed-table face is not vacuous: at sf0.01 the injected
    deletions/updates actually hit near-dup structure — the v2 output
    differs from v1's in BOTH directions, and at least one v1
    dup-loser whose REPRESENTATIVE was invalidated by the diff stops
    being a loser after re-election (the invalidation cascade at the
    dedup layer; sf0.01 concretely: doc 332's rep 120 is a v2 delete).
    Whether such a doc then reaches the final corpus depends on the
    downstream floor/budget elections — the guaranteed end-to-end
    resurrect is pinned by the crafted-corpus test above."""
    from cdc_cascade_spark.llm import incremental as inc
    from cdc_cascade_spark.llm.dedup import dedup_cluster_representatives
    from cdc_cascade_spark.llm.pipeline import curate_corpus
    from cdc_cascade_spark.llm.versioning import DIFF_DELETE_MOD, DIFF_UPDATE_MOD

    v1_kept = {r.doc_id for r in curate_corpus(spark, SF01).select("doc_id").collect()}
    v2_kept = {
        r.doc_id
        for r in inc.curate_corpus_incremental(spark, SF01).select("doc_id").collect()
    }
    assert (v2_kept - v1_kept) and (v1_kept - v2_kept)

    def invalidated(i):
        return i % DIFF_DELETE_MOD == 0 or i % DIFF_UPDATE_MOD == 0

    v1_pairs = {
        (r.doc_id, r.rep_doc_id)
        for r in dedup_cluster_representatives(spark, SF01).collect()
        if r.doc_id != r.rep_doc_id
    }
    cascade = {
        l for (l, r) in v1_pairs if invalidated(r) and not invalidated(l)
    }
    assert cascade, "diff must invalidate at least one representative"
    cc = inc.connected_components(
        inc._face_pairs_cached(spark, SF01).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
    )
    v2_losers = {r.node for r in cc.collect() if r.node != r.comp}
    assert cascade - v2_losers, (
        "a loser whose rep was invalidated must be re-elected out of "
        f"loser status; cascade={sorted(cascade)}, v2_losers={sorted(v2_losers)}"
    )


def test_stream_restart_resumes_from_persisted_snapshot(spark, tmp_path):
    """Durability: run the diff stream with a snapshot store, stop it
    mid-diff, restart a FRESH stream from the persisted (state, pairs)
    with the same checkpoint dir, feed the rest of the diff — the
    final corpus must equal the one-shot application. Proves the
    offset-log + overwrite-idempotent snapshot pair composes to
    exactly-once state across process boundaries (the deployment's
    crash-restart path; in-memory holders do not survive it)."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import incremental as inc

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    v2 = inc._v2_full(docs)
    diff = inc.corpus_diff_frame(
        docs.select("doc_id", "text"), v2.select("doc_id", "text")
    )
    rows = (
        diff.join(v2, "doc_id", "left")
        .select("doc_id", "op", "text", "lang", "source")
        .withColumn("slice", F.pmod(F.col("doc_id"), F.lit(3)))
        .localCheckpoint(eager=True)
    )
    src = str(tmp_path / "diff_stream")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "snapshots")

    state = inc.doc_state_frame(docs).localCheckpoint(eager=True)
    pairs = inc.pairs_from_state(state).localCheckpoint(eager=True)

    # phase 1: one slice arrives; the stream persists its snapshot
    rows.filter(F.col("slice") == 0).drop("slice").repartition(1).write.mode(
        "overwrite"
    ).parquet(src)
    q1, h1 = inc.start_incremental_curation_stream(
        spark, src, state, pairs, ckpt, state_root=store
    )
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    # the persisted snapshot IS the in-memory one
    s_disk, p_disk, latest = inc.load_latest_curation_snapshot(spark, store)
    cols = sorted(h1["state"].columns)
    assert _rows(s_disk.select(*cols)) == _rows(h1["state"].select(*cols))
    assert _rows(p_disk) == _rows(h1["pairs"])

    # phase 2: the rest of the diff arrives; a FRESH stream resumes
    # from the DISK snapshot (not the holder) + the same checkpoint,
    # so already-consumed files are skipped, their effects loaded
    rows.filter(F.col("slice") != 0).drop("slice").repartition(2).write.mode(
        "append"
    ).parquet(src)
    q2, h2 = inc.start_incremental_curation_stream(
        spark, src, s_disk, p_disk, ckpt, state_root=store
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    resumed = inc.curate_from_state(h2["state"], h2["pairs"])

    # equals the one-shot application of the whole diff
    payload = v2.join(
        diff.filter(F.col("op").isin("c", "u")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    removed = diff.filter(F.col("op").isin("d", "u")).select("doc_id")
    s_one, p_one = inc.apply_diff(state, pairs, payload, removed)
    assert _rows(resumed) == _rows(inc.curate_from_state(s_one, p_one))
    assert _rows(h2["state"].select(*cols)) == _rows(s_one.select(*cols))
    # and the store advanced past the phase-1 snapshot
    _s3, _p3, latest2 = inc.load_latest_curation_snapshot(spark, store)
    assert latest2 > latest


def test_snapshot_vacuum_keeps_newest_and_clears_debris(spark, tmp_path):
    """Retention: vacuum deletes all but the newest keep_last complete
    snapshots plus any incomplete crash debris older than the cut,
    leaves in-flight dirs newer than the cut alone, and the store
    still loads its latest snapshot afterwards."""
    import os

    from cdc_cascade_spark.llm import incremental as inc

    root = str(tmp_path / "store")
    state = spark.createDataFrame([(1, "x")], "doc_id long, t string")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    for b in (0, 1, 2):
        inc.save_curation_snapshot(state, pairs, root, b)
    # crash debris: an OLD state dir without _SUCCESS (interrupted
    # write) and an in-flight NEW one — only the old one may go
    os.makedirs(f"{root}/state/batch_id=-5")
    os.makedirs(f"{root}/state/batch_id=9")

    deleted = inc.vacuum_curation_snapshots(spark, root, keep_last=2)
    assert deleted == [-5, 0]
    _s, _p, latest = inc.load_latest_curation_snapshot(spark, root)
    assert latest == 2
    assert sorted(os.listdir(f"{root}/state")) == [
        "batch_id=1",
        "batch_id=2",
        "batch_id=9",
    ]
    assert sorted(os.listdir(f"{root}/pairs")) == ["batch_id=1", "batch_id=2"]
    # idempotent: nothing else to delete at the same retention
    assert inc.vacuum_curation_snapshots(spark, root, keep_last=2) == []


def test_snapshot_load_ignores_incomplete_halves(spark, tmp_path):
    """Consistency gate: a snapshot whose state OR pairs half is
    missing/incomplete must be invisible to the loader — a crash
    between the two writes (or mid-write) can never serve a torn
    pair."""
    import os

    from cdc_cascade_spark.llm import incremental as inc

    root = str(tmp_path / "store")
    state = spark.createDataFrame([(1, "x")], "doc_id long, t string")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    inc.save_curation_snapshot(state, pairs, root, 0)
    # batch 1 crashed after the state half: pairs dir never written
    state.write.mode("overwrite").parquet(f"{root}/state/batch_id=1")
    # batch 2 crashed mid-write: dirs exist, no _SUCCESS markers
    os.makedirs(f"{root}/state/batch_id=2")
    os.makedirs(f"{root}/pairs/batch_id=2")

    _s, _p, latest = inc.load_latest_curation_snapshot(spark, root)
    assert latest == 0


def test_apply_diff_partition_count_tracks_state_growth(spark):
    """r10 advice #3: the maintained state's partition count must be
    re-derived from its ROW count each batch. The previous fix pinned
    it to the input frame's count, so a stream whose corpus grows
    stayed at bootstrap parallelism forever; with the valve, a batch
    that pushes rows past rows_per_partition raises the count (and a
    small steady-state batch still coalesces the union's appended
    partitions away — the original creep fix)."""
    from cdc_cascade_spark.llm import incremental as inc

    rows = [(i, f"tok{i}a tok{i}b tok{i}c", "en", "src0") for i in range(3, 19)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    # bootstrap state squeezed to ONE partition — the pinned regime
    state = (
        inc.doc_state_frame(docs).coalesce(1).localCheckpoint(eager=True)
    )
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    no_removed = spark.createDataFrame([], "doc_id long")

    growth = spark.createDataFrame(
        [(i, f"tok{i}x tok{i}y tok{i}z", "en", "src0") for i in range(100, 132)],
        "doc_id long, text string, lang string, source string",
    )
    # default valve (100k rows/partition): 48 rows stay at 1 partition
    s_default, _ = inc.apply_diff(state, pairs, growth, no_removed)
    assert s_default.rdd.getNumPartitions() == 1
    # tight valve: 16 + 32 rows at 8 rows/partition → ceil(48/8) = 6
    s_grown, _ = inc.apply_diff(
        state, pairs, growth, no_removed, rows_per_partition=8
    )
    got = s_grown.rdd.getNumPartitions()
    assert got == 6, got
    assert s_grown.count() == 48
    # the valve can never exceed what the union naturally carries
    # (coalesce cannot grow past it) nor drop below the input's count
    s_floor, _ = inc.apply_diff(
        state.repartition(4).localCheckpoint(eager=True),
        pairs,
        growth,
        no_removed,
    )
    assert s_floor.rdd.getNumPartitions() == 4


def test_invalidation_report_from_store_equals_face(spark, tmp_path):
    """The storage-backed deployment form (persisted kept-id sets →
    report) must equal the registered session-cached face row-for-row
    — the snapshot-store read path the face's driver-cold figure is
    compared against in SCALE.md."""
    from cdc_cascade_spark.llm import incremental as inc
    from cdc_cascade_spark.llm.versioning import corpus_diff

    sf = "/root/testdata/sf0.001"
    want = {
        (r.doc_id, r.op, r.kept_v1, r.kept_v2)
        for r in inc.curation_invalidation_report(spark, sf).collect()
    }
    inc.save_curated_keepset(
        inc.curate_corpus(spark, sf), str(tmp_path / "v1")
    )
    inc.save_curated_keepset(
        inc.curate_corpus_incremental(spark, sf), str(tmp_path / "v2")
    )
    got = {
        (r.doc_id, r.op, r.kept_v1, r.kept_v2)
        for r in inc.curation_invalidation_report_from_store(
            spark,
            str(tmp_path / "v1"),
            str(tmp_path / "v2"),
            corpus_diff(spark, sf).select("doc_id", "op"),
        ).collect()
    }
    assert got == want and want
