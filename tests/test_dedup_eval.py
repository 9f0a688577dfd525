"""r9-built surfaces: minhash_banding_curve / dedup_index_probe
(llm/dedup_eval.py) and q33_hopping_windows (operators/hopping.py).
Oracle parity at two SFs plus cross-operator and pure-Python
consistency models.
"""

from __future__ import annotations

import datetime

import pytest

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
    "name",
    ["minhash_banding_curve", "dedup_index_probe", "q33_hopping_windows"],
)
def test_oracle_agrees(spark, sf, name):
    res = _parity(spark, sf, name)
    assert res.spark_rows > 0


def _anchor(doc_id: int) -> bool:
    from cdc_cascade_spark.llm.dedup_eval import SAMPLE_CAP, SAMPLE_MOD

    return doc_id % SAMPLE_MOD == 0 and doc_id < SAMPLE_MOD * SAMPLE_CAP


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.1"])
def test_banding_curve_accounts_for_every_anchor_pair(spark, sf):
    """Σ n_pairs must equal |A|·(N−1) − C(|A|,2) — the sparse
    inverted-index plan cannot silently lose the pairs it never
    materializes — and the verified near-dup detector must be
    consistent with the curve's top deciles. Run at sf0.1 too: that is
    the scale where the anchor cap binds (256 of 5000 docs) and where
    the old sample×sample shape lost every true near-dup pair."""
    from cdc_cascade_spark.llm.dedup import _docs_prepared_cached, dedup_minhash_lsh
    from cdc_cascade_spark.llm.dedup_eval import minhash_banding_curve

    rows = {
        r.jaccard_decile: r for r in minhash_banding_curve(spark, sf).collect()
    }
    n = _docs_prepared_cached(spark, sf).count()
    ids = [r.doc_id for r in _docs_prepared_cached(spark, sf).select("doc_id").collect()]
    a = sum(1 for i in ids if _anchor(i))
    assert sum(r.n_pairs for r in rows.values()) == a * (n - 1) - a * (a - 1) // 2
    for r in rows.values():
        assert 0 <= r.n_candidates <= r.n_pairs
        assert r.catch_ppm == r.n_candidates * 1_000_000 // r.n_pairs
    # every VERIFIED near-dup pair (jaccard ≥ 0.8 ⇒ decile ≥ 8)
    # touching an anchor is in the pair population AND was surfaced by
    # banding, so the curve's top deciles must catch at least that many
    verified_touching = [
        r
        for r in dedup_minhash_lsh(spark, sf).collect()
        if _anchor(r.doc_a) or _anchor(r.doc_b)
    ]
    top_candidates = sum(r.n_candidates for d, r in rows.items() if d >= 8)
    assert len(verified_touching) <= top_candidates
    assert verified_touching, "anchor set must touch some true near-dups"
    # the pruning claim is real: decile 0 dominates and is ~uncaught
    assert rows[0].n_pairs > 1000 * max(
        r.n_pairs for d, r in rows.items() if d >= 8
    )
    assert rows[0].catch_ppm < 1000


def test_index_probe_equals_filtered_rebuild(spark):
    """Probe ≡ rebuild: the incremental band-probe pair set must equal
    the full corpus-wide detector's output filtered to pairs touching
    the batch (banding is symmetric) — the dedup_index module's core
    claim, here checked on the oracle-faced query pair."""
    from cdc_cascade_spark.llm.dedup import dedup_minhash_lsh
    from cdc_cascade_spark.llm.dedup_eval import BATCH_MOD, dedup_index_probe

    probe = {
        (r.doc_a, r.doc_b): (r.jaccard, r.in_batch_a, r.in_batch_b)
        for r in dedup_index_probe(spark, SF).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_lsh(spark, SF).collect()
        if r.doc_a % BATCH_MOD == 0 or r.doc_b % BATCH_MOD == 0
    }
    assert {k: v[0] for k, v in probe.items()} == full
    assert probe, "batch must hit some near-dups"
    for (a, b), (_j, ia, ib) in probe.items():
        assert ia == (a % BATCH_MOD == 0) and ib == (b % BATCH_MOD == 0)
        assert ia or ib


def test_hopping_windows_match_python_model(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.operators.hopping import q33_hopping_windows

    ev = load_table(spark, SF, "events").select("ts", "user_id").collect()
    want: dict[datetime.datetime, tuple[int, set]] = {}
    for r in ev:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        for ws in (h - datetime.timedelta(hours=1), h):
            n, users = want.get(ws, (0, set()))
            users = users | {r.user_id}
            want[ws] = (n + 1, users)
    got = {
        r.window_start: (r.n_events, r.n_users)
        for r in q33_hopping_windows(spark, SF).collect()
    }
    assert got == {ws: (n, len(u)) for ws, (n, u) in want.items()}
    # every event is double-counted across windows, none lost
    assert sum(n for n, _ in got.values()) == 2 * len(ev)


def test_q33_is_the_batch_face_of_the_streaming_sliding_window(spark, tmp_path):
    """The registered hopping-window query must produce the exact
    (window_start, n_events) map the streaming sliding_activity
    (2 h window, 1 h slide) emits over the same events — the
    streaming ≡ batch convergence discipline (hot_keys precedent),
    now driver-anchored through q33's oracle row."""
    from cdc_cascade_spark.operators.hopping import q33_hopping_windows
    from cdc_cascade_spark.streaming.windows import sliding_activity, stream_events

    q = (
        sliding_activity(stream_events(spark, SF))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("q33_sliding_face")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.window_start: r.n_events
        for r in spark.sql("SELECT * FROM q33_sliding_face").collect()
    }
    want = {
        r.window_start: r.n_events
        for r in q33_hopping_windows(spark, SF).collect()
    }
    assert got == want
