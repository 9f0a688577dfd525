"""CDC core unit tests over the reference's own scenario.

Replays the representative envelope sequence from FIXTURES.md Part B
(covering every consumer branch of reference queue/cdc.go:170-196 and
the sequence-flows.mmd:33-43 cache-invalidation scenario) and asserts:

- tombstones are filtered but identifiable       (A4)
- malformed JSON routes to the dead-letter split (A6)
- snapshot/insert events don't invalidate        (A7)
- invalidation keys = [5, 14]                    (A8/A9)
- latest-wins compaction yields {5 (updated), 17}; deleted key 14 absent
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cdc_cascade_spark.cdc.compaction import current_state, latest_wins
from cdc_cascade_spark.cdc.envelope import (
    dead_letter,
    invalidation_keys,
    op_routed,
    parse_envelope,
    valid_events,
)


def _env(op, before, after, lsn):
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "source": {"db": "postgres", "schema": "public",
                           "table": "sinners", "lsn": lsn, "txId": lsn},
                "op": op,
                "ts_ms": 1700000000000 + lsn,
            }
        }
    )


def _row(code, name, libram=None, tendency=None):
    return {"code": code, "name": name, "class": "S",
            "libram": libram, "tendency": tendency,
            "created_at": "2026-01-01T00:00:00", "updated_at": "2026-01-01T00:00:00"}


@pytest.fixture(scope="module")
def raw_stream(spark):
    # FIXTURES.md Part B sequence 1-6 over the seed rows (init.sql:26-29).
    values = [
        _env("r", None, _row(14, "Deren", "Fraud", "Fury"), 1),
        _env("r", None, _row(17, "Shalom", "Sloth", "Reticle"), 2),
        _env("c", None, _row(5, "Augustus", "War", "Reticle"), 3),
        _env("u", _row(5, "Augustus", "War", "Reticle"),
             _row(5, "Aurelius", "War", "Reticle"), 4),
        _env("d", _row(14, "Deren", "Fraud", "Fury"), None, 5),
        None,  # tombstone for key 14
        "{not valid json",  # malformed record
    ]
    return spark.createDataFrame(
        [(str(i), v) for i, v in enumerate(values)], "key string, value string"
    )


def test_tombstone_and_corrupt_routing(raw_stream):
    parsed = parse_envelope(raw_stream)
    assert parsed.filter("is_tombstone").count() == 1
    dl = dead_letter(parsed).collect()
    assert [r.raw_value for r in dl] == ["{not valid json"]
    assert valid_events(parsed).count() == 5


def test_invalidation_keys_match_reference(raw_stream):
    # Reference behavior: before==nil → skip (c/r); update/delete → DEL key.
    payloads = valid_events(parse_envelope(raw_stream))
    keys = sorted(r.code for r in invalidation_keys(payloads).collect())
    assert keys == [5, 14]


def test_op_routing(raw_stream):
    payloads = op_routed(valid_events(parse_envelope(raw_stream)))
    counts = {r.op_class: r.n for r in payloads.groupBy("op_class").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"snapshot": 2, "insert": 1, "update": 1, "delete": 1}


def test_latest_wins_compaction(raw_stream):
    payloads = valid_events(parse_envelope(raw_stream))
    state = current_state(payloads, key_field="code")
    rows = {r.code: r.name for r in state.collect()}
    # Expected (FIXTURES.md Part B): {5 updated, 17}; deleted 14 absent.
    assert rows == {5: "Aurelius", 17: "Shalom"}


def test_latest_wins_tie_free_ordering(spark):
    # Two updates to one key across "batches": highest LSN must win.
    log = spark.createDataFrame(
        [(1, 10, "u", "old"), (1, 20, "u", "new"), (2, 5, "d", "gone"),
         (2, 4, "c", "born")],
        "k long, lsn long, op string, payload string",
    )
    out = {r.k: r.payload for r in
           latest_wins(log, ["k"], ["lsn"], op_col="op").collect()}
    assert out == {1: "new"}  # key 2's last op is delete → absent


def test_initial_snapshot_union(spark):
    """C4: snapshot rows (op='r', lsn 0) lose to any changelog event
    for the same key; untouched keys survive from the snapshot."""
    from cdc_cascade_spark.cdc.compaction import with_initial_snapshot

    snapshot = spark.createDataFrame(
        [(14, "Deren"), (17, "Shalom")], "k long, payload string"
    )
    changelog = spark.createDataFrame(
        [(14, 5, "u", "Deren-v2"), (5, 6, "c", "Augustus"), (17, 7, "d", None)],
        "k long, lsn long, op string, payload string",
    )
    unified = with_initial_snapshot(snapshot, changelog, ["k"], ["lsn"])
    state = {r.k: r.payload for r in
             latest_wins(unified, ["k"], ["lsn"], op_col="op").collect()}
    # 14 updated by the stream, 17 deleted, 5 created
    assert state == {14: "Deren-v2", 5: "Augustus"}


def test_initial_snapshot_untouched_keys_survive(spark):
    from cdc_cascade_spark.cdc.compaction import with_initial_snapshot

    snapshot = spark.createDataFrame([(1, "a"), (2, "b")], "k long, payload string")
    changelog = spark.createDataFrame(
        [(1, 10, "u", "a2")], "k long, lsn long, op string, payload string"
    )
    unified = with_initial_snapshot(snapshot, changelog, ["k"], ["lsn"])
    state = {r.k: r.payload for r in
             latest_wins(unified, ["k"], ["lsn"], op_col="op").collect()}
    assert state == {1: "a2", 2: "b"}


def test_route_by_table(spark):
    """C2 extension: multi-table stream demultiplexed by source.table;
    unknown tables quarantined, not dropped."""
    from cdc_cascade_spark.cdc.envelope import route_by_table

    values = [
        _env("c", None, _row(1, "A"), 1),
        _env("c", None, _row(2, "B"), 2),
    ]
    # second envelope re-targeted at another table
    values[1] = values[1].replace('"table": "sinners"', '"table": "saints"')
    rogue = values[0].replace('"table": "sinners"', '"table": "mystery"')
    raw = spark.createDataFrame(
        [(v,) for v in values + [rogue]], "value string"
    )
    payloads = valid_events(parse_envelope(raw))
    routed = route_by_table(payloads, ["sinners", "saints"])
    assert routed["sinners"].count() == 1
    assert routed["saints"].count() == 1
    assert routed["__unknown__"].count() == 1


def test_scd2_versions_chain_and_agree_with_latest_state(spark):
    """Per key: version intervals chain (valid_to == next valid_from),
    exactly one current version unless the key ended deleted, and the
    current versions coincide with cdc_latest_state."""
    from cdc_cascade_spark.cdc.queries import cdc_latest_state, cdc_scd2_history

    sf = "/root/testdata/sf0.001"
    by_user: dict[int, list] = {}
    for r in cdc_scd2_history(spark, sf).collect():
        by_user.setdefault(r.user_id, []).append(r)
    latest = {r.user_id: (r.last_lsn, r.last_event_type)
              for r in cdc_latest_state(spark, sf).collect()}
    currents = {}
    for user, versions in by_user.items():
        versions.sort(key=lambda r: r.valid_from_lsn)
        open_versions = [r for r in versions if r.is_current]
        assert len(open_versions) <= 1
        if open_versions:
            currents[user] = (
                open_versions[0].valid_from_lsn,
                open_versions[0].event_type,
            )
        for r in versions:
            assert r.is_current == (r.valid_to_lsn is None)
            if r.valid_to_lsn is not None:
                assert r.valid_to_lsn > r.valid_from_lsn
    # current versions == latest non-deleted state
    assert currents == latest
