"""Property-based tests: latest-wins compaction vs a replay model.

Hypothesis generates arbitrary LSN-ordered changelogs (multiple keys,
interleaved c/u/d ops); the Spark operator must agree with a trivial
dict-replay reference on every example. This is the correctness core
of the CDC layer — the piece the reference implements implicitly via
Postgres' primary key + Redis invalidation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from cdc_cascade_spark.cdc.compaction import latest_wins

# an event: (key in 0..4, op) — lsn assigned by position
event = st.tuples(st.integers(0, 4), st.sampled_from(["c", "u", "d"]))
changelogs = st.lists(event, min_size=1, max_size=25)


def replay(events: list[tuple[int, str]]) -> dict[int, int]:
    """Reference model: key → lsn of its surviving latest event."""
    state: dict[int, int] = {}
    for lsn, (key, op) in enumerate(events):
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = lsn
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changelogs)
def test_latest_wins_matches_replay_model(spark, events):
    rows = [(key, lsn, op, f"payload-{lsn}") for lsn, (key, op) in enumerate(events)]
    df = spark.createDataFrame(rows, "k long, lsn long, op string, payload string")
    got = {
        r.k: r.lsn for r in latest_wins(df, ["k"], ["lsn"], op_col="op").collect()
    }
    assert got == replay(events)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changelogs)
def test_compaction_is_idempotent_and_order_insensitive(spark, events):
    """Compacting a shuffled changelog gives the same result — the
    cross-batch / cross-partition arrival-order guarantee (SURVEY C5)."""
    rows = [(key, lsn, op) for lsn, (key, op) in enumerate(events)]
    df = spark.createDataFrame(rows, "k long, lsn long, op string")
    shuffled = spark.createDataFrame(list(reversed(rows)), "k long, lsn long, op string")
    a = {(r.k, r.lsn) for r in latest_wins(df, ["k"], ["lsn"]).collect()}
    b = {(r.k, r.lsn) for r in latest_wins(shuffled, ["k"], ["lsn"]).collect()}
    assert a == b


def test_initial_snapshot_rejects_non_numeric_order(spark):
    """A casted-0 rank is only minimal for numeric orders; timestamp or
    string order columns must be rejected, not silently misranked."""
    import pytest

    from cdc_cascade_spark.cdc.compaction import with_initial_snapshot

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    bad = spark.createDataFrame(
        [(1, "b", "2026-01-01T00:00:00", "c")],
        "k long, v string, ts string, op string",
    ).selectExpr("k", "v", "CAST(ts AS TIMESTAMP) AS ts", "op")
    with pytest.raises(TypeError, match="order column"):
        with_initial_snapshot(snap, bad, ["k"], ["ts"])
