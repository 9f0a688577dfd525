"""Native session-window face (operators/sessions.py): oracle parity,
the empirically-pinned gap-boundary rule, streamed ≡ batch, and the
one-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _duck(sf_dir: str):
    from cdc_cascade_spark.testing.parity import duckdb_connect

    return duckdb_connect(sf_dir)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_q34_oracle_agrees(spark, sf):
    from cdc_cascade_spark.operators.sessions import (
        ORACLE_Q34,
        q34_session_window_stats,
    )
    from cdc_cascade_spark.testing.parity import compare

    got = q34_session_window_stats(spark, sf).toPandas()
    want = _duck(sf).execute(ORACLE_Q34).df()
    r = compare("q34_session_window_stats", got, want)
    assert r.ok, r
    assert len(got) > 0


def test_gap_boundary_rule_is_leq_merges(spark):
    """Spark's session_window merges at diff == gap EXACTLY and splits
    one microsecond past it — the rule the oracle states as
    ``diff > GAP_US`` starting a new session. This pin is what makes
    the oracle a spec, not a guess."""
    from cdc_cascade_spark.operators.sessions import session_frame

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(seconds=1800)),
        (2, t0), (2, t0 + dt.timedelta(seconds=1800, microseconds=1)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.user_id, r.n_events)
        for r in session_frame(ev).collect()
    }
    assert (1, 2) in got, "exactly-gap-apart events must share a session"
    assert (2, 1) in got and (2, 2) not in got, (
        "gap+1µs must split into singleton sessions"
    )
    # active time: the merged session spans exactly the gap; the
    # window's synthetic +gap tail must NOT leak into last_us
    by_user = {r.user_id: r for r in session_frame(ev).filter(F.col("n_events") == 2).collect()}
    assert by_user[1].last_us - by_user[1].start_us == 1800 * 1_000_000


def test_streamed_sessions_equal_batch(spark, tmp_path):
    """Multi-micro-batch file stream through the SAME session_window
    aggregation: after a per-user sentinel advances the watermark past
    every real session, the appended (finalized) rows equal the batch
    session_frame rows — sessions that SPAN micro-batches included."""
    from cdc_cascade_spark.operators.sessions import (
        session_frame,
        session_window_stream,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # user 1: one long session crossing all three files (5-min steps),
    # then a separate later session; user 2: singletons far apart
    for k in range(9):
        rows.append((1, t0 + dt.timedelta(minutes=5 * k)))
    rows.append((1, t0 + dt.timedelta(hours=6)))
    rows.append((2, t0))
    rows.append((2, t0 + dt.timedelta(hours=3)))
    rows.sort(key=lambda r: r[1])
    sentinel_ts = t0 + dt.timedelta(days=2)
    src = tmp_path / "ev_stream"
    src.mkdir()
    # chronological thirds, written in order (the file source picks
    # them up oldest-first); the LAST file carries the sentinels that
    # push the watermark past every real session's close
    third = len(rows) // 3
    parts = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    parts[-1] = parts[-1] + [(1, sentinel_ts), (2, sentinel_ts)]
    for i, part in enumerate(parts):
        spark.createDataFrame(
            part, "user_id long, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))

    q = session_window_stream(
        spark, f"{src}/*", queryName="sess_t", watermark="1 minute"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r.user_id, r.start_us, r.last_us, r.n_events)
        for r in spark.table("sess_t").collect()
    }
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    want = {
        (r.user_id, r.start_us, r.last_us, r.n_events)
        for r in session_frame(ev).collect()
    }
    # every real (non-sentinel) session is finalized and identical
    sentinel_us = int(sentinel_ts.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert {s for s in streamed if s[1] < sentinel_us} == want
    assert len(want) >= 4


def test_q34_plan_single_exchange(spark):
    """The per-user rollup must ride the session aggregation's
    user_id partitioning — exactly ONE shuffle over the events scan."""
    from cdc_cascade_spark.operators.sessions import (
        q34_session_window_stats,
    )
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(
        q34_session_window_stats(spark, "/root/testdata/sf0.001")
    )
    assert plan.count("hashpartitioning(user_id") == 1, plan[:3000]
    assert "MergingSessions" in plan
    # map-side partial count before the one exchange
    assert "partial_count" in plan


# --- hypothesis: random event streams vs a pure-Python sessionizer ---

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (user, offset-seconds) event sets with offsets clustered around the
# 1800 s gap so boundary cases (diff == gap, gap ± 1 s) occur often
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=4).flatmap(
            lambda k: st.integers(
                min_value=k * 1800 - 2, max_value=k * 1800 + 2
            )
        ),
    ),
    min_size=1,
    max_size=30,
)


def _python_sessions(rows):
    """The gap rule in plain Python: same session iff diff <= 1800 s."""
    out = {}
    by_user = {}
    for u, off in rows:
        by_user.setdefault(u, []).append(off)
    for u, offs in by_user.items():
        sessions = []
        for off in sorted(offs):
            if sessions and off - sessions[-1][-1] <= 1800:
                sessions[-1].append(off)
            else:
                sessions.append([off])
        out[u] = sessions
    return out


@given(events_strategy)
@_SETTINGS
def test_session_frame_matches_python_model(spark, rows):
    from cdc_cascade_spark.operators.sessions import session_frame

    t0 = dt.datetime(2024, 6, 1)
    ev = spark.createDataFrame(
        [(u, t0 + dt.timedelta(seconds=off)) for u, off in rows],
        "user_id long, ts timestamp",
    )
    got = {
        (r.user_id, r.start_us, r.last_us, r.n_events)
        for r in session_frame(ev).collect()
    }
    base_us = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    want = set()
    for u, sessions in _python_sessions(rows).items():
        for s in sessions:
            want.add(
                (
                    u,
                    base_us + s[0] * 1_000_000,
                    base_us + s[-1] * 1_000_000,
                    len(s),
                )
            )
    assert got == want
