"""asof_join row-atomicity semantics.

The regression pinned here: matched_* columns must all come from the
SAME right row. A per-column last(ignorenulls) carry would (a) stitch
fields from different right rows when the latest row holds a NULL in
one value column, and (b) resurrect a stale non-NULL value over a
legitimately-NULL latest one. The single-struct carry fixes both.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cdc_cascade_spark.operators.asof import asof_join


def _d(day: int) -> datetime.date:
    return datetime.date(2024, 1, day)


def test_asof_matches_single_right_row_with_null_fields(spark):
    left = spark.createDataFrame(
        [(1, _d(10), "e1"), (2, _d(10), "e2"), (3, _d(10), "e3")],
        "k long, t date, event string",
    )
    # k=1: latest right row (day 5) has NULL in v2 — both matched values
    #      must come from day 5 (v1='b', v2=NULL), not v2 resurrected
    #      from day 1.
    # k=2: latest right row has NULL in v1 instead.
    # k=3: no right row at all -> both NULL.
    right = spark.createDataFrame(
        [
            (1, _d(1), 100, "a", 1.0),
            (1, _d(5), 101, "b", None),
            (2, _d(1), 200, "x", 9.0),
            (2, _d(5), 201, None, 7.0),
        ],
        "k long, t date, tb long, v1 string, v2 double",
    )
    out = asof_join(
        left,
        right,
        left_key="k",
        right_key="k",
        left_time="t",
        right_time="t",
        right_values=["v1", "v2"],
        tiebreaker="tb",
    )
    rows = {r["event"]: r for r in out.collect()}
    assert rows["e1"]["matched_v1"] == "b" and rows["e1"]["matched_v2"] is None
    assert rows["e2"]["matched_v1"] is None and rows["e2"]["matched_v2"] == 7.0
    assert rows["e3"]["matched_v1"] is None and rows["e3"]["matched_v2"] is None


def test_asof_tie_breaks_by_highest_tiebreaker_deterministically(spark):
    left = spark.createDataFrame([(1, _d(5), "e1")], "k long, t date, event string")
    right = spark.createDataFrame(
        [(1, _d(5), 1, "lo"), (1, _d(5), 2, "hi")],
        "k long, t date, tb long, v1 string",
    )
    out = asof_join(
        left, right, "k", "k", "t", "t", right_values=["v1"], tiebreaker="tb"
    ).collect()
    assert out[0]["matched_v1"] == "hi"


def test_asof_excludes_future_right_rows(spark):
    left = spark.createDataFrame([(1, _d(3), "e1")], "k long, t date, event string")
    right = spark.createDataFrame(
        [(1, _d(2), 1, "past"), (1, _d(4), 2, "future")],
        "k long, t date, tb long, v1 string",
    )
    out = asof_join(
        left, right, "k", "k", "t", "t", right_values=["v1"], tiebreaker="tb"
    ).collect()
    assert out[0]["matched_v1"] == "past"


def _ts(h: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)


def test_asof_strict_excludes_same_timestamp_right(spark):
    """strict=True: a right row AT the left time must not match — the
    self-as-of case where an event would otherwise match itself."""
    left = spark.createDataFrame([(1, _ts(5), "e1")], "k long, t timestamp, event string")
    right = spark.createDataFrame(
        [(1, _ts(5), 9, "same"), (1, _ts(4), 1, "before")],
        "k long, t timestamp, tb long, v1 string",
    )
    loose = asof_join(
        left, right, "k", "k", "t", "t", right_values=["v1"], tiebreaker="tb"
    ).collect()
    strict = asof_join(
        left, right, "k", "k", "t", "t", right_values=["v1"], tiebreaker="tb",
        strict=True,
    ).collect()
    assert loose[0]["matched_v1"] == "same"
    assert strict[0]["matched_v1"] == "before"


def test_asof_tolerance_nulls_stale_matches(spark):
    """A match older than the tolerance becomes NULL; a fresh one stays."""
    left = spark.createDataFrame(
        [(1, _ts(10), "fresh"), (2, _ts(10), "stale")],
        "k long, t timestamp, event string",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 1, "recent"), (2, _ts(1), 2, "ancient")],
        "k long, t timestamp, tb long, v1 string",
    )
    out = asof_join(
        left, right, "k", "k", "t", "t", right_values=["v1"], tiebreaker="tb",
        tolerance_micros=3 * 3600 * 1_000_000,
    )
    rows = {r["event"]: r for r in out.collect()}
    assert rows["fresh"]["matched_v1"] == "recent"  # 2h old, within 3h
    assert rows["stale"]["matched_v1"] is None      # 9h old, beyond 3h


def test_asof_tolerance_strict_matches_naive_model(spark):
    """Randomized parity with the obvious per-row model: latest right
    strictly before t, NULLed when older than the tolerance."""
    import random

    rng = random.Random(42)
    tol_h = 5
    lefts = [
        (k, _ts(rng.randrange(0, 50)), f"e{i}")
        for i, k in enumerate(rng.choices(range(6), k=60))
    ]
    rights = [
        (k, _ts(rng.randrange(0, 50)), i, f"v{i}")
        for i, k in enumerate(rng.choices(range(6), k=80))
    ]
    left = spark.createDataFrame(lefts, "k long, t timestamp, event string")
    right = spark.createDataFrame(rights, "k long, t timestamp, tb long, v1 string")
    out = asof_join(
        left, right, "k", "k", "t", "t", right_values=["v1"], tiebreaker="tb",
        strict=True, tolerance_micros=tol_h * 3600 * 1_000_000,
    )
    got = {r["event"]: r["matched_v1"] for r in out.collect()}
    for k, t, event in lefts:
        eligible = [
            (rt, tb, v)
            for (rk, rt, tb, v) in rights
            if rk == k and rt < t
        ]
        expect = None
        if eligible:
            rt, tb, v = max(eligible, key=lambda x: (x[0], x[1]))
            if (t - rt) <= datetime.timedelta(hours=tol_h):
                expect = v
        assert got[event] == expect, (event, got[event], expect)


def test_asof_pandas_cogroup_matches_window_form(spark):
    """The cogroup/merge_asof implementation and the window composition
    must agree row-for-row on the real events⨝orders as-of query —
    pandas' reference implementation pins the custom operator."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.operators.asof import asof_join_pandas

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    kwargs = dict(
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        tiebreaker="o_orderkey",
    )
    window_rows = {
        r.event_id: (r.matched_o_orderkey, r.matched_o_totalprice)
        for r in asof_join(events, orders, **kwargs).collect()
    }
    pandas_rows = {
        r.event_id: (r.matched_o_orderkey, r.matched_o_totalprice)
        for r in asof_join_pandas(events, orders, **kwargs).collect()
    }
    assert window_rows == pandas_rows and len(window_rows) > 0


def test_asof_pandas_handles_unmatched_groups(spark):
    """Keys with no right rows must yield NULL matches (not drop)."""
    from cdc_cascade_spark.operators.asof import asof_join_pandas

    left = spark.createDataFrame(
        [(1, _ts(5), "has_match"), (2, _ts(5), "no_right_rows")],
        "k long, t timestamp, event string",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 7, "v")], "k long, t timestamp, tb long, v1 string"
    )
    rows = {
        r.event: r.matched_v1
        for r in asof_join_pandas(
            left, right, "k", "k", "t", "t", ["v1"], "tb"
        ).collect()
    }
    assert rows == {"has_match": "v", "no_right_rows": None}
