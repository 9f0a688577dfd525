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
