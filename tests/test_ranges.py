"""Range-join boundary semantics + KMV exact-path fallback."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cdc_cascade_spark.operators.ranges import bucketed_range_join


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_range_join_boundaries_inclusive_start_exclusive_end(spark):
    intervals = spark.createDataFrame(
        [(1, 100, _ts(10), _ts(11))], "ikey long, iid long, s timestamp, e timestamp"
    )
    events = spark.createDataFrame(
        [
            (1, 1, _ts(9, 59)),   # before window
            (1, 2, _ts(10, 0)),   # exactly at start -> included
            (1, 3, _ts(10, 30)),  # inside
            (1, 4, _ts(11, 0)),   # exactly at end -> excluded
            (2, 5, _ts(10, 30)),  # other key
        ],
        "ekey long, eid long, t timestamp",
    )
    got = sorted(
        r.eid
        for r in bucketed_range_join(
            events, intervals, "ekey", "ikey", "t", "s", "e"
        ).collect()
    )
    assert got == [2, 3]


def test_range_join_spanning_multiple_buckets(spark):
    """A window wider than the bucket unit must not miss events in
    middle buckets (the binning correctness core)."""
    intervals = spark.createDataFrame(
        [(1, 100, _ts(1, 30), _ts(5, 30))], "ikey long, iid long, s timestamp, e timestamp"
    )
    events = spark.createDataFrame(
        [(1, i, _ts(i)) for i in range(8)], "ekey long, eid long, t timestamp"
    )
    got = sorted(
        r.eid
        for r in bucketed_range_join(
            events, intervals, "ekey", "ikey", "t", "s", "e"
        ).collect()
    )
    assert got == [2, 3, 4, 5]


def test_kmv_exact_below_k(spark):
    """Groups with fewer than K distinct values report the exact count
    (the estimator only kicks in past K)."""
    from cdc_cascade_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i) for i in range(3)],
        "g string, v long",
    )
    got = {r.g: (r.distinct_est, r.n_kept) for r in kmv_distinct(df, "g", "v").collect()}
    assert got == {"a": (7.0, 7), "b": (3.0, 3)}


def test_funnel_counts_monotone(spark):
    """Funnel stages shrink (or hold) monotonically and every stage
    converts someone at sf0.001."""
    from cdc_cascade_spark.operators.behavior import funnel_conversion

    sf = "/root/testdata/sf0.001"
    counts = {r.stage: r.n_users for r in funnel_conversion(spark, sf).collect()}
    assert set(counts) == {"1_view", "2_click", "3_purchase"}
    assert counts["1_view"] >= counts["2_click"] >= counts["3_purchase"] > 0


def test_cohort_offset_zero_covers_every_user(spark):
    """Offset 0 of each cohort counts exactly the cohort's members
    (every user is active in their own first week), and offsets are
    non-negative."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.operators.behavior import cohort_retention
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = cohort_retention(spark, sf).collect()
    assert all(r.week_offset >= 0 for r in rows)
    cohort_sizes = {
        r.cohort_week: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
        .groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    at_zero = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    assert at_zero == cohort_sizes


def test_dq_report_fires_and_clears_correctly(spark):
    """The constraint suite must report zero violations for the clean
    checks and a positive count for orders_without_lineitem (orders
    with no line items exist in TPC-H-style data) — proving both the
    pass and the fire path flow through the same plan."""
    from cdc_cascade_spark.operators.quality import dq_constraint_report

    sf = "/root/testdata/sf0.001"
    report = {r.check_name: r.n for r in dq_constraint_report(spark, sf).collect()}
    assert len(report) == 6
    assert report["orders_without_lineitem"] > 0
    for name in ("orders_pk_unique", "lineitem_fk_orders",
                 "lineitem_required_columns_not_null",
                 "lineitem_quantity_in_range",
                 "documents_n_chars_consistent"):
        assert report[name] == 0, (name, report[name])
