"""Hopping-window streaming parity (operators/hopping.py): the q33
batch face and the native window(ts, 2h, 1h) streaming chain must
agree row-for-row — the last windowed-agg family to gain the pin
(tumbling and sessions already have theirs)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_streamed_hopping_windows_equal_batch(spark, tmp_path):
    """Multi-micro-batch file stream through the chained
    (window, user) → window aggregation: after sentinels advance the
    watermark past every real window's close, the finalized rows
    equal the batch face computed over the same events — windows whose
    events SPAN micro-batches included, exact n_users included."""
    from cdc_cascade_spark.operators.hopping import hopping_window_stream

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # user 1: events every 17 minutes across ~3 hours (every window
    # overlap shape); user 2: sparse; user 3: a burst inside one hour
    for k in range(11):
        rows.append((1, t0 + dt.timedelta(minutes=17 * k)))
    rows.append((2, t0 + dt.timedelta(minutes=30)))
    rows.append((2, t0 + dt.timedelta(hours=3, minutes=10)))
    for k in range(4):
        rows.append((3, t0 + dt.timedelta(hours=1, minutes=5 * k)))
    rows.sort(key=lambda r: r[1])
    sentinel_ts = t0 + dt.timedelta(days=2)

    src = tmp_path / "hop_stream"
    src.mkdir()
    third = len(rows) // 3
    parts = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    parts[-1] = parts[-1] + [(1, sentinel_ts)]
    for i, part in enumerate(parts):
        spark.createDataFrame(
            part, "user_id long, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))

    q = hopping_window_stream(spark, f"{src}/*", queryName="hop_par")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sentinel_us = int(
        sentinel_ts.replace(tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    def _us(ts):
        return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    streamed = {
        (_us(r.window_start), r.n_events, r.n_users)
        for r in spark.table("hop_par").collect()
        if _us(r.window_start) < sentinel_us
    }

    # batch face: q33's explicit explode arithmetic over the same rows
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    h = F.date_trunc("hour", F.col("ts"))
    batch = (
        ev.select(
            F.explode(
                F.array(h - F.expr("INTERVAL 1 HOUR"), h)
            ).alias("window_start"),
            "user_id",
        )
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    want = {
        (
            int(r.window_start.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
            r.n_events,
            r.n_users,
        )
        for r in batch.collect()
    }
    assert streamed == want
    assert len(want) >= 5
    # exact distinct really exercised: some window must hold >1 user
    assert any(n_users > 1 for (_, _, n_users) in want)
