"""Watermark late-data semantics: events older than the watermark are
dropped from append-mode windowed aggregations.

Two micro-batches (maxFilesPerTrigger=1): batch 1 advances the
watermark far past an old window; batch 2 delivers a late event for
that window. Append mode emits a window only once, after the watermark
passes its end — the late event must not resurrect it.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_events(spark, path, rows, mtime):
    """Write one parquet file and pin its mtime — the file source
    processes oldest-modified first, so distinct mtimes make the
    micro-batch order deterministic."""
    import os
    from datetime import datetime

    parsed = [
        (i, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), et) for i, ts, et in rows
    ]
    spark.createDataFrame(
        parsed, "event_id long, ts timestamp, event_type string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_late_events_beyond_watermark_are_dropped(spark, tmp_path):
    """The watermark guarantee is: a window is emitted exactly once, and
    late events arriving after its state is evicted are dropped. (Late
    events arriving while the state still lives MAY still be merged —
    the watermark bounds are best-effort on the drop side; verified
    empirically on Spark 4.1.)

    Batch timeline (watermark from a batch's data takes effect in the
    next batch):
      b1 seeds the 00:00 window; b2 advances event time to 10:30
      (wm → 09:30); b3 keeps the stream moving — at its end the 00:00
      window is evicted and emitted; b4 delivers a late event for the
      long-gone window → dropped, no duplicate emission."""
    src = tmp_path / "src"
    _write_events(
        spark, str(src / "b1"), [(1, "2024-01-01 00:30:00", "click")], mtime=1_000_000
    )
    _write_events(
        spark, str(src / "b2"), [(2, "2024-01-01 10:30:00", "click")], mtime=1_000_100
    )
    _write_events(
        spark, str(src / "b3"), [(3, "2024-01-01 11:00:00", "click")], mtime=1_000_200
    )
    _write_events(
        spark, str(src / "b4"), [(4, "2024-01-01 00:50:00", "click")], mtime=1_000_300
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        (str(r.ws), r.n) for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # the 00:00 window was finalized with exactly 1 event; the late
    # event (id 3) was dropped, not re-emitted as a second row
    assert ("2024-01-01 00:00:00", 1) in rows
    assert ("2024-01-01 00:00:00", 2) not in rows


def test_event_inside_watermark_is_counted(spark, tmp_path):
    """Control case: an out-of-order event still within the watermark
    delay IS aggregated."""
    src = tmp_path / "src"
    _write_events(
        spark,
        str(src / "b1"),
        [(1, "2024-01-01 02:30:00", "click")],
        mtime=1_000_000,
    )
    # out-of-order but within 1h delay of max ts (watermark = 01:30):
    # its window 02:00-03:00 is still open
    _write_events(
        spark,
        str(src / "b2"),
        [(2, "2024-01-01 02:10:00", "click"),
         (3, "2024-01-01 06:00:00", "click")],  # pushes watermark past 03:00
        mtime=1_000_100,
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("ontime_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {(str(r.ws), r.n) for r in spark.sql("SELECT * FROM ontime_out").collect()}
    assert ("2024-01-01 02:00:00", 2) in rows


def test_session_window_drops_late_event_and_bounds_state(spark, tmp_path):
    """Session windows must EVICT state at the watermark, not just stop
    emitting: a late event for a long-closed session is dropped (the
    engine reports it in numRowsDroppedByWatermark) and total state rows
    stay bounded by the active sessions — the property that keeps
    session state O(active users), not O(stream length), at scale."""
    import os
    from datetime import datetime

    from cdc_cascade_spark.streaming.windows import session_counts

    def write(path, rows, mtime):
        parsed = [
            (i, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), u)
            for i, ts, u in rows
        ]
        spark.createDataFrame(
            parsed, "event_id long, ts timestamp, user_id long"
        ).coalesce(1).write.mode("overwrite").parquet(path)
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    src = tmp_path / "src"
    # b1: user 7's session; b2 advances the watermark far past it
    # (wm = 10:00 - 2h = 08:00 > session end 00:40), so b2's end evicts
    # + emits the session; b3 keeps the stream moving (a late row in the
    # SAME batch as the eviction may still merge — observed Spark 4.1
    # semantics, same best-effort bound as the tumbling test above);
    # b4 is a LATE event for the long-evicted session → dropped by the
    # watermark, reported in numRowsDroppedByWatermark.
    write(str(src / "b1"), [(1, "2024-01-01 00:10:00", 7)], mtime=1_000_000)
    write(str(src / "b2"), [(2, "2024-01-01 10:00:00", 8)], mtime=1_000_100)
    write(str(src / "b3"), [(3, "2024-01-01 11:00:00", 8)], mtime=1_000_200)
    write(str(src / "b4"), [(4, "2024-01-01 00:20:00", 7)], mtime=1_000_300)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        session_counts(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("session_evict_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    import json as _json

    progress = [_json.loads(p.json) for p in q.recentProgress]
    q.stop()

    rows = {
        (str(r.session_start), r.user_id, r.n_events)
        for r in spark.sql("SELECT * FROM session_evict_out").collect()
    }
    # the closed session was emitted exactly once, with only event 1
    assert ("2024-01-01 00:10:00", 7, 1) in rows
    assert not any(u == 7 and n != 1 for _s, u, n in rows)

    ops = [op for p in progress for op in p.get("stateOperators", [])]
    dropped = sum(op.get("numRowsDroppedByWatermark", 0) for op in ops)
    assert dropped > 0, "the late event must be dropped BY THE WATERMARK"
    # state stays bounded by user 8's two open sessions — eviction
    # actually removed the closed session's rows and the dropped late
    # event never created new state
    final_state = [
        op.get("numRowsTotal", 0)
        for p in progress[-1:]
        for op in p.get("stateOperators", [])
    ]
    assert final_state and max(final_state) <= 2, final_state
