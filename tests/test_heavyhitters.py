"""events_hot_keys (operators/heavyhitters.py, r8-built, registers
r9): cross-engine oracle agreement + convergence with the STREAMING
hot-key monitor the salting machinery consumes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_events_hot_keys_oracle_agrees(spark, sf):
    from cdc_cascade_spark.operators.heavyhitters import (
        ORACLE_EVENTS_HOT_KEYS,
        events_hot_keys,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "events_hot_keys",
        events_hot_keys(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_EVENTS_HOT_KEYS).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_batch_face_converges_with_streaming_monitor(spark, tmp_path):
    """The registered batch report and the streaming hot_keys monitor
    must flag the SAME (window, key, count) set — they share the
    semantics the salted join consumes."""
    from cdc_cascade_spark.operators.heavyhitters import (
        HOT_MIN_COUNT,
        events_hot_keys,
    )
    from cdc_cascade_spark.streaming.windows import hot_keys, stream_events

    stream = stream_events(spark, SF)
    q = (
        hot_keys(stream, window="1 day", min_count=HOT_MIN_COUNT)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hh_batch_face")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        (r.window_start, r.key): r.n_events
        for r in spark.sql("SELECT * FROM hh_batch_face").collect()
    }
    batch = {
        (r.window_start, r.key): r.n_events
        for r in events_hot_keys(spark, SF).collect()
    }
    assert batch == streamed
    assert batch, "fixture must contain hot keys"


def test_share_ppm_is_exact_integer_share(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.operators.heavyhitters import events_hot_keys

    ev = load_table(spark, SF, "events")
    day_totals = {
        r.d: r.n
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in events_hot_keys(spark, SF).collect():
        assert r.share_ppm == r.n_events * 1_000_000 // day_totals[r.window_start]
        assert 0 < r.share_ppm <= 1_000_000
