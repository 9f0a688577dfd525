"""Event-time windowed aggregations over a stream with late-data handling.

The reference has no event-time operators (SURVEY.md §2.E) — these are
part of the engine's extended streaming surface (north star in
BASELINE.json): tumbling / sliding / session windows with watermarks,
the streaming counterparts of batch queries q17 (tumbling) and q13
(sessionization).

Scale: windowed aggregation state is partitioned by (window, keys) and
bounded by the watermark — late events beyond the delay are dropped,
so state size is O(active windows × keys), independent of stream
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _events_ts_is_int64(sf_dir: str) -> bool:
    """True when events.ts is stored as TIMESTAMP(NANOS) (which Spark can
    only read as a raw int64 under ``nanosAsLong``).

    A streaming source needs its schema fixed up front, so the batch
    path's read-then-inspect (catalog.load_table) is not available; this
    sniffs the parquet footer once at plan-build time — a bounded
    metadata read, like the IVF centroid collect.
    """
    try:
        import pyarrow.parquet as pq

        t = pq.ParquetFile(f"{sf_dir}/events.parquet").schema_arrow.field("ts").type
        return getattr(t, "unit", None) == "ns" or str(t) == "int64"
    except (ImportError, OSError, KeyError, ValueError) as exc:
        # pyarrow absent / unreadable footer (pyarrow raises
        # ArrowInvalid, a ValueError subclass, for corrupt footers) /
        # no ts field. Fall back to the modern micros layout, but say
        # so: if the file is actually nanos the stream will later fail
        # with an opaque parquet type-mismatch, and this warning is the
        # diagnosable breadcrumb.
        import warnings

        warnings.warn(
            f"could not sniff events.parquet ts layout ({exc!r}); "
            "assuming TIMESTAMP(MICROS) — if the stream fails with a "
            "parquet type mismatch, the file is the nanos layout",
            stacklevel=2,
        )
        return False


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming read of the events table (file source standing in for
    Kafka; the transformations are source-agnostic).

    Handles both testdata layouts for ``ts`` — TIMESTAMP(MICROS), which
    Spark reads natively, and TIMESTAMP(NANOS), which it reads as int64
    nanoseconds — yielding the same microsecond *instants* as
    ``catalog.load_table``. One deliberate divergence: load_table casts
    to TIMESTAMP_NTZ, while this stream keeps TIMESTAMP_LTZ because
    ``withWatermark``/`window`` operate on LTZ. Stream/batch equality
    therefore presumes the UTC session timezone, which is pinned below
    (and again in catalog.load_table) so LTZ wall-clock values coincide
    with the NTZ ones.

    .. warning:: SESSION-WIDE side effect (same contract as
       ``catalog.load_table``): this sets
       ``spark.sql.session.timeZone=UTC`` and — when the nanos layout
       is sniffed — ``spark.sql.legacy.parquet.nanosAsLong=true`` on
       the SHARED session, so the caller's subsequent batch queries in
       the same session inherit UTC timestamps and int64 nanos parquet
       reads. This is deliberate (the whole engine's determinism
       conventions assume it), but a caller that pinned a DIFFERENT
       timezone gets a ``warnings.warn`` here rather than a silent
       overwrite.
    """
    # Mirror catalog.load_table's defensive confs (ADVICE r4): a
    # caller-built session without them would either throw on the nanos
    # layout or silently shift LTZ window boundaries off the UTC oracle.
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    if prev_tz not in (None, "UTC"):
        import warnings

        warnings.warn(
            f"stream_events overrides spark.sql.session.timeZone "
            f"({prev_tz!r} -> 'UTC') for the WHOLE session: engine "
            "determinism conventions require UTC, and this session's "
            "subsequent batch queries will see it too",
            stacklevel=2,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns = _events_ts_is_int64(sf_dir)
    if ns:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(
            "event_id long, ts {} , user_id long, event_type string, "
            "value double, props string".format("long" if ns else "timestamp")
        )
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        # the file source wants a directory; glob-filter to the events table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ns:
        # same ns→us conversion as catalog.load_table, LTZ for watermarks
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_activity(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding window: per-user activity over overlapping windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "approx_users",
        )
    )


def hot_keys(
    events: DataFrame,
    key_col: str = "user_id",
    window: str = "1 day",
    watermark: str = "2 hours",
    min_count: int = 20,
) -> DataFrame:
    """Windowed heavy-hitter / hot-key detector — the live skew monitor
    a large-scale pipeline runs next to its keyed joins and dedup
    blocks: any key whose per-window event count reaches ``min_count``
    is exactly the key that will make a downstream shuffle partition
    hot, and belongs in the salting / skew-hint list
    (``operators/skew.py::salted_join``) before it melts an executor.

    Plan: one watermarked streaming aggregation on (window, key) —
    map-side partial counts, state is one counter per live
    (window, key) and is evicted once the watermark passes the window
    end, so state size tracks the key cardinality of ONE window, not
    the stream's history. The hot filter sits above the agg and
    removes nothing from state; emission is append-mode on window
    close. Thresholding on an absolute count keeps the operator a
    single streaming agg — a fraction-of-total variant needs a second
    agg over the first (unsupported shape in append mode) or a
    foreachBatch join, which callers can build from this output.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= min_count)
        .select(
            F.col("window.start").alias("window_start"),
            "key",
            "n_events",
        )
    )


def start_continuous_rollup(
    events: DataFrame,
    store,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Continuously-maintained hourly rollup — the TimescaleDB
    continuous-aggregate / materialized-hypertable pattern, Spark-style.

    Update-mode windowed aggregation emits each (window, event_type)
    row whenever its aggregate changes (including late-data refinement
    within the watermark); a foreachBatch upsert keeps the keyed store
    converged to the final rollup. Per-batch upsert volume is bounded
    by active windows × types (watermark-bounded state), NOT stream
    length, and the store ends bit-identical to the batch tumbling
    aggregation over the same data (pinned by test).
    """
    import json

    agg = tumbling_counts(events, window, watermark)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.toLocalIterator():
            key = f"{row.window_start.isoformat()}|{row.event_type}"
            store.set(
                key,
                json.dumps(
                    {"n_events": row.n_events, "sum_value": row.sum_value}
                ),
            )

    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (gap-based), the streaming analog of batch q13."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )
