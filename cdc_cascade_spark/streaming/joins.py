"""Stream-stream joins and stream deduplication.

Two Structured Streaming capabilities the CDC/event surface needs that
no batch query can express:

- **Interval (time-range) stream-stream join** — correlate two live
  event streams on a key within a bounded event-time window (purchase
  attribution: which click led to this purchase?). Spark buffers both
  sides in keyed state; the time-range predicate plus watermarks lets
  it *evict* state once no future match is possible, so state is
  O(events inside the interval), independent of stream length.

- **Watermarked stream deduplication** — CDC transport is
  at-least-once (reference: queue/cdc.go offset commit AFTER effects),
  so a crash replays records. ``dropDuplicatesWithinWatermark``
  suppresses re-deliveries of the same event id arriving within the
  watermark delay, turning at-least-once transport into effectively-
  once *processing* even when the downstream effect is not naturally
  idempotent. State: one entry per id seen within the watermark, then
  evicted.

The reference itself relies on effect idempotence (Redis DEL) instead
of dedup — both strategies are implemented here; sinks choose.

Oracle-gate exclusion (r5 advice low): nothing in this module is in
the QUERIES registry, because every operator here is a *streaming*
computation whose observable semantics are watermark- and
trigger-dependent — which rows have been emitted at any point depends
on watermark advancement (outer-join NULL emission fires only when the
watermark passes the interval bound; dedup state evicts on watermark),
so no single ANSI statement over the static tables mirrors the
operator. The correctness gate is instead the streaming test suite:
``test_streaming.py``/``test_late_data.py`` drive the joins through
multi-batch feeds (including the watermark-forced LEFT OUTER null
emission and replayed-duplicate suppression) and pin the final emitted
set against the batch-join model computed on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attribution_sides(
    events: DataFrame, attribution_window: str, watermark: str
):
    """Shared (clicks, purchases, condition) for the attribution joins —
    one definition of the interval predicate and the side projections,
    so the inner and outer variants cannot drift."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return clicks, purchases, cond


def attribution_join(
    events: DataFrame,
    attribution_window: str = "2 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each purchase to the same user's clicks in the preceding
    ``attribution_window`` — a stream-stream self-join with a
    time-range condition.

    Both sides carry watermarks; with the range predicate
    ``click_ts < purchase_ts ≤ click_ts + window`` Spark derives how
    long each side's state can matter and drops older rows. Inner join:
    unmatched purchases/clicks simply never emit.
    """
    clicks, purchases, cond = _attribution_sides(
        events, attribution_window, watermark
    )
    return clicks.join(purchases, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "amount",
    )


def attribution_join_outer(
    events: DataFrame,
    attribution_window: str = "2 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant of :func:`attribution_join`: purchases with NO
    qualifying click still emit — with null click columns — once the
    watermark guarantees no matching click can arrive.

    This is a genuinely different Structured Streaming behavior from
    the inner join: unmatched left rows are held in state until the
    watermark passes the end of their join interval, THEN emitted with
    nulls (batch left joins emit immediately; streams cannot know a
    match won't arrive until event time moves on). The organic-purchase
    report — "which purchases had no ad click" — needs exactly this.
    State bound is the same as the inner join's: both sides evict once
    outside the interval.
    """
    clicks, purchases, cond = _attribution_sides(
        events, attribution_window, watermark
    )
    return purchases.join(clicks, cond, "left_outer").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "amount",
        "click_id",
        "click_ts",
    )


def dedup_within_watermark(
    events: DataFrame, id_cols: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Drop re-delivered events: duplicates of ``id_cols`` arriving
    within the watermark delay of each other are suppressed.

    The at-least-once → effectively-once bridge for non-idempotent
    sinks; state holds one entry per id until the watermark passes it.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        id_cols or ["event_id"]
    )
