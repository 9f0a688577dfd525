"""Oracle-checkable CDC queries over the driver's testdata.

The driver's correctness gate (t2) can only check queries that run on
the shared parquet tables, so these derive a *deterministic changelog*
from ``events`` — key = ``user_id``, LSN = ``event_id`` (unique,
monotone per generation order), op = first-event→'c',
event_type='error'→'d', else 'u' — and then run the real CDC operators
(``latest_wins``, ``invalidation_keys``, ``parse_envelope``) on it.
The DuckDB oracle replays the same semantics in ANSI SQL.

This makes the reference's consumer-loop semantics (reference:
queue/cdc.go:154-224) verifiable by the hash gate, not just by unit
fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.cdc.compaction import latest_wins
from cdc_cascade_spark.functions.caching import BoundedDFCache
from cdc_cascade_spark.cdc.envelope import (
    invalidation_keys,
    op_routed,
    parse_envelope,
    valid_events,
)

# Row image carried by the synthetic changelog (analog of the `sinners`
# row image; reference models the full row but decodes only the key,
# queue/cdc.go:57-59).
EVENT_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

_CHANGELOG_SQL_CTE = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
), changelog AS (
  SELECT user_id, event_id AS lsn, event_type, value,
         CASE WHEN rn = 1 THEN 'c'
              WHEN event_type = 'error' THEN 'd'
              ELSE 'u' END AS op,
         rn
  FROM ordered
)
"""


def changelog_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the deterministic CDC changelog from the events table."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id",
        F.col("event_id").alias("lsn"),
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
    ).withColumn(
        "op",
        F.when(F.col("rn") == 1, "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u"),
    )


# One persisted envelope frame per (session, sf_dir): two queries
# consume it, and rebuilding it costs a window + to_json over the whole
# events table. Only the *build* side is shared — parse_envelope still
# runs per query, so the round-trip fidelity each query exists to test
# is exercised every time. Bounds/staleness: see BoundedDFCache.
_ENVELOPE_CACHE = BoundedDFCache()


def envelopes_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize the changelog into Debezium-shaped JSON Kafka values.

    before = previous image (NULL for the first event per key, matching
    Debezium c/r semantics the reference branches on, cdc.go:181-186);
    after = current image (NULL for deletes).
    """
    return _ENVELOPE_CACHE.get_or_build(
        spark, sf_dir, lambda: _build_envelopes(spark, sf_dir)
    )


def _build_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = changelog_from_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("lsn")
    image = F.struct(
        F.col("user_id"), F.col("event_type"), F.col("value")
    )
    with_images = log.select(
        "user_id",
        "lsn",
        "op",
        F.when(F.col("rn") > 1, F.lag(image, 1).over(w)).alias("before"),
        F.when(F.col("op") != "d", image).alias("after"),
    )
    payload = F.struct(
        F.col("before"),
        F.col("after"),
        F.struct(
            F.lit("postgresql").alias("connector"),
            F.lit("public").alias("schema"),
            F.lit("events_cdc").alias("table"),
            F.col("lsn").alias("lsn"),
        ).alias("source"),
        F.col("op"),
        (F.col("lsn") * 1000).alias("ts_ms"),
    )
    return with_images.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct(payload.alias("payload"))).alias("value"),
    )


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins compaction of the changelog → current-state table.

    The inverse of WAL capture: reconstructs "the table" from its
    change stream (SURVEY.md §7 Phase 2d). Keys whose last op is a
    delete ('error' event) are absent.
    """
    log = changelog_from_events(spark, sf_dir)
    state = latest_wins(log, ["user_id"], ["lsn"], op_col="op")
    return state.select(
        "user_id",
        F.col("lsn").alias("last_lsn"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


ORACLE_LATEST_STATE = (
    _CHANGELOG_SQL_CTE
    + """
SELECT user_id, lsn AS last_lsn, event_type AS last_event_type, value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY lsn DESC) AS rd
  FROM changelog
) WHERE rd = 1 AND op <> 'd'
"""
)


def cdc_invalidation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cache-invalidation key stream, aggregated per key.

    Runs the real envelope path: JSON-serialize → ``parse_envelope`` →
    ``valid_events`` → ``invalidation_keys`` (before-not-null semantics,
    reference queue/cdc.go:181-191) → count DELs per key. In the
    reference each row here is one idempotent ``Redis.Del``.
    """
    raw = envelopes_from_events(spark, sf_dir)
    payloads = valid_events(parse_envelope(raw, EVENT_IMAGE_SCHEMA))
    keys = invalidation_keys(payloads, key_field="user_id")
    return keys.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_invalidations"))


ORACLE_INVALIDATION = (
    _CHANGELOG_SQL_CTE
    + """
SELECT user_id, COUNT(*) AS n_invalidations
FROM changelog WHERE rn > 1
GROUP BY user_id
"""
)


def cdc_op_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope JSON round-trip + op routing: counts per op class.

    Exercises ``to_json``/``from_json`` fidelity (nested structs, null
    before/after) and the op classifier the reference decodes but never
    uses (cdc.go:35).
    """
    raw = envelopes_from_events(spark, sf_dir)
    payloads = op_routed(valid_events(parse_envelope(raw, EVENT_IMAGE_SCHEMA)))
    return payloads.groupBy("op_class").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.col("source.lsn")).alias("max_lsn"),
        F.countDistinct(
            F.coalesce(F.col("after.user_id"), F.col("before.user_id"))
        ).alias("n_keys"),
    )


ORACLE_OP_ROUTING = (
    _CHANGELOG_SQL_CTE
    + """
SELECT CASE op WHEN 'c' THEN 'insert' WHEN 'u' THEN 'update'
               WHEN 'd' THEN 'delete' WHEN 'r' THEN 'snapshot'
               ELSE 'unknown' END AS op_class,
       COUNT(*) AS n_events,
       MAX(lsn) AS max_lsn,
       COUNT(DISTINCT user_id) AS n_keys
FROM changelog
GROUP BY 1
"""
)


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 history from the changelog.

    The warehouse-side complement of ``cdc_latest_state``: instead of
    compacting to current rows, every change opens a version valid
    over ``[valid_from_lsn, valid_to_lsn)``; the next change (or
    delete) closes it, and the open version per key is flagged
    ``is_current``. Delete rows close their predecessor but are not
    themselves versions — exactly how a Debezium→lakehouse SCD2
    materialization behaves.

    Scale shape: one window over (key, lsn) — the same key-partitioned
    shuffle every CDC operator here uses (no global ordering); output
    is ~1 row per change, append-friendly.
    """
    log = changelog_from_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("lsn")
    with_to = log.select(
        "user_id",
        F.col("lsn").alias("valid_from_lsn"),
        F.lead("lsn", 1).over(w).alias("valid_to_lsn"),
        "op",
        "event_type",
        "value",
    )
    return with_to.filter(F.col("op") != "d").select(
        "user_id",
        "valid_from_lsn",
        "valid_to_lsn",
        "event_type",
        "value",
        F.col("valid_to_lsn").isNull().alias("is_current"),
    )


ORACLE_SCD2 = (
    _CHANGELOG_SQL_CTE
    + """
SELECT user_id, valid_from_lsn, valid_to_lsn, event_type, value,
       valid_to_lsn IS NULL AS is_current
FROM (
  SELECT user_id, lsn AS valid_from_lsn,
         LEAD(lsn, 1) OVER (PARTITION BY user_id ORDER BY lsn)
           AS valid_to_lsn,
         op, event_type, value
  FROM changelog
) WHERE op <> 'd'
"""
)


QUERIES: dict[str, tuple] = {
    "cdc_latest_state": (cdc_latest_state, ORACLE_LATEST_STATE),
    "cdc_invalidation_summary": (cdc_invalidation_summary, ORACLE_INVALIDATION),
    "cdc_op_routing": (cdc_op_routing, ORACLE_OP_ROUTING),
    "cdc_scd2_history": (cdc_scd2_history, ORACLE_SCD2),
}
