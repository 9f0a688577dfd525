"""Envelope parsing and routing — the consumer dataflow, declaratively.

Re-expresses the reference's hand-written poll loop (reference:
queue/cdc.go:109-224) as DataFrame transformations over a Kafka-shaped
input (columns ``key``, ``value``, ``partition``, ``offset``, ...):

- tombstone filter        (A4, cdc.go:170-173)  → ``value IS NULL``
- JSON envelope parse     (A5, cdc.go:169-179)  → ``from_json``
- malformed-record route  (A6, cdc.go:175-179)  → dead-letter split
  (an improvement over the reference, which silently drops bad records)
- snapshot/insert filter  (A7, cdc.go:181-186)  → ``before IS NOT NULL``
- key projection          (A8, cdc.go:57-59,188) → nested-field select

Works identically on batch DataFrames and streaming DataFrames — the
streaming layer (cdc_cascade_spark.streaming) reuses these unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_cascade_spark.cdc.schemas import SINNERS_SCHEMA, envelope_schema


def parse_envelope(
    raw: DataFrame,
    table_schema: T.StructType = SINNERS_SCHEMA,
    value_col: str = "value",
) -> DataFrame:
    """Parse Kafka record values into typed envelope columns.

    Adds:
      - ``is_tombstone``: value is NULL (compaction tombstone, A4)
      - ``envelope``: parsed struct (NULL when JSON is malformed)
      - ``is_corrupt``: non-null value that failed to parse (A6)

    ``from_json`` runs JVM-side (Jackson) — no Python in the hot path.
    """
    value_str = F.col(value_col).cast("string")
    parsed = raw.withColumn(
        "envelope",
        F.from_json(value_str, envelope_schema(table_schema)),
    )
    return parsed.withColumn(
        "is_tombstone", F.col(value_col).isNull()
    ).withColumn(
        "is_corrupt",
        (~F.col("is_tombstone"))
        & (F.col("envelope").isNull() | F.col("envelope.payload").isNull()),
    )


def valid_events(parsed: DataFrame) -> DataFrame:
    """Well-formed change events (tombstones and corrupt records removed)."""
    return parsed.filter(
        (~F.col("is_tombstone")) & (~F.col("is_corrupt"))
    ).select("envelope.payload.*")


def dead_letter(parsed: DataFrame, value_col: str = "value") -> DataFrame:
    """Malformed records routed to a dead-letter output instead of dropped.

    The reference logs and discards these (at-most-once, cdc.go:175-179);
    keeping the raw bytes makes replay possible.
    """
    return parsed.filter(F.col("is_corrupt")).select(
        F.col(value_col).cast("string").alias("raw_value")
    )


def invalidation_keys(payloads: DataFrame, key_field: str = "code") -> DataFrame:
    """Cache-invalidation key stream (A7+A8).

    The reference branches on before-nullness, not ``op`` (cdc.go:181-186):
    a NULL ``before`` means create/snapshot — a brand-new key cannot be
    cached, so only events with a before image invalidate. Catalyst's
    nested-schema pruning reads just this one field from the envelope.
    """
    return payloads.filter(F.col(f"before.{key_field}").isNotNull()).select(
        F.col(f"before.{key_field}").alias(key_field)
    )


def route_by_table(
    payloads: DataFrame, tables: list[str]
) -> dict[str, DataFrame]:
    """Demultiplex a multi-table CDC stream by ``source.table``.

    The reference captures a single table via Debezium's
    ``table.include.list`` (reference: debezium-setup.sh:22); a
    production connector typically streams many tables into one topic
    namespace. Returns one filtered frame per known table plus an
    ``"__unknown__"`` quarantine frame for tables nobody claimed —
    dropping them silently would hide a misconfigured include-list.
    """
    routed = {
        t: payloads.filter(F.col("source.table") == t) for t in tables
    }
    routed["__unknown__"] = payloads.filter(
        ~F.col("source.table").isin(tables) | F.col("source.table").isNull()
    )
    return routed


def op_routed(payloads: DataFrame) -> DataFrame:
    """Classify events by operation (c/u/d/r), implemented properly.

    The reference decodes ``op`` but never consults it (cdc.go:35 vs
    181-186); we expose explicit routing for downstream operators.
    """
    return payloads.withColumn(
        "op_class",
        F.when(F.col("op") == "c", "insert")
        .when(F.col("op") == "u", "update")
        .when(F.col("op") == "d", "delete")
        .when(F.col("op") == "r", "snapshot")
        .otherwise("unknown"),
    )
