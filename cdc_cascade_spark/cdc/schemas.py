"""Debezium CDC envelope and source-table schemas.

Mirrors the reference's consumer-side model (reference:
queue/cdc.go:25-55 for the envelope structs, scripts/init.sql:3-11 for
the ``sinners`` table DDL). Unlike the reference — which deliberately
decodes only the primary key (queue/cdc.go:57-59) — we declare the full
envelope and let Catalyst's nested-schema pruning drop unused fields,
which achieves the same "trimmed struct" effect declaratively.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The captured table (reference: scripts/init.sql:3-11; models/models.go:5-13).
SINNERS_SCHEMA = T.StructType(
    [
        T.StructField("code", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("class", T.StringType(), False),
        T.StructField("libram", T.StringType(), True),
        T.StructField("tendency", T.StringType(), True),
        T.StructField("created_at", T.TimestampNTZType(), False),
        T.StructField("updated_at", T.TimestampNTZType(), False),
    ]
)


def row_image_schema(table_schema: T.StructType) -> T.StructType:
    """before/after images are nullable copies of the table schema."""
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in table_schema.fields]
    )


# Envelope source block (reference: queue/cdc.go:40-55). ``lsn`` is the
# event ordering key used for latest-wins compaction (SURVEY.md §4).
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType(), True),
        T.StructField("connector", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("snapshot", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("sequence", T.StringType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("ts_ns", T.LongType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("txId", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("xmin", T.StringType(), True),
    ]
)


def envelope_schema(table_schema: T.StructType = SINNERS_SCHEMA) -> T.StructType:
    """Full Debezium envelope (reference: queue/cdc.go:25-38).

    The reference models only ``payload`` (the schema block Debezium can
    attach is ignored, queue/cdc.go:25-27); we do the same.
    """
    image = row_image_schema(table_schema)
    payload = T.StructType(
        [
            T.StructField("before", image, True),
            T.StructField("after", image, True),
            T.StructField("source", SOURCE_SCHEMA, True),
            T.StructField("transaction", T.StringType(), True),
            T.StructField("op", T.StringType(), True),  # c|u|d|r (cdc.go:35)
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("ts_us", T.LongType(), True),
            T.StructField("ts_ns", T.LongType(), True),
        ]
    )
    return T.StructType([T.StructField("payload", payload, True)])
