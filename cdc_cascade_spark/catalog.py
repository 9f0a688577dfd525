"""Table catalog over the driver-generated parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

The only normalization applied at load time is the ``events.ts`` column:
the parquet file stores TIMESTAMP(NANOS) which Spark cannot read
natively, so the session reads it as a raw int64
(``spark.sql.legacy.parquet.nanosAsLong=true``) and we convert here with
integer division to microseconds — the same ns→us truncation DuckDB
applies, keeping oracle comparisons exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (their
# cardinality is fixed or grows sub-linearly in TPC-H-style generators).
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Engine contract: timestamps are UTC-naive end to end (matches the
    # parquet testdata and the DuckDB oracle). Pin the session TZ here
    # so results are correct even under a caller-built session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The events table stores TIMESTAMP(NANOS), which Spark rejects
        # unless this legacy conf is on. Set it here (runtime SQL conf)
        # so the engine also works under a caller-built SparkSession —
        # e.g. the external driver's — that lacks it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanoseconds → TIMESTAMP_NTZ at microsecond precision.
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view named after itself."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
