"""File-format sources and sinks.

The reference's only storage is Postgres + Redis (no file formats,
SURVEY.md §2.E); the engine's analytics layer standardizes on parquet
(columnar, pushdown, statistics) and supports json/csv/orc for
interchange. Conventions:

- **Never infer schemas in production paths** — pass the catalog's
  StructType (inference scans data twice and guesses types).
- **Partitioned writes** use ``partitionBy`` on low-cardinality columns
  so readers get partition pruning for free.
- Delta/Iceberg/Hudi need jars not present in this environment; their
  writers are import-gated stubs that raise with a clear message.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SUPPORTED = ("parquet", "orc", "json", "csv")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"{fmt} reads require an explicit schema (no inference)")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", "true")
    writer.options(**options).save(path)


def write_delta(df: DataFrame, path: str, **_options) -> None:
    """Delta Lake sink (jars not in this environment)."""
    try:
        import delta  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Delta Lake requires delta-spark jars on the classpath; "
            "not available in this environment"
        ) from e
    df.write.format("delta").save(path)  # pragma: no cover
