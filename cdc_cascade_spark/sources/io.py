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


# Target output-file size for compaction. 128 MB is the classic
# HDFS/S3-friendly object size (one task, one row-group-aligned file).
COMPACT_TARGET_BYTES = 128 * 1024 * 1024


def compact_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_bytes: int = COMPACT_TARGET_BYTES,
    schema: T.StructType | str | None = None,
) -> dict:
    """Rewrite a table directory into ~``target_bytes``-sized files.

    The small-files problem is the standing operational tax of every
    streaming/append pipeline (each micro-batch appends a few small
    files; a year later the table is millions of kilobyte objects and
    every scan pays per-file open/list cost). This is the maintenance
    pass a lakehouse runs as OPTIMIZE / rewriteDataFiles — expressed
    with plain Spark:

    - size the output from the table's actual on-disk bytes (driver
      listing via Hadoop FS — metadata only, no data read);
    - rewrite with ``coalesce(n)`` — a narrow dependency: output tasks
      read whole input files without a shuffle (``repartition`` would
      shuffle every row; pointless for a layout-only rewrite);
    - write to a temp dir, then atomically swap, so a failed compaction
      never destroys the source (the swap is two renames — at 100 TB
      run per-partition swaps so the window is per-partition).

    The transient siblings are DOT-PREFIXED (``.{leaf}._compact_tmp``
    / ``.{leaf}._compact_bak``) so Spark's file listing ignores them
    (r11 advice: when the compacted directory is one Hive partition of
    a larger table — ``…/postings/bucket=7`` — a crash used to leave a
    visible ``bucket=7._compact_bak`` sibling INSIDE the partitioned
    root, which parses as the STRING partition value
    ``7._compact_bak``, flips the partition column's inferred type and
    silently blanks every typed pruned probe; a hidden name is debris
    no reader can observe). The only reader-visible window left is the
    instant between the two swap renames when the live directory is
    absent — callers compacting live-queried partitioned tables must
    quiesce reads for the swap (the index modules enforce this with a
    lock sentinel; see llm/bm25_index.py).

    Returns {files_before, files_after, bytes}.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hconf = jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(hconf)

    def _data_files(p):
        out = []
        for status in fs.listStatus(p):
            f = status.getPath()
            if status.isDirectory():
                out += _data_files(f)
            elif not f.getName().startswith(("_", ".")):
                out.append(status)
        return out

    before = _data_files(src)
    total_bytes = sum(s.getLen() for s in before)
    n_out = max(1, (total_bytes + target_bytes - 1) // target_bytes)

    df = read_table(spark, path, fmt=fmt, schema=schema)
    head, _, leaf = path.rstrip("/").rpartition("/")
    prefix = f"{head}/.{leaf}" if head else f".{leaf}"
    tmp = prefix + "._compact_tmp"
    df.coalesce(int(n_out)).write.format(fmt).mode("overwrite").save(tmp)

    bak = prefix + "._compact_bak"
    bak_path = jvm.org.apache.hadoop.fs.Path(bak)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(bak_path):
        fs.delete(bak_path, True)
    fs.rename(src, bak_path)
    fs.rename(tmp_path, src)
    fs.delete(bak_path, True)

    after = _data_files(src)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": int(total_bytes),
    }
