"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its oracle SQL side by side on the same parquet
tables and compares row count + column names + order-insensitive values.
Float columns are compared exactly first (the engine's determinism
conventions should make them bit-identical); when they differ, the max
absolute/relative delta is reported so near-misses are visible.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from cdc_cascade_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows for order-free compare."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)
    max_abs_delta: float = 0.0

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        extra = f" issues={self.issues}" if self.issues else ""
        return (
            f"[{status}] {self.name}: spark={self.spark_rows} "
            f"oracle={self.oracle_rows}{extra}"
        )


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    res = ParityResult(
        name=name, ok=True, spark_rows=len(spark_pdf), oracle_rows=len(oracle_pdf)
    )
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.issues.append("row count mismatch")
        return res
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        res.ok = False
        res.issues.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return res
    # The driver's value hash is dtype-sensitive: a DuckDB HUGEINT sum
    # surfaces as float64 and hashes differently from Spark's int64 even
    # when every value is equal (r4 verdict, 3 such failures). Flag any
    # integer-vs-float drift here so local parity catches it first.
    for c in s_cols:
        si = pd.api.types.is_integer_dtype(spark_pdf[c])
        oi = pd.api.types.is_integer_dtype(oracle_pdf[c])
        sf_ = pd.api.types.is_float_dtype(spark_pdf[c])
        of = pd.api.types.is_float_dtype(oracle_pdf[c])
        if (si and of) or (sf_ and oi):
            res.ok = False
            res.issues.append(
                f"dtype drift col '{c}': spark={spark_pdf[c].dtype} vs "
                f"oracle={oracle_pdf[c].dtype} (driver hash would differ — "
                f"cast the oracle aggregate, e.g. ::BIGINT)"
            )
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = sv.astype("float64").to_numpy()
            b = ov.astype("float64").to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            eq = (a == b) | both_nan
            if not eq.all():
                delta = np.nanmax(np.abs(np.where(both_nan, 0.0, a - b)))
                res.max_abs_delta = max(res.max_abs_delta, float(delta))
                res.ok = False
                res.issues.append(f"float col '{c}' differs (max |Δ|={delta:.3e})")
        else:
            if not sv.equals(ov):
                res.ok = False
                diff_idx = (sv != ov) | (sv.isna() != ov.isna())
                n_bad = int(diff_idx.sum())
                res.issues.append(f"col '{c}' differs in {n_bad} rows")
    return res


def run_parity(spark, sf_dir: str, only: list[str] | None = None) -> list[ParityResult]:
    from cdc_cascade_spark.registry import all_queries

    con = duckdb_connect(sf_dir)
    results = []
    for name, (fn, sql) in sorted(all_queries().items()):
        if only and name not in only:
            continue
        spark_pdf = fn(spark, sf_dir).toPandas()
        if sql is None:
            results.append(
                ParityResult(name=name, ok=True, spark_rows=len(spark_pdf),
                             oracle_rows=-1, issues=["no oracle (rows-only)"])
            )
            continue
        oracle_pdf = con.execute(sql).df()
        results.append(compare(name, spark_pdf, oracle_pdf))
    con.close()
    return results
