"""Central query registry: name → (spark_callable, oracle_sql | None).

Each operator module exposes ``QUERIES: dict[str, (fn, sql|None)]``;
this module merges them for ``__spark_entry__.py`` (the driver contract)
and for the local parity tests in ``tests/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from cdc_cascade_spark.cdc import queries as cdc_queries
    from cdc_cascade_spark.llm import dedup, multimodal, similarity, text
    from cdc_cascade_spark.operators import asof, ranges, relational, sketches

    merged: dict[str, tuple] = {}
    for module in (
        relational,
        asof,
        ranges,
        sketches,
        cdc_queries,
        text,
        dedup,
        similarity,
        multimodal,
    ):
        overlap = merged.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(module.QUERIES)
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in all_queries().items() if sql is not None
    }
