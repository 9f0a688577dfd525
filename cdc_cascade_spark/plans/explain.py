"""Physical-plan inspection helpers.

The scale contract of every operator ("the filter pushes down", "the
dimension broadcasts", "the projection prunes columns") is asserted in
tests via these helpers, so a refactor that silently breaks a plan
property fails CI — not a 100 TB production run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet scan reports as pushed down."""
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column lists of every parquet scan in the plan."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in (
        physical_plan(df)
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan.

    In "formatted" mode operators appear as ``(N) Exchange`` headers
    with their partitioning on a separate Arguments line;
    ``BroadcastExchange`` (not a shuffle) has a distinct header.
    """
    return len(re.findall(r"\(\d+\) Exchange\b", physical_plan(df)))


def wholestage_codegen_ids(df: DataFrame) -> list[str]:
    return re.findall(r"WholeStageCodegen \((\d+)\)", physical_plan(df))
