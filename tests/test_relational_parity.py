"""Every registered query must hash-match its DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (row-count + columns +
order-insensitive values, floats compared exactly thanks to the
decimal-sum determinism conventions in operators/relational.py).
"""

from __future__ import annotations

import pytest

from cdc_cascade_spark.registry import all_queries
from cdc_cascade_spark.testing.parity import run_parity


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_parity(spark, sf_dir, name):
    (res,) = run_parity(spark, sf_dir, only=[name])
    assert res.ok, str(res)
    assert res.spark_rows > 0, f"{name} returned 0 rows — trivial oracle match"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
