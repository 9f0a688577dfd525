"""Count-min sketch heavy hitters (operators/cms.py): cross-engine
oracle agreement and the CMS one-sided-error guarantees. Registered in
r8; these tests carry the claim until its driver row.
"""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_cms_oracle_agrees(spark, sf):
    from cdc_cascade_spark.operators.cms import (
        ORACLE_CMS_HEAVY_HITTERS,
        sketch_cms_heavy_hitters,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "sketch_cms_heavy_hitters",
        sketch_cms_heavy_hitters(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_CMS_HEAVY_HITTERS).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_cms_one_sided_error_and_completeness(spark):
    from cdc_cascade_spark.operators.cms import (
        CMS_MIN_EST,
        sketch_cms_heavy_hitters,
    )

    rows = sketch_cms_heavy_hitters(spark, SF).collect()
    assert rows
    # one-sided: the sketch can only overestimate
    assert all(r.cms_estimate >= r.exact_count for r in rows)
    # the fixture vocabulary collides in the 256-wide grid, so the
    # audit column actually exposes overestimates
    assert any(r.cms_estimate > r.exact_count for r in rows)
    # completeness: every truly-heavy token is reported (est >= exact
    # >= floor implies it passed the filter)
    true_heavy = duckdb.connect().execute(
        f"""SELECT t, COUNT(*) FROM (
              SELECT unnest(string_split_regex(text, '\\s+')) AS t
              FROM '{SF}/documents.parquet')
            WHERE t <> '' GROUP BY t HAVING COUNT(*) >= {CMS_MIN_EST}"""
    ).fetchall()
    reported = {r.token for r in rows}
    missing = {t for t, _ in true_heavy} - reported
    assert not missing
