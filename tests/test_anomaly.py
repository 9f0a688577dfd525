"""events_rate_anomaly (operators/anomaly.py): cross-engine oracle
agreement and a pure-Python z² model check. Registered in r8.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_rate_anomaly_oracle_agrees(spark, sf):
    from cdc_cascade_spark.operators.anomaly import (
        ORACLE_RATE_ANOMALY,
        events_rate_anomaly,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "events_rate_anomaly",
        events_rate_anomaly(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_RATE_ANOMALY).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_rate_anomaly_matches_python_model(spark):
    from cdc_cascade_spark.operators.anomaly import (
        Z_THRESHOLD,
        events_rate_anomaly,
    )

    rows = duckdb.connect().execute(
        f"""SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*)
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    counts = Counter()
    by_type = defaultdict(list)
    for et, hr, n in rows:
        counts[(et, hr)] = n
        by_type[et].append(n)

    got = {
        (r.event_type, r.hour): (r.n_events, r.z_squared, r.is_anomaly)
        for r in events_rate_anomaly(spark, SF).collect()
    }
    assert len(got) == len(counts)
    flagged = 0
    for (et, hr), (n, z2, flag) in got.items():
        ns = by_type[et]
        h, s, q = len(ns), sum(ns), sum(x * x for x in ns)
        num = (n * h - s) ** 2
        den = h * q - s * s
        want_z2 = num / (float(h * q) - float(s) * float(s)) if den > 0 else 0.0
        # model uses a slightly different float path — compare loosely
        assert z2 == pytest.approx(want_z2, rel=1e-12)
        assert flag == (num > Z_THRESHOLD**2 * den)
        flagged += bool(flag)
    # a Poisson-ish fixture has tail hours: the flag must fire somewhere
    # but not everywhere
    assert 0 < flagged < len(got)
