"""Temperature mixing (llm/tempmix.py): oracle parity at two SFs, a
pure-Python model of the sqrt/quota/admission arithmetic, and the
temperature-policy invariants on the genuinely lang-skewed corpus."""

from __future__ import annotations

import hashlib
import math

import pytest

from cdc_cascade_spark.llm.tempmix import (
    TM_BUDGET,
    W_SCALE,
    temperature_mixture_sample,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("sf", [SF, SF01])
def test_oracle_agrees(spark, sf):
    from cdc_cascade_spark import registry
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    fn, sql = registry.all_queries()["temperature_mixture_sample"]
    res = compare(
        "temperature_mixture_sample",
        fn(spark, sf).toPandas(),
        duckdb_connect(sf).execute(sql).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def _token_hash_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_model(sf: str):
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, lang FROM '{sf}/documents.parquet'"
    ).fetchall()
    counts: dict[str, int] = {}
    for _, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    w = {g: round(math.sqrt(n) * W_SCALE) for g, n in counts.items()}
    w_total = sum(w.values())
    quota = {g: (TM_BUDGET * w[g]) // w_total for g in w}
    rate = {g: min(1_000_000, (quota[g] * 1_000_000) // counts[g]) for g in w}
    admitted = {
        (did, g)
        for did, g in rows
        if _token_hash_py(f"tmix:{g}:{did}") % 1_000_000 < rate[g]
    }
    return counts, w, quota, rate, admitted


def test_matches_python_model(spark):
    counts, w, quota, rate, admitted = _python_model(SF)
    got = temperature_mixture_sample(spark, SF).collect()
    assert {(r.doc_id, r.lang) for r in got} == admitted
    for r in got:
        assert (r.n_docs, r.w_micro, r.quota, r.rate_ppm) == (
            counts[r.lang],
            w[r.lang],
            quota[r.lang],
            rate[r.lang],
        ), r


def test_temperature_policy_invariants(spark):
    rows = temperature_mixture_sample(spark, SF01).collect()
    plan = {r.lang: (r.n_docs, r.quota, r.rate_ppm) for r in rows}
    assert len(plan) == 5  # every language stratum admits something
    n_total = sum(n for n, _, _ in plan.values())
    # budget bound: integer floors can only under-shoot
    assert sum(q for _, q, _ in plan.values()) <= TM_BUDGET
    # sub-linear upweighting: the majority stratum's quota share must
    # sit BELOW its corpus share; every minority stratum's above
    (en_n, en_q, en_rate) = plan["en"]
    q_total = sum(q for _, q, _ in plan.values())
    assert en_q / q_total < en_n / n_total
    for g, (n, q, r) in plan.items():
        if g == "en":
            continue
        assert q / q_total > n / n_total, (g, q, n)
        # minority admission rates strictly exceed the majority's
        assert r > en_rate, (g, r, en_rate)
    # quotas monotone in stratum size (sqrt is increasing)
    by_n = sorted(plan.values())
    assert all(a[1] <= b[1] for a, b in zip(by_n, by_n[1:]))
