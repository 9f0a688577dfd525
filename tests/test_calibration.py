"""Quality calibration report (llm/calibration.py): oracle parity at
two SFs, a pure-Python model of the value-atomic decile rule and the
ppm arithmetic, and the empty-text bottom-decile discipline."""

from __future__ import annotations

import re

import pytest

from cdc_cascade_spark.llm.calibration import (
    N_DECILES,
    PPM,
    doc_quality_key_frame,
    quality_calibration_frame,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("sf", [SF, SF01])
def test_oracle_agrees(spark, sf):
    from cdc_cascade_spark import registry
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    fn, sql = registry.all_queries()["quality_calibration_report"]
    con = duckdb_connect(sf)
    try:
        res = compare(
            "quality_calibration_report",
            fn(spark, sf).toPandas(),
            con.execute(sql).df(),
        )
    finally:
        con.close()
    assert res.ok, str(res)
    assert 0 < res.spark_rows <= N_DECILES


def _q_milli(text: str) -> int:
    toks = [t for t in re.split(r"\s+", text) if t != ""]
    if not toks:
        return 0
    return (min(len(toks), 100) * len(set(toks)) * 1000) // len(toks)


def _python_model(rows, dup_ids, kept_ids):
    keys = {did: _q_milli(t) for did, t in rows}
    n = len(keys)
    per_value: dict[int, int] = {}
    for v in keys.values():
        per_value[v] = per_value.get(v, 0) + 1
    cum = 0
    decile_of: dict[int, int] = {}
    for v in sorted(per_value):
        cum += per_value[v]
        decile_of[v] = (cum * N_DECILES + n - 1) // n
    out: dict[int, list] = {}
    for did, v in keys.items():
        d = decile_of[v]
        row = out.setdefault(d, [0, 0, 0, v, v])
        row[0] += 1
        row[1] += did in dup_ids
        row[2] += did in kept_ids
        row[3] = min(row[3], v)
        row[4] = max(row[4], v)
    return {
        d: (
            r[0],
            r[1],
            (r[1] * PPM) // r[0],
            r[2],
            (r[2] * PPM) // r[0],
            r[3],
            r[4],
        )
        for d, r in out.items()
    }


def test_matches_python_model_on_crafted_corpus(spark):
    # 30 docs with controlled token counts; empty/whitespace docs land
    # at q_milli 0 (never the '' token's fake max score); an oversized
    # value group spans a decile boundary and must stay atomic
    rows = [(i, " ".join(f"t{j}" for j in range(1, 1 + (i % 5) + 1)))
            for i in range(1, 25)]
    rows += [(100, ""), (101, "   "), (102, "x x x x"), (103, "y y"),
             (104, "a b c d e f"), (105, "z")]
    dup_ids = {1, 2, 3, 100}
    kept_ids = {4, 5, 102, 104}
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dup = spark.createDataFrame([(i,) for i in dup_ids], "doc_id long")
    kept = spark.createDataFrame([(i,) for i in kept_ids], "doc_id long")
    got = {
        r.decile: (
            r.n_docs, r.dup_docs, r.dup_ppm, r.kept_docs, r.kept_ppm,
            r.lo_milli, r.hi_milli,
        )
        for r in quality_calibration_frame(docs, dup, kept).collect()
    }
    assert got == _python_model(rows, dup_ids, kept_ids)


def test_empty_text_lands_in_bottom_decile(spark):
    rows = [(1, ""), (2, "  "), (3, "a b c"), (4, "d e f g"), (5, "h")]
    keys = {
        r.doc_id: r.q_milli
        for r in doc_quality_key_frame(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert keys[1] == 0 and keys[2] == 0
    assert all(v > 0 for d, v in keys.items() if d >= 3)


def test_value_atomic_deciles_are_contiguous_and_ordered(spark):
    rows = quality_calibration_frame(
        spark.read.parquet(f"{SF01}/documents.parquet").select(
            "doc_id", "text"
        ),
        spark.createDataFrame([], "doc_id long"),
        spark.createDataFrame([], "doc_id long"),
    ).collect()
    by_d = sorted(rows, key=lambda r: r.decile)
    # score ranges must be disjoint and increasing with the decile
    for a, b in zip(by_d, by_d[1:]):
        assert a.hi_milli < b.lo_milli
    assert by_d[-1].decile == N_DECILES  # the top decile always exists
    assert sum(r.n_docs for r in by_d) == 500


# random corpora: small alphabet forces q_milli collisions (value
# groups spanning decile boundaries), short docs exercise the n<100
# regime, empty docs the q_milli=0 floor
try:
    from hypothesis import HealthCheck, given, settings, strategies as st

    _doc = st.tuples(
        st.integers(0, 60),
        st.lists(st.sampled_from([f"w{i}" for i in range(6)]), max_size=8),
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(_doc, min_size=1, max_size=20, unique_by=lambda d: d[0]),
        st.sets(st.integers(0, 60), max_size=5),
        st.sets(st.integers(0, 60), max_size=5),
    )
    def test_matches_python_model_on_random_corpora(
        spark, docs, dup_ids, kept_ids
    ):
        rows = [(did, " ".join(ts)) for did, ts in docs]
        frame = spark.createDataFrame(rows, "doc_id long, text string")
        dup = spark.createDataFrame(
            [(i,) for i in dup_ids] or [], "doc_id long"
        )
        kept = spark.createDataFrame(
            [(i,) for i in kept_ids] or [], "doc_id long"
        )
        got = {
            r.decile: (
                r.n_docs, r.dup_docs, r.dup_ppm, r.kept_docs, r.kept_ppm,
                r.lo_milli, r.hi_milli,
            )
            for r in quality_calibration_frame(frame, dup, kept).collect()
        }
        assert got == _python_model(rows, dup_ids, kept_ids)
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
