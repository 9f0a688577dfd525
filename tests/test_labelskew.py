"""Label-skew report (llm/labelskew.py): oracle parity at two SFs, a
pure-Python model of the concentration arithmetic on a crafted corpus,
and the single-corpus-aggregation plan shape."""

from __future__ import annotations

import pytest

from cdc_cascade_spark.llm.labelskew import (
    PPM,
    ORACLE_LABEL_SKEW,
    label_skew_frame,
    label_skew_report,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("sf", [SF, SF01])
def test_oracle_agrees(spark, sf):
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    con = duckdb_connect(sf)
    try:
        res = compare(
            "label_skew_report",
            label_skew_report(spark, sf).toPandas(),
            con.execute(ORACLE_LABEL_SKEW).df(),
        )
    finally:
        con.close()
    assert res.ok, str(res)
    # one row per lang value plus one per source value
    assert res.spark_rows == 5 + 20


# Crafted corpus: lang 'aa' is perfectly balanced over labels {0,1},
# lang 'bb' is single-label (hhi must be exactly PPM), source 's0'
# mixes 3:1 with the tie-broken mode, source 's1' has one doc.
_DOCS = [
    # doc_id, lang, source, label
    (1, "aa", "s0", 0),
    (2, "aa", "s0", 1),
    (3, "aa", "s0", 0),
    (4, "aa", "s0", 1),
    (5, "bb", "s0", 7),
    (6, "bb", "s0", 7),
    (7, "bb", "s0", 7),
    (8, "bb", "s1", 7),
]


def _python_model():
    out = {}
    for dim, idx in (("lang", 1), ("source", 2)):
        strata: dict[str, dict[int, int]] = {}
        for row in _DOCS:
            strata.setdefault(row[idx], {}).setdefault(row[3], 0)
            strata[row[idx]][row[3]] += 1
        for s, counts in strata.items():
            n = sum(counts.values())
            top_label = sorted(counts, key=lambda l: (-counts[l], l))[0]
            out[(dim, s)] = (
                n,
                len(counts),
                top_label,
                (counts[top_label] * PPM) // n,
                (sum(c * c for c in counts.values()) * PPM) // (n * n),
            )
    return out


def test_matches_python_model_on_crafted_corpus(spark):
    docs = spark.createDataFrame(
        [(d, lang, src) for d, lang, src, _ in _DOCS],
        "doc_id long, lang string, source string",
    )
    labels = spark.createDataFrame(
        [(d, lab) for d, _, _, lab in _DOCS], "doc_id long, label int"
    )
    got = {
        (r.dim, r.stratum): (
            r.n_docs,
            r.n_labels,
            r.top_label,
            r.top_share_ppm,
            r.hhi_ppm,
        )
        for r in label_skew_frame(docs, labels).collect()
    }
    assert got == _python_model()
    # boundary values the model makes exact: a single-label stratum is
    # maximally concentrated, a perfectly balanced 2-label one is PPM/2
    assert got[("lang", "bb")][4] == PPM
    assert got[("lang", "bb")][3] == PPM
    assert got[("lang", "aa")][4] == PPM // 2
    assert got[("lang", "aa")][2] == 0  # tie 2/2 broken by label asc


def test_plan_is_one_corpus_aggregation(spark):
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(label_skew_report(spark, SF))
    # everything corpus-sized happens before the cube snapshot: the
    # visible plan joins/windows only the hundreds-row cube, and no
    # consumer re-scans the parquet inputs
    assert plan.count("documents.parquet") == 0, plan[:2000]
    assert plan.count("embeddings.parquet") == 0, plan[:2000]


def test_invariant_to_partitioning_and_order(spark):
    """All outputs are integer sums and floor-divisions with totally
    ordered tie-breaks, so the report is a pure function of the row
    SET — identical across file order and partition layout."""
    from pyspark.sql import functions as F

    from cdc_cascade_spark.catalog import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "source"
    )
    labels = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    layouts = {
        "fwd": (docs.orderBy("doc_id").coalesce(1), labels.coalesce(1)),
        "rev": (
            docs.orderBy(F.desc("doc_id")).repartition(13),
            labels.orderBy(F.desc("doc_id")).repartition(5),
        ),
        "hash": (docs.repartition(7, "source"), labels.repartition(3, "label")),
    }
    results = {
        name: sorted(tuple(r) for r in label_skew_frame(d, l).collect())
        for name, (d, l) in layouts.items()
    }
    assert results["fwd"] == results["rev"] == results["hash"]
    assert results["fwd"]
