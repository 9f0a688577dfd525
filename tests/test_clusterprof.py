"""embedding_cluster_profile (llm/clusterprof.py, r8-built, registers
r9): cross-engine oracle agreement + a pure-numpy model replay of the
assignment and every profile column."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_cluster_profile_oracle_agrees(spark, sf):
    from cdc_cascade_spark.llm.clusterprof import (
        ORACLE_CLUSTER_PROFILE,
        embedding_cluster_profile,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "embedding_cluster_profile",
        embedding_cluster_profile(spark, sf).toPandas(),
        duckdb_connect(sf).execute(ORACLE_CLUSTER_PROFILE).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_cluster_profile_matches_numpy_model(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.clusterprof import (
        TIGHT_COS,
        embedding_cluster_profile,
    )
    from cdc_cascade_spark.llm.similarity import IVF_CENTROIDS

    rows = sorted(
        load_table(spark, SF, "embeddings").collect(), key=lambda r: r.vec_id
    )
    cids = np.array([r.vec_id for r in rows[:IVF_CENTROIDS]])
    C = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows[:IVF_CENTROIDS]])
    normC = np.sqrt((C * C).sum(axis=1))
    want = {}
    for r in rows:
        e = np.asarray(r.embedding, dtype=np.float64)
        cos = (C @ e) / (np.sqrt(e @ e) * normC)
        c = int(cids[int(np.argmax(cos))])
        cos9 = round(float(cos[np.argmax(cos)]), 9)
        s = want.setdefault(c, {"n": 0, "labels": set(), "rep": None, "tight": 0})
        s["n"] += 1
        s["labels"].add(r.label)
        s["rep"] = r.vec_id if s["rep"] is None else min(s["rep"], r.vec_id)
        s["tight"] += cos9 >= TIGHT_COS
    got = {r.centroid: r for r in embedding_cluster_profile(spark, SF).collect()}
    assert set(got) == set(want)
    for c, w in want.items():
        g = got[c]
        assert (g.n_members, g.n_labels, g.rep_vec_id, g.n_tight) == (
            w["n"],
            len(w["labels"]),
            w["rep"],
            w["tight"],
        ), c
    # non-degenerate: the tightness threshold splits at least one cell
    assert any(0 < w["tight"] < w["n"] for w in want.values())
