"""Probe-path dense ANN (llm/ann_indexed.py): oracle parity over the
persistent bucket-partitioned layout, identity to the ad-hoc face,
partition pruning, session layout reuse."""

from __future__ import annotations

import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _duck(sf_dir: str):
    from cdc_cascade_spark.testing.parity import duckdb_connect

    return duckdb_connect(sf_dir)


def _rows(df):
    return sorted(
        (r.vec_id, r.label, int(r.bucket), r.cosine) for r in df.collect()
    )


@pytest.mark.parametrize("sf", SFS)
def test_ann_indexed_oracle_agrees(spark, sf):
    """The full lifecycle — partitioned build → pruned probe → rerank
    — must reproduce ann_lsh_topk's declarative SQL spec exactly (the
    oracle is ORACLE_LSH_TOPK verbatim)."""
    from cdc_cascade_spark.llm.ann_indexed import (
        ann_lsh_indexed,
    )
    from cdc_cascade_spark.llm.similarity import ORACLE_LSH_TOPK
    from cdc_cascade_spark.testing.parity import compare

    got = ann_lsh_indexed(spark, sf).toPandas()
    want = _duck(sf).execute(ORACLE_LSH_TOPK).df()
    r = compare("ann_lsh_indexed", got, want)
    assert r.ok, r
    assert len(got) > 0


def test_ann_indexed_equals_adhoc_face(spark):
    from cdc_cascade_spark.llm.ann_indexed import ann_lsh_indexed
    from cdc_cascade_spark.llm.similarity import ann_lsh_topk

    sf = SFS[0]
    assert _rows(ann_lsh_indexed(spark, sf)) == _rows(
        ann_lsh_topk(spark, sf)
    )


def test_ann_indexed_plan_partition_prunes(spark):
    """EVERY scan of the probe — the probed-buckets rerank AND the
    1-row query lookup — must carry a bucket PartitionFilter; the
    query-row lookup used to be the one full-layout scan in the plan
    (r13 verdict: the IVF pin, extended to the LSH face)."""
    import re

    from cdc_cascade_spark.llm.ann_indexed import ann_lsh_indexed
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(ann_lsh_indexed(spark, SFS[0]))
    assert "PartitionFilters" in plan and "bucket" in plan, plan[:2000]
    scans = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert scans and all("bucket" in s for s in scans), scans


def test_lsh_probe_contract_violation_fails_loudly(spark, tmp_path):
    """A caller passing a qvec that is NOT the stored embedding of qid
    (or kernel drift between _query_probe_buckets and the build's
    _bucket_udf) makes the pruned 1-row lookup empty — that must raise,
    not silently return an empty top-k (the ivf_index loud-fail,
    extended to the LSH face)."""
    import numpy as np

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.similarity import (
        ann_lsh_topk_bucketed,
        write_lsh_bucketed,
    )

    idx = str(tmp_path / "lsh")
    write_lsh_bucketed(spark, SFS[0], idx)
    emb = load_table(spark, SFS[0], "embeddings")
    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    qvec = np.array(qrow.embedding, dtype=np.float64)

    # contract honored → serves
    assert ann_lsh_topk_bucketed(spark, idx, qvec, int(qrow.vec_id)).count()

    # absent vec_id → loud
    with pytest.raises(ValueError, match="not found in its computed"):
        ann_lsh_topk_bucketed(spark, idx, qvec, -999_999)

    # non-stored qvec whose own bucket differs from qid's stored
    # bucket → loud (flip the vector: every hyperplane sign inverts,
    # so the computed bucket is the complement, never qid's)
    with pytest.raises(ValueError, match="not found in its computed"):
        ann_lsh_topk_bucketed(spark, idx, -qvec, int(qrow.vec_id))


def test_session_layout_cache_reuses_the_build(spark):
    from cdc_cascade_spark.llm.ann_indexed import (
        ann_lsh_indexed,
        lsh_layout_dir,
    )

    sf = SFS[0]
    assert lsh_layout_dir(spark, sf) == lsh_layout_dir(spark, sf)
    a = _rows(ann_lsh_indexed(spark, sf))
    b = _rows(ann_lsh_indexed(spark, sf))
    assert a == b and a


def _ivf_rows(df):
    return sorted(
        (r.vec_id, r.label, int(r.centroid), r.cosine) for r in df.collect()
    )


@pytest.mark.parametrize("sf", SFS)
def test_ann_ivf_indexed_oracle_agrees(spark, sf):
    """The trained-IVF lifecycle — centroid train → partitioned build
    → pruned probe → rerank — must reproduce ann_ivf_topk's
    declarative SQL spec exactly (the oracle is ORACLE_IVF_TOPK
    verbatim)."""
    from cdc_cascade_spark.llm.ann_indexed import ann_ivf_indexed
    from cdc_cascade_spark.llm.similarity import ORACLE_IVF_TOPK
    from cdc_cascade_spark.testing.parity import compare

    got = ann_ivf_indexed(spark, sf).toPandas()
    want = _duck(sf).execute(ORACLE_IVF_TOPK).df()
    r = compare("ann_ivf_indexed", got, want)
    assert r.ok, r
    assert len(got) > 0


def test_ann_ivf_indexed_equals_adhoc_face(spark):
    from cdc_cascade_spark.llm.ann_indexed import ann_ivf_indexed
    from cdc_cascade_spark.llm.similarity import ann_ivf_topk

    sf = SFS[0]
    assert _ivf_rows(ann_ivf_indexed(spark, sf)) == _ivf_rows(
        ann_ivf_topk(spark, sf)
    )


def test_ann_ivf_indexed_plan_partition_prunes(spark):
    """Both scans of the probe — the nprobe rerank AND the 1-row query
    lookup — must carry a centroid PartitionFilter; the query-row
    lookup used to be the one full-layout scan in the plan."""
    from cdc_cascade_spark.llm.ann_indexed import ann_ivf_indexed
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(ann_ivf_indexed(spark, SFS[0]))
    assert "PartitionFilters" in plan and "centroid" in plan, plan[:2000]
    import re

    scans = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert scans and all("centroid" in s for s in scans), scans


def test_ivf_session_layout_cache_reuses_the_build(spark):
    from cdc_cascade_spark.llm.ann_indexed import (
        ann_ivf_indexed,
        ivf_layout_dir,
    )

    sf = SFS[0]
    assert ivf_layout_dir(spark, sf) == ivf_layout_dir(spark, sf)
    a = _ivf_rows(ann_ivf_indexed(spark, sf))
    b = _ivf_rows(ann_ivf_indexed(spark, sf))
    assert a == b and a
