"""Persistent IVF cell index (llm/ivf_index.py): probe ≡ in-memory
ann_ivf_topk, partition pruning on disk, append ≡ rebuild.
"""

from __future__ import annotations

import glob

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _query(spark):
    from cdc_cascade_spark.catalog import load_table

    r = (
        load_table(spark, SF, "embeddings")
        .orderBy("vec_id")
        .limit(1)
        .select("vec_id", "embedding")
        .collect()[0]
    )
    return int(r.vec_id), np.asarray(r.embedding, dtype=np.float32).astype(
        np.float64
    )


def test_ivf_index_probe_matches_inmemory(spark, tmp_path):
    from cdc_cascade_spark.llm.ivf_index import ann_against_ivf_index, write_ivf_index
    from cdc_cascade_spark.llm.similarity import ann_ivf_topk

    idx = str(tmp_path / "ivf")
    write_ivf_index(spark, SF, idx)
    qid, qvec = _query(spark)
    got = [
        (r.vec_id, r.label, r.centroid, r.cosine)
        for r in ann_against_ivf_index(spark, idx, qvec, qid).collect()
    ]
    want = [
        (r.vec_id, r.label, r.centroid, r.cosine)
        for r in ann_ivf_topk(spark, SF).collect()
    ]
    assert got == want and got


def test_ivf_index_prunes_cell_partitions(spark, tmp_path):
    from cdc_cascade_spark.llm.ivf_index import (
        _load_centroids,
        ann_against_ivf_index,
        probe_cells,
        write_ivf_index,
    )
    from cdc_cascade_spark.llm.similarity import IVF_NPROBE
    from cdc_cascade_spark.plans.explain import physical_plan

    idx = str(tmp_path / "ivf")
    write_ivf_index(spark, SF, idx)
    qid, qvec = _query(spark)
    df = ann_against_ivf_index(spark, idx, qvec, qid)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan and "centroid" in plan, plan[:2000]

    cids, C, normC = _load_centroids(spark, idx)
    probes = set(probe_cells(qvec, cids, C, normC, IVF_NPROBE))
    n_total = len(glob.glob(f"{idx}/cells/centroid=*/*.parquet"))
    n_probed = sum(
        len(glob.glob(f"{idx}/cells/centroid={c}/*.parquet")) for c in probes
    )
    assert 0 < n_probed < n_total, (n_probed, n_total)
    n_dirs = len(glob.glob(f"{idx}/cells/centroid=*"))
    assert len(probes) <= IVF_NPROBE < n_dirs


def test_ivf_index_append_equals_rebuild(spark, tmp_path):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.ivf_index import (
        ann_against_ivf_index,
        append_ivf_index,
        train_ivf_centroids,
        write_ivf_index,
        _assigned,
        _load_centroids,
    )

    emb = load_table(spark, SF, "embeddings")
    mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).collect()[0][0]

    full = str(tmp_path / "full")
    write_ivf_index(spark, SF, full)

    # incremental: train on the FULL corpus's seed set (centroids are
    # the first vectors by vec_id — present in the base half), build
    # cells from the base half only, then append the rest
    incr = str(tmp_path / "incr")
    train_ivf_centroids(spark, SF, incr)
    cids, C, normC = _load_centroids(spark, incr)
    base = emb.filter(F.col("vec_id") <= mid)
    rest = emb.filter(F.col("vec_id") > mid)
    _assigned(base, cids, C, normC).write.partitionBy("centroid").mode(
        "overwrite"
    ).parquet(f"{incr}/cells")
    append_ivf_index(rest, incr)

    qid, qvec = _query(spark)
    a = [
        (r.vec_id, r.label, r.centroid, r.cosine)
        for r in ann_against_ivf_index(spark, full, qvec, qid).collect()
    ]
    b = [
        (r.vec_id, r.label, r.centroid, r.cosine)
        for r in ann_against_ivf_index(spark, incr, qvec, qid).collect()
    ]
    assert a == b and a

    # every vector's cell assignment matches the full rebuild exactly
    fa = {
        (r.vec_id, r.centroid)
        for r in spark.read.parquet(f"{full}/cells").select("vec_id", "centroid").collect()
    }
    ia = {
        (r.vec_id, r.centroid)
        for r in spark.read.parquet(f"{incr}/cells").select("vec_id", "centroid").collect()
    }
    assert fa == ia


def test_ivf_index_empty_corpus(spark, tmp_path):
    """Empty-partition robustness for the unregistered lifecycle (the
    registered-query empty sweep doesn't cover it): building from an
    empty corpus yields an index whose probe returns a typed empty
    frame, and appending real data to a centroid-less index raises a
    clear error instead of an argmax crash."""
    import numpy as np
    import pytest
    from cdc_cascade_spark.catalog import TABLES, load_table
    from cdc_cascade_spark.llm.ivf_index import (
        _load_centroids,
        ann_against_ivf_index,
        append_ivf_index,
        write_ivf_index,
    )

    empty_dir = str(tmp_path / "sf_empty")
    for t in ("embeddings",):
        load_table(spark, SF, t).limit(0).write.mode("overwrite").parquet(
            f"{empty_dir}/{t}.parquet"
        )
    idx = str(tmp_path / "ivf_empty")
    write_ivf_index(spark, empty_dir, idx)
    cids, C, normC = _load_centroids(spark, idx)
    assert len(cids) == 0
    out = ann_against_ivf_index(spark, idx, np.zeros(64), qid=0)
    assert out.collect() == []
    batch = load_table(spark, SF, "embeddings").limit(5)
    with pytest.raises(ValueError, match="no centroids"):
        append_ivf_index(batch, idx)


def test_ivf_probe_contract_violation_fails_loudly(spark, tmp_path):
    """r13 advice: the partition-pruned 1-row query lookup reads ONLY
    the query's own computed cell, so a caller violating the
    stored-embedding contract (qvec is NOT the stored embedding of
    qid) can make the lookup empty — and an empty 1-row broadcast
    would silently produce an empty top-k. The probe must raise
    instead."""
    import pytest
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.ivf_index import (
        _load_centroids,
        ann_against_ivf_index,
        probe_cells,
        write_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    write_ivf_index(spark, SF, idx)
    qid, qvec = _query(spark)

    # a qid that exists nowhere in the corpus: empty lookup → raise
    with pytest.raises(ValueError, match="silently empty"):
        ann_against_ivf_index(spark, idx, qvec, qid=-999_999)

    # a (qvec, qid) MISMATCH whose cells differ: qid's row is stored,
    # but the probe prunes to qvec's cell, where qid does not live
    cids, C, normC = _load_centroids(spark, idx)
    cell_of = {
        int(r.vec_id): int(r.centroid)
        for r in spark.read.parquet(f"{idx}/cells")
        .select("vec_id", "centroid")
        .collect()
    }
    qcell = probe_cells(qvec, cids, C, normC, 1)[0]
    other = next(
        (
            r
            for r in load_table(spark, SF, "embeddings")
            .orderBy("vec_id")
            .collect()
            if cell_of[int(r.vec_id)] != qcell
        ),
        None,
    )
    assert other is not None, "testdata spans >1 IVF cell"
    with pytest.raises(ValueError, match="silently empty"):
        ann_against_ivf_index(spark, idx, qvec, qid=int(other.vec_id))

    # the contract-honoring call still serves
    assert ann_against_ivf_index(spark, idx, qvec, qid).count() > 0


def test_ivf_probe_degenerate_nprobe_raises_valueerror(spark, tmp_path):
    """r14 advice: nprobe <= 0 used to die with a bare IndexError at
    ``probes[0]`` before the contract guard could speak (and the
    pre-r14 shape silently returned a typed empty top-k, hiding the
    caller bug). A degenerate probe width is a caller error with a
    name."""
    import pytest

    from cdc_cascade_spark.llm.ivf_index import (
        ann_against_ivf_index,
        write_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    write_ivf_index(spark, SF, idx)
    qid, qvec = _query(spark)

    for bad in (0, -3):
        with pytest.raises(ValueError, match="nprobe must be >= 1"):
            ann_against_ivf_index(spark, idx, qvec, qid, nprobe=bad)

    # the guard sits before any IO: a bogus path still names the real
    # error, not a scan failure
    with pytest.raises(ValueError, match="nprobe must be >= 1"):
        ann_against_ivf_index(spark, str(tmp_path / "nope"), qvec, qid, nprobe=0)
