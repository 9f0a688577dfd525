"""Persistent IVF cell index: train → build → append → probe.

Completes the ANN index-lifecycle family: ``llm/similarity.py`` proves
the bucketed layout for LSH (``write_lsh_bucketed`` et al.) and
``llm/dedup_index.py`` for MinHash bands; this module does the same for
the IVF coarse quantizer — the layout behind ``ann_ivf_topk``'s 100 TB
claim ("the centroid id is the partition key").

- ``train_ivf_centroids``: collects the tiny centroid matrix (the same
  deterministic seed set as ``ann_ivf_topk`` — first ``IVF_CENTROIDS``
  vectors by vec_id, ≤ a few KB) and persists it under
  ``out_path/centroids`` so the index is self-contained: append and
  probe read the TRAINED centroids back rather than re-deriving them,
  which is what makes incremental ingest assignment-stable.
- ``write_ivf_index``: one pass assigns every vector to its nearest
  centroid (map-side Arrow kernel, no shuffle before the write) and
  materializes ``out_path/cells/centroid=<id>/part-*.parquet`` —
  Hive-style partition pruning makes a probe read only its probed
  cells' directories.
- ``append_ivf_index``: assigns a new batch with the SAME trained
  centroids and appends into the cell directories — O(batch) ingest,
  no rebuild; append ≡ rebuild is pinned by test.
- ``ann_against_ivf_index``: the probe — ranks cells by query-centroid
  cosine driver-side (centroid matrix is local), reads only
  ``nprobe`` cell partitions, exact cosine + top-k inside them.
  Results are identical to the in-memory ``ann_ivf_topk`` for the
  default (query, nprobe) — pinned by test.

Oracle-gate exclusion: path-dependent physical layout (same reasoning
as dedup_index.py / the bucketed-LSH lifecycle) — the correctness gate
is equivalence to the registered, oracle-checked ``ann_ivf_topk`` plus
append-vs-rebuild and partition-pruning plan pins in
tests/test_ivf_index.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.similarity import (
    IVF_CENTROIDS,
    IVF_NPROBE,
    TOPK,
    _dot_pd,
    _empty_ann,
    _stack_f64,
    _with_norm,
)


def train_ivf_centroids(
    spark: SparkSession, sf_dir: str, out_path: str
) -> None:
    """Persist the centroid seed set under ``out_path/centroids``."""
    emb = load_table(spark, sf_dir, "embeddings")
    (
        emb.orderBy("vec_id")
        .limit(IVF_CENTROIDS)
        .select(F.col("vec_id").alias("centroid"), "embedding")
        .write.mode("overwrite")
        .parquet(f"{out_path}/centroids")
    )


def _load_centroids(spark: SparkSession, out_path: str):
    rows = sorted(
        spark.read.parquet(f"{out_path}/centroids").collect(),
        key=lambda r: r.centroid,
    )
    cids = np.array([r.centroid for r in rows], dtype=np.int64)
    if not rows:  # empty corpus trained an empty index — np.stack([]) raises
        return cids, np.zeros((0, 64)), np.zeros(0)
    C = np.stack(
        [np.asarray(r.embedding, dtype=np.float32).astype(np.float64) for r in rows]
    )
    normC = np.sqrt(np.add.accumulate(C * C, axis=1)[:, -1])
    return cids, C, normC


def _assign_udf(cids: np.ndarray, C: np.ndarray, normC: np.ndarray):
    @pandas_udf("long")
    def assign_pd(a: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        E = _stack_f64(a)
        dots = np.add.accumulate(E[:, None, :] * C[None, :, :], axis=2)[:, :, -1]
        normE = np.sqrt(np.add.accumulate(E * E, axis=1)[:, -1])
        cos = dots / (normE[:, None] * normC[None, :])
        # first maximum + ascending cids → ties to smallest centroid id,
        # the ann_ivf_topk convention
        return pd.Series(cids[np.argmax(cos, axis=1)])

    return assign_pd


def _assigned(emb: DataFrame, cids, C, normC) -> DataFrame:
    if len(cids) == 0 and not emb.isEmpty():
        raise ValueError(
            "IVF index has no centroids (trained on an empty corpus) — "
            "re-train before assigning a non-empty batch"
        )
    assign_pd = _assign_udf(cids, C, normC)
    return _with_norm(emb).select(
        "vec_id",
        "label",
        "embedding",
        "norm",
        assign_pd(F.col("embedding")).alias("centroid"),
    )


def write_ivf_index(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Train + build: centroids under ``centroids/``, the assigned
    corpus under ``cells/`` partitioned by centroid id."""
    train_ivf_centroids(spark, sf_dir, out_path)
    cids, C, normC = _load_centroids(spark, out_path)
    emb = load_table(spark, sf_dir, "embeddings")
    _assigned(emb, cids, C, normC).write.partitionBy("centroid").mode(
        "overwrite"
    ).parquet(f"{out_path}/cells")


def append_ivf_index(emb_batch: DataFrame, out_path: str) -> None:
    """Incremental ingest: assign the batch with the TRAINED centroids
    (read back from the index — not re-derived, so assignments can
    never drift from the build) and append into the cell layout."""
    spark = emb_batch.sparkSession
    cids, C, normC = _load_centroids(spark, out_path)
    _assigned(emb_batch, cids, C, normC).write.partitionBy("centroid").mode(
        "append"
    ).parquet(f"{out_path}/cells")


def probe_cells(qvec: np.ndarray, cids, C, normC, nprobe: int) -> list[int]:
    """Cells ranked by query-centroid cosine (desc, ties to smaller id)."""
    q = np.asarray(qvec, dtype=np.float64)
    qdots = np.add.accumulate(C * q[None, :], axis=1)[:, -1]
    qnorm = np.sqrt(np.add.accumulate(q * q)[-1])
    qcos = qdots / (normC * qnorm)
    order = sorted(range(len(cids)), key=lambda i: (-qcos[i], cids[i]))
    return [int(cids[i]) for i in order[:nprobe]]


def ann_against_ivf_index(
    spark: SparkSession,
    index_path: str,
    qvec: np.ndarray,
    qid: int,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Exact-cosine top-k inside the probed cells of the persisted
    layout. The ``centroid IN (probes)`` filter is a partition filter —
    only nprobe of the IVF_CENTROIDS cell directories are read.

    Caller contract: ``qvec`` is the STORED embedding of ``qid``
    (float32 → float64, the `_query` convention) — that is what lets
    the query row's own cell be computed driver-side with the same
    fold arithmetic the build's assignment kernel used (``probe_cells``
    at ``nprobe=1`` ranks by the identical (-cos, cid) key), so the
    1-row qrow lookup below is partition-pruned to one directory
    instead of scanning every cell (r13: the probe used to pay a
    full-layout scan just to fetch the query's norm — the one
    corpus-sized read in an otherwise pruned plan)."""
    if nprobe < 1:
        # r14 advice: probes[0] below would otherwise die with a bare
        # IndexError before the contract-violation guard can speak
        # (the pre-r14 shape returned a typed empty top-k for
        # nprobe=0, which silently hid a caller bug — a degenerate
        # probe width is a caller error, name it).
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    cids, C, normC = _load_centroids(spark, index_path)
    if len(cids) == 0:
        return _empty_ann(spark, "centroid", "bigint")
    probes = probe_cells(qvec, cids, C, normC, nprobe)
    # the query's own cell is by definition the top-ranked probe —
    # probe_cells orders by (-cos, cid), so probes[0] IS the nprobe=1
    # answer (re-running the full centroid ranking for it was a
    # per-probe numpy redundancy, review finding r14)
    qcell = probes[0]
    cells = spark.read.parquet(f"{index_path}/cells")
    # ONE job fetches the query row from its pruned cell directory and
    # the collected values seed the broadcast frame below — the r13
    # isEmpty() draft ran the pruned scan twice (once for the guard,
    # once when the crossJoin materialized its broadcast).
    qrows = (
        cells.filter(F.col("centroid") == qcell)
        .filter(F.col("vec_id") == qid)
        .select(F.col("embedding").alias("qvec"), F.col("norm").alias("qnorm"))
        .take(1)
    )
    # r13 advice: the pruned lookup reads ONE cell directory, so a
    # caller violating the stored-embedding contract (or future drift
    # between probe_cells and the build's assignment kernel) would make
    # the lookup EMPTY — and an empty 1-row broadcast silently yields
    # an empty top-k, the worst failure shape. Fail loudly instead.
    if not qrows:
        raise ValueError(
            f"IVF probe: vec_id={qid} not found in its computed cell "
            f"centroid={qcell} of {index_path}/cells — either the "
            "caller contract (qvec IS the stored embedding of qid) is "
            "violated, or probe_cells drifted from the build's "
            "assignment kernel. Refusing to return a silently empty "
            "top-k."
        )
    qrow = spark.createDataFrame(
        qrows, "qvec array<float>, qnorm double"
    )
    return (
        cells.filter(F.col("centroid").isin(probes))
        .filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            "label",
            "centroid",
            F.round(
                _dot_pd(F.col("embedding"), F.col("qvec"))
                / (F.col("norm") * F.col("qnorm")),
                9,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOPK)
    )
