"""Embedding-cluster profile: the corpus-structure report over the IVF
coarse quantizer.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension). Once a
corpus's embeddings are assigned to coarse centroids (the IVF/k-means
machinery the ANN family already maintains — llm/similarity.py), the
report a data team reads is per-cluster composition: how many vectors
landed in each cell, how label-pure the cell is, and how tight the
members sit around their centroid. That drives cell-size balancing
(skewed cells break IVF probe cost), mixture auditing ("cluster 3 is
90% one label"), and near-duplicate hotspot detection.

Output: ``(centroid, n_members, n_labels, rep_vec_id, n_tight)`` —
``rep_vec_id`` is the smallest member id (a deterministic exemplar),
``n_tight`` counts members whose rounded cosine to their centroid is
at least ``TIGHT_COS``. Every output column is an exact integer: the
per-member cosine exists only inside a comparison, and the cosines are
bit-identical across engines (strict left-to-right float64 fold +
round-to-9, the ANN family's determinism contract), so the comparison
— and therefore the count — is too. No float ever accumulates.

Assignment is the EXACT rule ``ann_ivf_topk`` uses (shared
``_assign_udf``: full-precision cosine argmax, ties to the smallest
centroid id; centroids = first ``IVF_CENTROIDS`` vec_ids), so the
profile describes the same partitioning the ANN probes — and the
oracle replays it with the same row_number trick the verified IVF
oracles use.

Scale shape: centroid matrix is a bounded driver collect
(IVF_CENTROIDS rows, the train-stage pattern); assignment is a
map-side Arrow kernel (no shuffle); the per-member cosine joins the
8-row broadcast centroid table; the rollup is one shuffle on the
centroid key with map-side partial aggregation — reducer count =
cell count at any corpus size.

Built in r8 after that round's 50-slot driver window was already
committed (the established late-surface pattern); registered in
r9. tests/test_clusterprof.py pins the oracle agreement and the
model invariants alongside the driver row.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.similarity import (
    _DOT_SQL,
    _assign_udf,
    _dot,
    _with_norm,
    IVF_CENTROIDS,
)

# Rounded-cosine tightness threshold: chosen so the testdata's weakly
# clustered embeddings (typical member-to-centroid cosines 0.0-0.35)
# split each cell rather than saturating the count either way.
TIGHT_COS = 0.2


def embedding_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell composition of the IVF coarse partitioning."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.orderBy("vec_id")
        .limit(IVF_CENTROIDS)
        .select("vec_id", "embedding")
        .collect()
    )
    if not cent_rows:
        return spark.createDataFrame(
            [],
            "centroid long, n_members long, n_labels long, "
            "rep_vec_id long, n_tight long",
        )
    cids = np.array([r.vec_id for r in cent_rows], dtype=np.int64)
    C = np.stack([np.asarray(r.embedding) for r in cent_rows]).astype(np.float64)
    assign = _assign_udf(cids, C)
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(int(r.vec_id), [float(x) for x in r.embedding]) for r in cent_rows],
            "centroid long, cvec array<float>",
        )
    )
    assigned = _with_norm(emb).select(
        "vec_id",
        "label",
        "embedding",
        "norm",
        assign(F.col("embedding")).alias("centroid"),
    )
    cos9 = F.round(
        _dot(F.col("embedding"), F.col("cvec"))
        / (F.col("norm") * F.sqrt(_dot(F.col("cvec"), F.col("cvec")))),
        9,
    )
    return (
        assigned.join(cent_df, "centroid")
        .select("centroid", "vec_id", "label", cos9.alias("cos9"))
        .groupBy("centroid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.countDistinct("label").cast("bigint").alias("n_labels"),
            F.min("vec_id").alias("rep_vec_id"),
            F.sum((F.col("cos9") >= TIGHT_COS).cast("bigint")).alias("n_tight"),
        )
    )


def _cluster_profile_oracle_sql() -> str:
    cos = (
        f"({_DOT_SQL.format(a='e.embedding', b='c.cvec')} / "
        f"(sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')}) * "
        f"sqrt({_DOT_SQL.format(a='c.cvec', b='c.cvec')})))"
    )
    return f"""
WITH cent AS MATERIALIZED (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
  ORDER BY vec_id LIMIT {IVF_CENTROIDS}
),
scored AS MATERIALIZED (
  SELECT e.vec_id, e.label, c.cid, round({cos}, 9) AS cos9,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id ORDER BY {cos} DESC, c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, label, cid AS centroid, cos9 FROM scored WHERE rn = 1
)
SELECT centroid,
       COUNT(*)::BIGINT AS n_members,
       COUNT(DISTINCT label)::BIGINT AS n_labels,
       MIN(vec_id) AS rep_vec_id,
       SUM(CASE WHEN cos9 >= {TIGHT_COS} THEN 1 ELSE 0 END)::BIGINT AS n_tight
FROM assigned GROUP BY centroid
"""


ORACLE_CLUSTER_PROFILE = _cluster_profile_oracle_sql()


QUERIES: dict[str, tuple] = {
    "embedding_cluster_profile": (embedding_cluster_profile, ORACLE_CLUSTER_PROFILE),
}
