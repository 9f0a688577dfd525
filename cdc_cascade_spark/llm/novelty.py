"""Cross-corpus novelty screen: which incoming documents are near-dups
of a standing base corpus?

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): the
daily-ingest question is not "which pairs inside the corpus match" but
"which of TODAY'S documents already exist in the base" — the batch
variant of the streaming admission screen (streaming/enrich.py) and
the query face of the persistent MinHash index (llm/dedup_index.py).

The registered query models the split deterministically on the fixed
catalog table (``doc_id % 10 = 0`` is the incoming batch, the rest is
the base corpus) so the cross-slice band join is expressible as a
single ANSI statement for the DuckDB oracle.

Scale shape (100 TB base, small daily batch): both sides reduce to
16-long MinHash signatures before anything joins (the shared
session-cached band relation — built once, reused by every dedup
query); the band join touches only bucket collisions, never
base × batch; exact-Jaccard verification touches candidate pairs only.
With the base side served by the persistent bucketed index
(dedup_index.py) the base corpus is never re-shuffled at all — this
query IS that probe, collapsed onto one table for oracle coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.functions.hashing import (
    LSH_BANDS,
    band_key_sql,
    minhash_signature_sql,
)
from cdc_cascade_spark.llm.dedup import (
    JACCARD_THRESHOLD,
    _docs_prepared_cached,
    minhash_bands_cached,
)
from cdc_cascade_spark.llm.prep import DOCS_CTE, jaccard, jaccard_sql

# Every 10th doc is "today's batch"; the rest is the standing corpus.
BATCH_MOD = 10


def minhash_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch-document novelty: (doc_id, n_neardups, is_novel) for
    every doc in the incoming slice, ``n_neardups`` = verified base
    near-dups (Jaccard >= threshold), ``is_novel`` = none found."""
    bands = minhash_bands_cached(spark, sf_dir)
    batch_b = bands.filter(F.col("doc_id") % BATCH_MOD == 0).select(
        F.col("doc_id").alias("doc_new"), "band", "bkey"
    )
    base_b = bands.filter(F.col("doc_id") % BATCH_MOD != 0).select(
        F.col("doc_id").alias("doc_base"), "band", "bkey"
    )
    cand = (
        batch_b.join(base_b, ["band", "bkey"])
        .select("doc_new", "doc_base")
        .distinct()
    )
    prepared = _docs_prepared_cached(spark, sf_dir).select("doc_id", "hset")
    pa = prepared.select(F.col("doc_id").alias("doc_new"), F.col("hset").alias("sh_a"))
    pb = prepared.select(F.col("doc_id").alias("doc_base"), F.col("hset").alias("sh_b"))
    matches = (
        cand.join(pa, "doc_new")
        .join(pb, "doc_base")
        .filter(jaccard(F.col("sh_a"), F.col("sh_b")) >= JACCARD_THRESHOLD)
        .groupBy("doc_new")
        .agg(F.count(F.lit(1)).alias("n_neardups"))
    )
    batch_docs = prepared.filter(F.col("doc_id") % BATCH_MOD == 0).select("doc_id")
    return (
        batch_docs.join(
            matches.withColumnRenamed("doc_new", "doc_id"), "doc_id", "left"
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_neardups"), F.lit(0)).cast("bigint").alias(
                "n_neardups"
            ),
            F.coalesce(F.col("n_neardups"), F.lit(0)).eqNullSafe(0).alias(
                "is_novel"
            ),
        )
    )


def _novelty_oracle_sql() -> str:
    sig = minhash_signature_sql("shingles")
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS band, {band_key_sql('sig', i)} AS bkey FROM sigs"
        for i in range(LSH_BANDS)
    )
    return (
        DOCS_CTE
        + f"""
, sigs AS (SELECT doc_id, {sig} AS sig FROM sh)
, bands AS (
{band_selects}
)
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_base
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id % {BATCH_MOD} = 0 AND b.doc_id % {BATCH_MOD} <> 0
)
, matches AS (
  SELECT c.doc_new, COUNT(*) AS n_neardups
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_new
  JOIN sh sb ON sb.doc_id = c.doc_base
  WHERE {jaccard_sql('sa.shingles', 'sb.shingles')} >= {JACCARD_THRESHOLD}
  GROUP BY c.doc_new
)
SELECT d.doc_id,
       CAST(COALESCE(m.n_neardups, 0) AS BIGINT) AS n_neardups,
       COALESCE(m.n_neardups, 0) = 0 AS is_novel
FROM sh d
LEFT JOIN matches m ON m.doc_new = d.doc_id
WHERE d.doc_id % {BATCH_MOD} = 0
"""
    )


ORACLE_MINHASH_NOVELTY = _novelty_oracle_sql()


QUERIES: dict[str, tuple] = {
    "minhash_novelty": (minhash_novelty, ORACLE_MINHASH_NOVELTY),
}
