"""Deterministic train/validation/test split assignment.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension). Every
training run starts by carving the corpus into train/val/test — and at
100 TB the ONLY workable mechanism is a stateless hash split: no
global shuffle, no sampling state, no coordination; any worker can
recompute any document's split from its id alone, the assignment is
stable under corpus growth (new documents never move old ones between
splits — the property random permutation splits lack), and
re-ingestion lands a document in the same split forever (no
train→test leakage across runs).

``corpus_split`` assigns by md5-hash band over a salted document id:

    split_ppm = token_hash('split:' || doc_id) mod 1e6
    split     = 'test'  if split_ppm <  TEST_PPM
                'val'   if split_ppm <  TEST_PPM + VAL_PPM
                'train' otherwise

All integers end to end (the ``stratified_sample`` hash-threshold
discipline), so both engines agree bit-for-bit. The salt keeps this
split independent of every other hash-keyed decision in the engine
(sampling, sharding) — a document sampled by ``stratified_sample``
is not thereby biased into a split.

Output: one row per document, ``(doc_id, lang, split, split_ppm)`` —
the ppm column makes the assignment auditable (a reviewer can verify
the band arithmetic per row) and lets a consumer re-cut at a finer
threshold without recomputing hashes.

Scale shape: map-only — a projection over the documents scan; no
shuffle, no state, no driver data.

Built in r8 after that round's 50-slot driver window was already
committed (the established late-surface pattern); registered in
r9. tests/test_splits_vecquality.py pins the oracle agreement and the
model invariants alongside the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash, token_hash_sql

# Parts-per-million band widths: 2% test, 2% val, 96% train — wide
# enough that all three splits are populated at the 500-doc SFs.
TEST_PPM = 20_000
VAL_PPM = 20_000
_SALT = "split:"


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document deterministic split assignment over ``documents``."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    ppm = token_hash(
        F.concat(F.lit(_SALT), F.col("doc_id").cast("string"))
    ) % 1_000_000
    split = (
        F.when(F.col("split_ppm") < TEST_PPM, F.lit("test"))
        .when(F.col("split_ppm") < TEST_PPM + VAL_PPM, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return docs.withColumn("split_ppm", ppm.cast("bigint")).select(
        "doc_id", "lang", split.alias("split"), "split_ppm"
    )


_SALTED_ID_SQL = f"'{_SALT}' || CAST(doc_id AS VARCHAR)"
_PPM_SQL = f"({token_hash_sql(_SALTED_ID_SQL)}) % 1000000"

ORACLE_CORPUS_SPLIT = f"""
SELECT doc_id, lang,
       CASE WHEN {_PPM_SQL} < {TEST_PPM} THEN 'test'
            WHEN {_PPM_SQL} < {TEST_PPM + VAL_PPM} THEN 'val'
            ELSE 'train' END AS split,
       CAST({_PPM_SQL} AS BIGINT) AS split_ppm
FROM documents
"""


QUERIES: dict[str, tuple] = {
    "corpus_split": (corpus_split, ORACLE_CORPUS_SPLIT),
}
