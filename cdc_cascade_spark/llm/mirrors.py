"""Cross-source duplication matrix: which sources mirror each other.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension). Web
corpora are full of mirrors — the same article re-hosted across
domains — and the curation decision ("keep one domain, drop the
copies, or down-weight both") needs the duplication structure BETWEEN
sources, not just per-document pairs. This operator rolls the
oracle-verified MinHash near-dup pairs (``llm/dedup.py::
dedup_minhash_lsh`` — banded signatures, candidate join, exact-Jaccard
verify) up to the source level:

    (source_a, source_b, n_pairs, n_docs_a, n_docs_b)

one row per unordered source pair with at least one verified near-dup
pair between them (``source_a <= source_b`` lexicographically;
same-source rows measure within-source duplication). ``n_docs_a`` /
``n_docs_b`` count the DISTINCT documents of each side involved, so a
single boilerplate page mirrored 50 times reads differently from 50
independent article pairs.

Scale shape: the pair relation is already candidate-bounded (never
all-pairs); attaching sources is two id-keyed joins against the
(doc_id, source) projection — 20 B/row — and the rollup keys on
source pairs (domains², sparse). Nothing here is corpus-sized beyond
the verified pair relation itself.

The oracle embeds the verified-pairs oracle VERBATIM as a
materialized CTE (the curate_corpus composition pattern), so the
matrix cannot drift from the pair query the driver checks.

Built in r8 after that round's 50-slot driver window was already
committed (the established late-surface pattern); registered in
r9. tests/test_mirrors.py pins the oracle agreement and the
model invariants alongside the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.dedup import ORACLE_MINHASH, dedup_minhash_lsh


def source_dedup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair rollup of the verified MinHash near-dup pairs."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    with_sources = (
        pairs.join(src.select(F.col("doc_id").alias("doc_a"),
                              F.col("source").alias("src_a")), "doc_a")
        .join(src.select(F.col("doc_id").alias("doc_b"),
                         F.col("source").alias("src_b")), "doc_b")
    )
    canon = with_sources.select(
        F.least("src_a", "src_b").alias("source_a"),
        F.greatest("src_a", "src_b").alias("source_b"),
        # docs keyed to the canonical side so distinct counts stay
        # side-consistent when least/greatest swaps the columns
        F.when(F.col("src_a") <= F.col("src_b"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("da"),
        F.when(F.col("src_a") <= F.col("src_b"), F.col("doc_b"))
        .otherwise(F.col("doc_a"))
        .alias("db"),
    )
    return canon.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("da").cast("bigint").alias("n_docs_a"),
        F.countDistinct("db").cast("bigint").alias("n_docs_b"),
    )


ORACLE_SOURCE_DEDUP_MATRIX = f"""
WITH pairs AS MATERIALIZED (SELECT * FROM ({ORACLE_MINHASH}) t),
src AS (SELECT doc_id, source FROM documents),
canon AS (
  SELECT LEAST(sa.source, sb.source) AS source_a,
         GREATEST(sa.source, sb.source) AS source_b,
         CASE WHEN sa.source <= sb.source THEN p.doc_a ELSE p.doc_b END AS da,
         CASE WHEN sa.source <= sb.source THEN p.doc_b ELSE p.doc_a END AS db
  FROM pairs p
  JOIN src sa ON sa.doc_id = p.doc_a
  JOIN src sb ON sb.doc_id = p.doc_b
)
SELECT source_a, source_b,
       COUNT(*)::BIGINT AS n_pairs,
       COUNT(DISTINCT da)::BIGINT AS n_docs_a,
       COUNT(DISTINCT db)::BIGINT AS n_docs_b
FROM canon GROUP BY source_a, source_b
"""


QUERIES: dict[str, tuple] = {
    "source_dedup_matrix": (source_dedup_matrix, ORACLE_SOURCE_DEDUP_MATRIX),
}
