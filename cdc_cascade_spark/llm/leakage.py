"""Cross-split leakage detection: near-duplicate pairs that straddle
train/val/test boundaries.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension) closing
the loop between two verified operators: a hash split
(``llm/splits.py::corpus_split``) guarantees a DOCUMENT never moves
between splits, but it cannot know that two DIFFERENT documents are
near-duplicates of each other — and a test document whose near-twin
sits in train is memorization leakage that inflates every eval. The
standard mitigation is exactly this query: run the near-dup pair
detector over the whole corpus, annotate each pair with both sides'
split assignments, and either drop the eval twin or (first) audit how
much leakage exists.

``split_leakage_pairs`` joins the verified MinHash/LSH near-dup pairs
(``llm/dedup.py::dedup_minhash_lsh`` — banded candidates, exact
Jaccard ≥ 0.8) with the deterministic split assignment, emitting EVERY
verified pair with ``(split_a, split_b, is_cross_split)`` — all pairs,
not only the leaking ones, so the query also certifies the clean
majority and stays non-degenerate at small SFs where cross-split
near-dups may number zero.

Both constituent oracles are embedded VERBATIM (the composed-CTE
discipline of llm/pipeline.py), so this oracle cannot drift from the
queries the driver already checks.

Scale shape: the pair relation is candidate-bounded (banded LSH, never
all-pairs); the split side is a map-only projection of the documents
scan; the composition adds two id-keyed equi-joins of pair-sized
against corpus-sized relations — hash joins on unskewed ids (pair ids
are near-dup doc ids; AQE broadcasts the pair side when small, which
it typically is relative to the corpus).

Registered in r9, same round as built (r8 verdict #3).
tests/test_mixing_leakage.py pins the oracle agreement and exact
consistency with the two registered constituents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.llm.dedup import ORACLE_MINHASH, dedup_minhash_lsh
from cdc_cascade_spark.llm.splits import ORACLE_CORPUS_SPLIT, corpus_split


def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs annotated with split assignments:
    ``(doc_a, doc_b, jaccard, split_a, split_b, is_cross_split)``."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    splits = corpus_split(spark, sf_dir).select("doc_id", "split")
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            "split_a",
            "split_b",
            (F.col("split_a") != F.col("split_b")).alias("is_cross_split"),
        )
    )


ORACLE_SPLIT_LEAKAGE = f"""
WITH pairs AS MATERIALIZED (SELECT * FROM ({ORACLE_MINHASH}) t),
splits AS MATERIALIZED (SELECT doc_id, split FROM ({ORACLE_CORPUS_SPLIT}) t)
SELECT p.doc_a, p.doc_b, p.jaccard,
       sa.split AS split_a, sb.split AS split_b,
       sa.split <> sb.split AS is_cross_split
FROM pairs p
JOIN splits sa ON sa.doc_id = p.doc_a
JOIN splits sb ON sb.doc_id = p.doc_b
"""


QUERIES: dict[str, tuple] = {
    "split_leakage_pairs": (split_leakage_pairs, ORACLE_SPLIT_LEAKAGE),
}
