"""Corpus versioning: CDC-style diff between two corpus snapshots.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension) that
closes the loop with the reference's own identity: tr1sm0s1n/
cdc-cascade is a change-data-capture pipeline (queue/cdc.go), and a
training-data platform needs exactly that operation at the corpus
level — "what changed between dataset v1 and v2" drives incremental
re-deduplication, index maintenance (llm/dedup_index.py,
llm/ivf_index.py appends), eval-set freezing, and audit trails.

``corpus_diff_frame(old, new)`` emits one row per changed document in
CDC envelope vocabulary — ``op`` ∈ {'c','u','d'} (create / update /
delete, the Debezium letters the CDC family already uses) with the
content digests as before/after images:

    (doc_id, op, old_digest, new_digest)

Unchanged documents emit nothing (a diff, not a dump). Digests are
md5 over the text bytes — the same digest family as
``multimodal_dedup``'s content keys, so "changed" means byte-level
content change, never formatting of the comparison.

The registered fixed-table query diffs two deterministic snapshots of
``documents``: v1 = all documents; v2 = documents with every 20th
document's text rewritten (update), every 30th dropped (delete), and
one synthetic document added per source (create) — the deterministic
injected-mutation pattern (``pii_redaction`` / ``multimodal_dedup``
precedent) so all three op kinds exist at every SF.

Scale shape (100 TB): each side reduces to (doc_id, digest) map-side
— 40 B/doc — then ONE full outer join on doc_id; the text bytes never
shuffle. At production scale both digest relations are incremental
artifacts you persist per snapshot, making the diff a join of two
pre-computed digest tables — exactly how table-format diffs work.

Built in r8 after that round's 50-slot driver window was already
committed (the established late-surface pattern); registered in r9.
tests/test_versioning.py pins the oracle agreement and the op-mix
invariants alongside the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

# Injected-mutation parameters for the fixed-table query (see module
# docstring): chosen so creates/updates/deletes all exist at sf0.001.
DIFF_UPDATE_MOD = 20
DIFF_DELETE_MOD = 30


def corpus_diff_frame(old: DataFrame, new: DataFrame) -> DataFrame:
    """CDC envelope rows for the content changes between two
    (doc_id, text) corpus snapshots."""
    o = old.select("doc_id", F.md5(F.col("text")).alias("old_digest"))
    n = new.select("doc_id", F.md5(F.col("text")).alias("new_digest"))
    joined = o.join(n, "doc_id", "full_outer")
    op = (
        F.when(F.col("old_digest").isNull(), F.lit("c"))
        .when(F.col("new_digest").isNull(), F.lit("d"))
        .otherwise(F.lit("u"))
    )
    return (
        joined.filter(
            F.col("old_digest").isNull()
            | F.col("new_digest").isNull()
            | (F.col("old_digest") != F.col("new_digest"))
        )
        .select("doc_id", op.alias("op"), "old_digest", "new_digest")
    )


def _v2(docs: DataFrame) -> DataFrame:
    """The deterministic second snapshot (see module docstring)."""
    edited = F.when(
        F.col("doc_id") % DIFF_UPDATE_MOD == 0,
        F.concat(F.lit("v2-rewrite "), F.col("text")),
    ).otherwise(F.col("text"))
    kept = docs.filter(F.col("doc_id") % DIFF_DELETE_MOD != 0).select(
        "doc_id", edited.alias("text"), "source"
    )
    # Synthetic ids must come from a range no real doc_id can occupy at
    # ANY corpus size (r8 advice: an offset like min+1e6 collides once
    # real ids pass the offset, multiplying rows through the diff's full
    # outer join in BOTH engines — invisible to the oracle). Real
    # doc_ids are non-negative, so the negated-(min+1) ids are free; and
    # since each source's MIN(doc_id) is itself a distinct real id, the
    # negated values stay distinct across sources.
    added = (
        docs.groupBy("source")
        .agg(F.min("doc_id").alias("m"))
        .select(
            (-F.col("m") - 1).alias("doc_id"),
            F.concat(F.lit("v2-new-doc-for "), F.col("source")).alias("text"),
            "source",
        )
    )
    return kept.unionByName(added)


def corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-table corpus diff: v1 = documents, v2 = the deterministic
    mutated snapshot — (doc_id, op, old_digest, new_digest)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    return corpus_diff_frame(docs, _v2(docs))


ORACLE_CORPUS_DIFF = f"""
WITH v1 AS (
  SELECT doc_id, md5(text) AS old_digest FROM documents
), v2base AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DIFF_UPDATE_MOD} = 0
              THEN 'v2-rewrite ' || text ELSE text END AS text
  FROM documents
  WHERE doc_id % {DIFF_DELETE_MOD} <> 0
), v2added AS (
  -- negative ids: guaranteed free of the (non-negative) real id space
  -- at any corpus size, and distinct across sources because each
  -- source's MIN(doc_id) is a distinct real id
  SELECT -MIN(doc_id) - 1 AS doc_id,
         'v2-new-doc-for ' || source AS text
  FROM documents GROUP BY source
), v2 AS (
  SELECT doc_id, md5(text) AS new_digest FROM v2base
  UNION ALL
  SELECT doc_id, md5(text) AS new_digest FROM v2added
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.old_digest IS NULL THEN 'c'
            WHEN v2.new_digest IS NULL THEN 'd'
            ELSE 'u' END AS op,
       v1.old_digest, v2.new_digest
FROM v1 FULL OUTER JOIN v2 USING (doc_id)
WHERE v1.old_digest IS NULL OR v2.new_digest IS NULL
   OR v1.old_digest <> v2.new_digest
"""


QUERIES: dict[str, tuple] = {
    "corpus_diff": (corpus_diff, ORACLE_CORPUS_DIFF),
}
