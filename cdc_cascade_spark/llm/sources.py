"""Source-level reputation rollup (the URL/domain-filtering shape).

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension):
web-scale curation pipelines (RefinedWeb, Penedo et al. 2023; CCNet,
Wenzek et al. 2020) gate whole SOURCES, not just documents — a domain
whose pages are mostly boilerplate, duplicates, or rule failures gets
down-weighted or black-listed before per-document filtering even runs.
This module rolls per-document signals up to the ``source`` column:

- ``n_docs``, ``n_langs`` — volume and language spread,
- ``rule_pass_rate`` — fraction passing the Gopher-style rule gate
  (llm/quality_rules.py, reused verbatim so the two surfaces cannot
  drift),
- ``dup_doc_rate`` — fraction of the source's docs whose normalized
  key (dedup_exact's key) occurs more than once CORPUS-wide,
- ``mean_tokens`` — mean per-doc whitespace token count.

Determinism contract: every rate is one IEEE division of two exact
int64 counts (the repo's single-division convention), so both engines
agree bit-for-bit.

Scale shape (100 TB): two corpus-linear passes (rule projection,
normalized-key hash) feeding hash aggregates — the dup-key aggregate
shuffles (32-byte hash, count) pairs, never text; the final rollup is
one groupBy on ``source`` with map-side partial aggregation. The
doc_id join between the rule frame and the dup flags is
corpus × corpus only in cardinality, not in payload (both sides are
already reduced to a few columns), and shuffles on the same doc_id
key. Nothing collects to the driver.

Registered in round 8 (built in round 7 after that round's 50-slot
driver window was committed). The oracle composes ORACLE_GOPHER_RULES
verbatim as a CTE — the curate_corpus pattern — so the rule surface
cannot drift; tests/test_sources.py pins the per-source semantics
alongside the oracle row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.quality_rules import (
    ORACLE_GOPHER_RULES,
    gopher_quality_rules,
)


def source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation signals: (source, n_docs, n_langs,
    n_rule_pass, rule_pass_rate, n_dup_docs, dup_doc_rate,
    mean_tokens), ordered by source."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    rules = gopher_quality_rules(spark, sf_dir).select("doc_id", "n_words", "keep")
    norm_key = F.md5(F.lower(F.substring("text", 1, 50)))
    # keyed feeds TWO consumers (the copy-count aggregate and the
    # join-back); it is a 4-small-column projection, so snapshotting it
    # costs ~40 B/doc and removes one of the three text-reading corpus
    # scans from the plan (locally a few percent — the scan dominates
    # only at real scale; the cms.py r8 snapshot-the-derived-boundary
    # rule)
    keyed = docs.select(
        "doc_id", "source", "lang", norm_key.alias("norm_key")
    ).localCheckpoint(eager=False)
    key_counts = keyed.groupBy("norm_key").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    flagged = (
        keyed.join(key_counts, "norm_key")
        .join(rules, "doc_id")
        .select(
            "source",
            "lang",
            "n_words",
            F.col("keep").cast("bigint").alias("passed"),
            (F.col("n_copies") > 1).cast("bigint").alias("is_dup"),
        )
    )
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("passed").alias("n_rule_pass"),
        F.sum("is_dup").alias("n_dup_docs"),
        F.sum("n_words").alias("sum_tokens"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_langs",
        "n_rule_pass",
        (F.col("n_rule_pass").cast("double") / F.col("n_docs").cast("double")).alias(
            "rule_pass_rate"
        ),
        "n_dup_docs",
        (F.col("n_dup_docs").cast("double") / F.col("n_docs").cast("double")).alias(
            "dup_doc_rate"
        ),
        (F.col("sum_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
            "mean_tokens"
        ),
    ).orderBy("source")


ORACLE_SOURCE_REPUTATION = f"""
WITH rules AS (
{ORACLE_GOPHER_RULES}
), keyed AS (
  SELECT doc_id, source, lang,
         md5(lower(substr(text, 1, 50))) AS norm_key
  FROM documents
), key_counts AS (
  SELECT norm_key, COUNT(*) AS n_copies FROM keyed GROUP BY 1
), flagged AS (
  SELECT k.source, k.lang, r.n_words,
         CASE WHEN r.keep THEN 1 ELSE 0 END AS passed,
         CASE WHEN c.n_copies > 1 THEN 1 ELSE 0 END AS is_dup
  FROM keyed k
  JOIN key_counts c USING (norm_key)
  JOIN rules r USING (doc_id)
), agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(SUM(passed) AS BIGINT) AS n_rule_pass,
         CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
         CAST(SUM(n_words) AS BIGINT) AS sum_tokens
  FROM flagged GROUP BY source
)
SELECT source, n_docs, n_langs, n_rule_pass,
       CAST(n_rule_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS rule_pass_rate,
       n_dup_docs,
       CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_doc_rate,
       CAST(sum_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_tokens
FROM agg
ORDER BY source
"""


QUERIES: dict[str, tuple] = {
    "source_reputation": (source_reputation, ORACLE_SOURCE_REPUTATION),
}
