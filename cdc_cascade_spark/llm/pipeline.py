"""End-to-end corpus curation: the operators composed into one flow.

Each curation operator is individually oracle-verified; this module is
the proof they COMPOSE — the single call a user runs to turn the raw
``documents`` table into a training-ready corpus:

    near-dup collapse → quality floor → contamination removal →
    PII redaction → per-stratum token budget

Output provenance columns record why each surviving document is there,
so the pipeline is auditable (every drop decision is reproducible by
running the underlying operator alone).

Scale shape: every stage is one of the already-audited operators; the
composition adds only id-keyed semi/anti joins between them, each
broadcastable when the drop set is small (near-dup reps, contaminated
ids) and hash-joined otherwise. Nothing here introduces a new shuffle
pattern — at 100 TB each stage would typically checkpoint to storage
and the joins run against those materializations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.curation import (
    ORACLE_CONTAMINATION,
    ORACLE_PII,
    ORACLE_QUALITY_FLOOR,
    contamination_check,
    pii_redaction,
    quality_floor_filter,
)
from cdc_cascade_spark.llm.dedup import (
    ORACLE_CLUSTER_REPS,
    dedup_cluster_representatives,
)
from cdc_cascade_spark.llm.prep import TOKENS_SQL
from cdc_cascade_spark.llm.selection import (
    QUALITY_PPM,
    STRATUM_TOKEN_BUDGET,
    budget_filter,
)


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-ready corpus: (doc_id, lang, source, text, n_tokens,
    quality, was_redacted) after the full curation chain.

    Drop rules, in order:
    1. near-dup clusters keep only their representative (min doc_id);
    2. bottom-quality-decile documents drop (quality_floor_filter's
       keep set IS the filter);
    3. any training document a benchmark document is contained in
       drops (contamination);
    4. surviving text is the PII-redacted form;
    5. each (lang) stratum admits docs up to its token budget.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    # 1. near-dup collapse: drop clustered docs that are not their
    # cluster's representative. No broadcast hint: loser sets are
    # O(corpus) at web scale (20-50% of documents is normal) — AQE
    # picks broadcast when the set happens to be small.
    reps = dedup_cluster_representatives(spark, sf_dir)
    dup_losers = reps.filter(F.col("doc_id") != F.col("rep_doc_id")).select(
        "doc_id"
    )
    survivors = docs.join(dup_losers, "doc_id", "left_anti")
    # 2. quality floor: semi-join the keep set
    keep = quality_floor_filter(spark, sf_dir).select("doc_id")
    survivors = survivors.join(keep, "doc_id", "left_semi")
    # 3. contamination: drop contaminated training docs
    contaminated = contamination_check(spark, sf_dir).select(
        F.col("train_doc").alias("doc_id")
    )
    survivors = survivors.join(contaminated, "doc_id", "left_anti")
    # 4. PII redaction: swap in the redacted text
    red = pii_redaction(spark, sf_dir).select(
        "doc_id",
        F.col("redacted").alias("clean_text"),
        (
            (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
        ).alias("was_redacted"),
    )
    survivors = survivors.join(red, "doc_id")
    # 5. token budget per stratum — over the SURVIVORS' redacted text,
    # so (a) documents already dropped upstream cannot consume stratum
    # budget (budgeting the raw corpus would under-fill strata whose
    # best docs were near-dup losers) and (b) token counts reflect the
    # text that will actually be trained on
    admitted = budget_filter(
        survivors.select("doc_id", "lang", F.col("clean_text").alias("text"))
    ).select("doc_id", "n_tokens", "quality")
    return survivors.join(admitted, "doc_id").select(
        "doc_id",
        "lang",
        "source",
        F.col("clean_text").alias("text"),
        "n_tokens",
        "quality",
        "was_redacted",
    )


def _curate_corpus_oracle_sql() -> str:
    """Composed-CTE mirror of :func:`curate_corpus` (r5 verdict #5).

    Each stage's already-verified oracle is embedded VERBATIM as a
    subquery (DuckDB allows WITH — including WITH RECURSIVE — inside a
    derived table), so this oracle cannot drift from the per-stage
    oracles: any stage fix propagates here automatically. The
    composition layer adds only the id-keyed semi/anti joins and the
    budget window over the survivors' redacted text — exactly the
    joins curate_corpus itself adds over its stage operators.
    """
    toks = TOKENS_SQL.format(x="text")
    return f"""
WITH reps AS (SELECT * FROM ({ORACLE_CLUSTER_REPS}) t),
losers AS (SELECT doc_id FROM reps WHERE doc_id <> rep_doc_id),
keepq AS (SELECT doc_id FROM ({ORACLE_QUALITY_FLOOR}) t),
contam AS (SELECT DISTINCT train_doc AS doc_id FROM ({ORACLE_CONTAMINATION}) t),
red AS (
  SELECT doc_id, redacted,
         (n_emails + n_phones + n_ips) > 0 AS was_redacted
  FROM ({ORACLE_PII}) t
),
survivors AS (
  SELECT d.doc_id, d.lang, d.source, r.redacted AS text, r.was_redacted
  FROM documents d
  JOIN red r USING (doc_id)
  WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    AND d.doc_id IN (SELECT doc_id FROM keepq)
    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
),
bud AS (
  SELECT lang, doc_id,
         len({toks}) AS n_tokens,
         CAST((len(list_distinct({toks})) * {QUALITY_PPM})
              // len({toks}) AS BIGINT) AS quality
  FROM survivors
),
o AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY quality DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM bud
)
SELECT s.doc_id, s.lang, s.source, s.text,
       CAST(o.n_tokens AS BIGINT) AS n_tokens, o.quality, s.was_redacted
FROM survivors s JOIN o USING (doc_id)
WHERE o.cum_tokens <= {STRATUM_TOKEN_BUDGET}
"""


ORACLE_CURATE_CORPUS = _curate_corpus_oracle_sql()


def curation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drop-accounting face of :func:`curate_corpus`: one row per
    RAW corpus document with every stage's verdict —
    (doc_id, lang, is_dup_loser, failed_quality, contaminated,
    was_redacted, over_budget, kept).

    ``curate_corpus`` answers "what do I train on"; this answers "why
    is my document not in it" — the lineage/debugging query every
    curation pipeline needs. Flag semantics mirror the composition
    exactly: the first three verdicts are per-document stage decisions
    on the full corpus; ``over_budget`` is only reachable by documents
    that survived them (budget is computed over the survivors'
    redacted text, as in curate_corpus — upstream drops never consume
    stratum budget); ``kept`` matches curate_corpus's output set
    row-for-row.

    Scale shape: identical to curate_corpus (the stages ARE the same
    operators, sharing its session-cached feature frames) plus
    id-keyed left joins that replace the semi/anti filters with
    booleans — same joins, same shuffle keys, flags instead of drops.

    Registered in r8 (built in r7 after that round's driver window was
    committed); tests/test_pipeline_audit.py pins the curate_corpus
    reconciliation alongside the oracle row.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    reps = dedup_cluster_representatives(spark, sf_dir)
    losers = reps.filter(F.col("doc_id") != F.col("rep_doc_id")).select(
        "doc_id", F.lit(True).alias("_loser")
    )
    keep = quality_floor_filter(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("_kept_q")
    )
    contaminated = (
        contamination_check(spark, sf_dir)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct()
        .select("doc_id", F.lit(True).alias("_contam"))
    )
    red = pii_redaction(spark, sf_dir).select(
        "doc_id",
        F.col("redacted").alias("clean_text"),
        ((F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0).alias(
            "was_redacted"
        ),
    )
    flags = (
        docs.join(losers, "doc_id", "left")
        .join(keep, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .join(red, "doc_id")
        .select(
            "doc_id",
            "lang",
            "clean_text",
            F.coalesce(F.col("_loser"), F.lit(False)).alias("is_dup_loser"),
            (~F.coalesce(F.col("_kept_q"), F.lit(False))).alias("failed_quality"),
            F.coalesce(F.col("_contam"), F.lit(False)).alias("contaminated"),
            "was_redacted",
        )
    )
    survivor = (
        ~F.col("is_dup_loser") & ~F.col("failed_quality") & ~F.col("contaminated")
    )
    survivors = flags.filter(survivor).select(
        "doc_id", "lang", F.col("clean_text").alias("text")
    )
    admitted = budget_filter(survivors).select(
        "doc_id", F.lit(True).alias("_adm")
    )
    return (
        flags.join(admitted, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "is_dup_loser",
            "failed_quality",
            "contaminated",
            "was_redacted",
            (survivor & ~F.coalesce(F.col("_adm"), F.lit(False))).alias(
                "over_budget"
            ),
            (survivor & F.coalesce(F.col("_adm"), F.lit(False))).alias("kept"),
        )
    )


def _curation_audit_oracle_sql() -> str:
    """Composed mirror of :func:`curation_audit` — the curate_corpus
    oracle's stage CTEs with left-join flags instead of filters."""
    toks = TOKENS_SQL.format(x="text")
    return f"""
WITH reps AS MATERIALIZED (SELECT * FROM ({ORACLE_CLUSTER_REPS}) t),
losers AS (SELECT doc_id FROM reps WHERE doc_id <> rep_doc_id),
keepq AS MATERIALIZED (SELECT doc_id FROM ({ORACLE_QUALITY_FLOOR}) t),
contam AS MATERIALIZED (
  SELECT DISTINCT train_doc AS doc_id FROM ({ORACLE_CONTAMINATION}) t
),
red AS MATERIALIZED (
  SELECT doc_id, redacted,
         (n_emails + n_phones + n_ips) > 0 AS was_redacted
  FROM ({ORACLE_PII}) t
),
flags AS MATERIALIZED (
  SELECT d.doc_id, d.lang, r.redacted,
         d.doc_id IN (SELECT doc_id FROM losers) AS is_dup_loser,
         d.doc_id NOT IN (SELECT doc_id FROM keepq) AS failed_quality,
         d.doc_id IN (SELECT doc_id FROM contam) AS contaminated,
         r.was_redacted
  FROM documents d JOIN red r USING (doc_id)
),
survivors AS (
  SELECT doc_id, lang, redacted AS text FROM flags
  WHERE NOT is_dup_loser AND NOT failed_quality AND NOT contaminated
),
bud AS (
  SELECT lang, doc_id,
         len({toks}) AS n_tokens,
         CAST((len(list_distinct({toks})) * {QUALITY_PPM})
              // len({toks}) AS BIGINT) AS quality
  FROM survivors
),
o AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY quality DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM bud
),
admitted AS (SELECT doc_id FROM o WHERE cum_tokens <= {STRATUM_TOKEN_BUDGET})
SELECT f.doc_id, f.lang, f.is_dup_loser, f.failed_quality, f.contaminated,
       f.was_redacted,
       (NOT f.is_dup_loser AND NOT f.failed_quality AND NOT f.contaminated)
         AND f.doc_id NOT IN (SELECT doc_id FROM admitted) AS over_budget,
       (NOT f.is_dup_loser AND NOT f.failed_quality AND NOT f.contaminated)
         AND f.doc_id IN (SELECT doc_id FROM admitted) AS kept
FROM flags f
"""


ORACLE_CURATION_AUDIT = _curation_audit_oracle_sql()


QUERIES: dict[str, tuple] = {
    "curate_corpus": (curate_corpus, ORACLE_CURATE_CORPUS),
    "curation_audit": (curation_audit, ORACLE_CURATION_AUDIT),
}
