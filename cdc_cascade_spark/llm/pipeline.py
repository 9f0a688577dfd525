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
from cdc_cascade_spark.functions.caching import BoundedDFCache
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
from cdc_cascade_spark.llm.segdedup import segdedup_sql, segment_dedup_frame
from cdc_cascade_spark.llm.selection import (
    QUALITY_PPM,
    STRATUM_TOKEN_BUDGET,
    budget_filter,
)


# The per-document stage-verdict frame is the shared substrate of the
# WHOLE pipeline family (curate_corpus, curation_audit, both segmented
# variants): all four need the same four stage decisions over the same
# corpus, and rebuilding the chain per query quadruples its cost in
# any session that runs more than one of them. One persisted frame per
# (session, sf_dir) — the session-scoped analogue of the "materialize
# each stage to storage" architecture the module docstring describes
# for 100 TB, where the verdict table is a first-class artifact both
# the corpus build and the audit read. Slots riding this cache publish
# their cold figures in the bench's ``cache_backed_slots`` (the
# trained-BPE-state policy).
_FLAGS_CACHE = BoundedDFCache()


def _flags_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per raw document with every per-document stage verdict:
    (doc_id, lang, source, clean_text, is_dup_loser, failed_quality,
    contaminated, was_redacted). Budget admission is NOT a column here
    — it depends on which documents survive (and, for the segmented
    variants, on the span rewrite), so each consumer computes it over
    its own survivor text."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
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
    return (
        docs.join(losers, "doc_id", "left")
        .join(keep, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .join(red, "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            "clean_text",
            F.coalesce(F.col("_loser"), F.lit(False)).alias("is_dup_loser"),
            (~F.coalesce(F.col("_kept_q"), F.lit(False))).alias(
                "failed_quality"
            ),
            F.coalesce(F.col("_contam"), F.lit(False)).alias("contaminated"),
            "was_redacted",
        )
    )


def curation_flags_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _FLAGS_CACHE.get_or_build(
        spark, sf_dir, lambda: _flags_frame(spark, sf_dir)
    )


# The segmented pipeline family's second shared substrate (r9 verdict
# #3): both segmented queries run the C4 span-dedup rewrite over the
# SAME survivor set (the segment stage is deterministic in the flags
# frame), and rebuilding the explode → span-count agg → join-back →
# reassembly chain per query made them the two heaviest bench slots
# (1.99 s + 1.59 s warm at sf0.1). One persisted rewrite per
# (session, sf_dir) — at 100 TB this is the materialized
# span-deduplicated survivor table both the corpus build and its audit
# read. The riding slots keep publishing their cold truth in the
# bench's ``cache_backed_slots``.
_SEG_CACHE = BoundedDFCache()


def _segdedup_survivors_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seg_text, seg_dropped) — the span-dedup rewrite of
    every surviving document's redacted text. Token-less survivors
    yield no row here; consumers LEFT-join and coalesce (r8 advice)."""
    survivors = (
        curation_flags_cached(spark, sf_dir)
        .filter(_survivor())
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    return segment_dedup_frame(survivors).select(
        "doc_id",
        F.col("cleaned_text").alias("seg_text"),
        F.col("n_dropped").alias("seg_dropped"),
    )


def segdedup_survivors_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _SEG_CACHE.get_or_build(
        spark, sf_dir, lambda: _segdedup_survivors_frame(spark, sf_dir)
    )


def _survivor():
    # built lazily: Column construction needs an active SparkContext,
    # and this module must import without one (registry fingerprinting)
    return (
        ~F.col("is_dup_loser")
        & ~F.col("failed_quality")
        & ~F.col("contaminated")
    )


def curate_corpus(
    spark: SparkSession, sf_dir: str, segment_stage: bool = False
) -> DataFrame:
    """Training-ready corpus: (doc_id, lang, source, text, n_tokens,
    quality, was_redacted) after the full curation chain.

    Drop rules, in order:
    1. near-dup clusters keep only their representative (min doc_id);
    2. bottom-quality-decile documents drop (quality_floor_filter's
       keep set IS the filter);
    3. any training document a benchmark document is contained in
       drops (contamination);
    4. surviving text is the PII-redacted form;
    4b. (``segment_stage=True`` only) duplicated-segment removal — the
       C4 three-sentence-span rule in segment form (llm/segdedup.py) —
       runs over the SURVIVORS' redacted text, rewriting each document
       to its surviving segments and appending ``n_dropped_segments``.
       It sits between redaction and budgeting because span dedup is a
       text rewrite, and the budget must count the tokens that will
       actually be trained on (the same principle that already puts
       budgeting after redaction). Computing it over survivors, not the
       raw corpus, keeps the stage a true pipeline step: text removed
       by earlier stages cannot claim first-occurrence status.
    5. each (lang) stratum admits docs up to its token budget.
    """
    # Stages 1-4 are the shared persisted verdict frame (see
    # curation_flags_cached): survivors = documents no stage dropped,
    # carrying their redacted text. The persisted frame also serves as
    # the multi-consumer snapshot the old per-query localCheckpoint
    # provided (budget relation + final rejoin + optional segment
    # relation all re-read it).
    survivors = curation_flags_cached(spark, sf_dir).filter(_survivor()).select(
        "doc_id", "lang", "source", "clean_text", "was_redacted"
    )
    # 4b. optional duplicated-segment removal over the survivors'
    # redacted text (see docstring) — the shared persisted rewrite
    # (the audit reads the same frame)
    if segment_stage:
        seg = segdedup_survivors_cached(spark, sf_dir)
        # LEFT join: a survivor whose redacted text tokenizes to
        # nothing yields no segment rows, and an inner join would
        # silently drop it here (r8 advice). It surfaces instead with
        # empty text and a zero drop count; the budget stage then
        # rejects it EXPLICITLY (budget_filter admits only n_tokens>0).
        survivors = (
            survivors.drop("clean_text")
            .join(seg, "doc_id", "left")
            .withColumn("clean_text", F.coalesce("seg_text", F.lit("")))
            .withColumn(
                "n_dropped_segments",
                F.coalesce(F.col("seg_dropped"), F.lit(0)).cast("bigint"),
            )
            .drop("seg_text", "seg_dropped")
        )
    # 5. token budget per stratum — over the SURVIVORS' redacted (and,
    # with the segment stage, span-deduplicated) text, so (a) documents
    # already dropped upstream cannot consume stratum budget (budgeting
    # the raw corpus would under-fill strata whose best docs were
    # near-dup losers) and (b) token counts reflect the text that will
    # actually be trained on
    admitted = budget_filter(
        survivors.select("doc_id", "lang", F.col("clean_text").alias("text"))
    ).select("doc_id", "n_tokens", "quality")
    out_cols = [
        "doc_id",
        "lang",
        "source",
        F.col("clean_text").alias("text"),
        "n_tokens",
        "quality",
        "was_redacted",
    ]
    if segment_stage:
        out_cols.append("n_dropped_segments")
    # admitted is budget-bounded by construction (per-stratum token
    # ceiling over a bounded lang set) — broadcast so the final attach
    # never shuffles the survivor rows (r18-opt, guide §3.1: the
    # window output is statistics-free, so without the hint the join
    # planned a sort-merge join; local slot delta is inside the noise
    # band, the hint is for the 100 TB shape).
    return survivors.join(F.broadcast(admitted), "doc_id").select(*out_cols)


def curate_corpus_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`curate_corpus` with the duplicated-segment stage enabled —
    registered separately so the flagship pipeline's verified output is
    untouched while the segmented composition gets its own oracle row.
    Output adds ``n_dropped_segments`` (segments removed from each
    surviving document by the C4 span rule)."""
    return curate_corpus(spark, sf_dir, segment_stage=True)


def _curate_corpus_oracle_sql(segment_stage: bool = False) -> str:
    """Composed-CTE mirror of :func:`curate_corpus` (r5 verdict #5).

    Each stage's already-verified oracle is embedded VERBATIM as a
    subquery (DuckDB allows WITH — including WITH RECURSIVE — inside a
    derived table, and the inner WITH may reference outer CTEs), so
    this oracle cannot drift from the per-stage oracles: any stage fix
    propagates here automatically. The composition layer adds only the
    id-keyed semi/anti joins and the budget window over the survivors'
    redacted text — exactly the joins curate_corpus itself adds over
    its stage operators. With ``segment_stage`` the segdedup oracle is
    instantiated over the survivors CTE (``segdedup_sql`` — the same
    template that defines the stand-alone query's oracle) and the
    budget CTEs read the span-deduplicated text.
    """
    # non-empty tokens, mirroring budget_filter's Spark-side filter
    toks = f"list_filter({TOKENS_SQL.format(x='text')}, t -> t <> '')"
    if segment_stage:
        seg_cte = f"""
seg AS MATERIALIZED (
  SELECT * FROM ({segdedup_sql('(SELECT doc_id, text FROM survivors)')}) t
),
budget_src AS (
  -- LEFT join + coalesce: token-less survivors produce no segment
  -- rows and must surface (empty text, zero drops), not vanish —
  -- mirrors the Spark-side join exactly (r8 advice)
  SELECT s.doc_id, s.lang, s.source, COALESCE(g.cleaned_text, '') AS text,
         s.was_redacted,
         CAST(COALESCE(g.n_dropped, 0) AS BIGINT) AS n_dropped_segments
  FROM survivors s LEFT JOIN seg g USING (doc_id)
),"""
        seg_col = ", b.n_dropped_segments"
    else:
        seg_cte = """
budget_src AS (SELECT *, NULL AS n_dropped_segments FROM survivors),"""
        seg_col = ""
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
),{seg_cte}
bud AS (
  SELECT lang, doc_id,
         len({toks}) AS n_tokens,
         CAST((len(list_distinct({toks})) * {QUALITY_PPM})
              // len({toks}) AS BIGINT) AS quality
  FROM budget_src
  WHERE len({toks}) > 0
),
o AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY quality DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM bud
)
SELECT b.doc_id, b.lang, b.source, b.text,
       CAST(o.n_tokens AS BIGINT) AS n_tokens, o.quality,
       b.was_redacted{seg_col}
FROM budget_src b JOIN o USING (doc_id)
WHERE o.cum_tokens <= {STRATUM_TOKEN_BUDGET}
"""


ORACLE_CURATE_CORPUS = _curate_corpus_oracle_sql()
ORACLE_CURATE_SEGMENTED = _curate_corpus_oracle_sql(segment_stage=True)


def curation_audit(
    spark: SparkSession, sf_dir: str, segment_stage: bool = False
) -> DataFrame:
    """The drop-accounting face of :func:`curate_corpus`: one row per
    RAW corpus document with every stage's verdict —
    (doc_id, lang, is_dup_loser, failed_quality, contaminated,
    was_redacted, over_budget, kept).

    With ``segment_stage`` the audit mirrors
    :func:`curate_corpus_segmented` instead: the span-dedup stage runs
    over the survivors' redacted text before budgeting, and the output
    appends ``n_dropped_segments`` — NULL for documents that never
    reached the segment stage (dropped by an earlier verdict), the
    stage's drop count otherwise. The registered query is the default
    (flag off); the segmented mode is pinned by the reconciliation
    tests against ``curate_corpus_segmented``.

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
    # the shared persisted verdict frame IS the audit's flags relation
    # (plus `source`, which the audit does not emit)
    flags = curation_flags_cached(spark, sf_dir)
    survivor = _survivor()
    survivors = flags.filter(survivor).select(
        "doc_id", "lang", F.col("clean_text").alias("text")
    )
    seg_join = None
    if segment_stage:
        seg = segdedup_survivors_cached(spark, sf_dir)
        # LEFT join + coalesce, as in curate_corpus: token-less
        # survivors surface with empty text / zero drops instead of
        # silently vanishing from the audit (r8 advice)
        survivors = (
            survivors.drop("text")
            .join(seg, "doc_id", "left")
            .withColumn("text", F.coalesce("seg_text", F.lit("")))
            .withColumn(
                "n_dropped_segments",
                F.coalesce(F.col("seg_dropped"), F.lit(0)).cast("bigint"),
            )
        )
        seg_join = survivors.select("doc_id", "n_dropped_segments")
        survivors = survivors.select("doc_id", "lang", "text")
    admitted = budget_filter(survivors).select(
        "doc_id", F.lit(True).alias("_adm")
    )
    out_cols = [
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
    ]
    # budget-bounded build side (see curate_corpus) — broadcast keeps
    # the corpus-sized flags relation unshuffled through the left join
    out = flags.join(F.broadcast(admitted), "doc_id", "left")
    if seg_join is not None:
        out = out.join(seg_join, "doc_id", "left")
        out_cols.append("n_dropped_segments")
    return out.select(*out_cols)


def _curation_audit_oracle_sql(segment_stage: bool = False) -> str:
    """Composed mirror of :func:`curation_audit` — the curate_corpus
    oracle's stage CTEs with left-join flags instead of filters. With
    ``segment_stage`` the segdedup oracle is embedded VERBATIM over the
    survivors CTE (the same ``segdedup_sql`` template that defines the
    stand-alone query's oracle), budgeting reads the span-deduplicated
    text, and the output appends ``n_dropped_segments`` (r8 verdict
    #5)."""
    # non-empty tokens, mirroring budget_filter's Spark-side filter
    toks = f"list_filter({TOKENS_SQL.format(x='text')}, t -> t <> '')"
    if segment_stage:
        seg_cte = f""",
seg AS MATERIALIZED (
  SELECT * FROM ({segdedup_sql('(SELECT doc_id, text FROM survivors)')}) t
),
budget_src AS (
  SELECT s.doc_id, s.lang, COALESCE(g.cleaned_text, '') AS text,
         CAST(COALESCE(g.n_dropped, 0) AS BIGINT) AS n_dropped_segments
  FROM survivors s LEFT JOIN seg g USING (doc_id)
)"""
        seg_col = ", bs.n_dropped_segments"
        seg_tail = " LEFT JOIN budget_src bs USING (doc_id)"
    else:
        seg_cte = """,
budget_src AS (SELECT doc_id, lang, text FROM survivors)"""
        seg_col = ""
        seg_tail = ""
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
){seg_cte},
bud AS (
  SELECT lang, doc_id,
         len({toks}) AS n_tokens,
         CAST((len(list_distinct({toks})) * {QUALITY_PPM})
              // len({toks}) AS BIGINT) AS quality
  FROM budget_src
  WHERE len({toks}) > 0
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
         AND f.doc_id IN (SELECT doc_id FROM admitted) AS kept{seg_col}
FROM flags f{seg_tail}
"""


ORACLE_CURATION_AUDIT = _curation_audit_oracle_sql()
ORACLE_AUDIT_SEGMENTED = _curation_audit_oracle_sql(segment_stage=True)


def curation_audit_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`curation_audit` with the duplicated-segment stage enabled
    — the drop-accounting face of :func:`curate_corpus_segmented`,
    registered separately (r8 verdict #5) so the segmented composition's
    audit trail is itself driver-verified: per-document stage verdicts
    plus ``n_dropped_segments`` (NULL for documents dropped before the
    segment stage). tests/test_pipeline_audit.py pins the row-for-row
    reconciliation against ``curate_corpus_segmented`` alongside the
    oracle row."""
    return curation_audit(spark, sf_dir, segment_stage=True)


QUERIES: dict[str, tuple] = {
    "curate_corpus": (curate_corpus, ORACLE_CURATE_CORPUS),
    "curation_audit": (curation_audit, ORACLE_CURATION_AUDIT),
    "curate_corpus_segmented": (curate_corpus_segmented, ORACLE_CURATE_SEGMENTED),
    "curation_audit_segmented": (
        curation_audit_segmented,
        ORACLE_AUDIT_SEGMENTED,
    ),
}
