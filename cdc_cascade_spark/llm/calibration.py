"""Quality-score calibration: does the quality score actually
separate near-duplicates and curation survivors?

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension), the
data-quality-science face of the curation family: every stage of the
pipeline TRUSTS the per-document quality score (the floor election,
the budget ranking, the admission gates), and this report is the
audit of that trust — per quality decile of the corpus, the near-dup
incidence (membership in the verified SimHash pair set) and the
curated-corpus survival rate. A score that separates junk shows
falling dup_ppm and rising kept_ppm across deciles; a flat curve
means the score is noise and the floor election is a coin flip.

Score key — integer by construction: the report bins by

    q_milli = (least(n_tokens, 100) · n_distinct · 1000) div n_tokens

the exact milli-scaled integer twin of text_stats' double
``quality_score = least(1, n/100) · (distinct/n)`` (same shape;
floor-rounding differences are irrelevant because the key only BINS —
it is never compared against the double), computed over NON-EMPTY
tokens (the llm/prep discipline — text_stats' raw split hands an
empty document one '' token and thus the maximum score; here a
token-less document is q_milli = 0, the bottom decile). Integer keys
also dodge the cross-engine 0/0 hazard a double key would carry.

Decile rule — value-atomic: a score value's documents all land in
one decile, ``decile(v) = ceil(10 · cum_count(v) / n)`` over the
per-value cumulative distribution. Deterministic in both engines (no
per-row NTILE tie-breaking), and the decile map is computed on the
per-VALUE aggregate — at most |distinct q_milli| ≤ ~100k rows at any
corpus size — so the global-order window never sees corpus-sized
input (the quantile_histogram lesson applied to deciles). Deciles
are near-equal-sized except where one value spans a boundary.

Composition: near-dup membership comes from the verified
``dedup_simhash_pairs`` set (its oracle embedded verbatim), survival
from ``curate_corpus`` (its oracle embedded verbatim, and the Spark
side rides the same session-cached kept-id set the invalidation
report uses), so the driver row proves the calibration agrees with
both constituent verdicts.

Determinism: all integers — counts, integer floor-divisions, ppm
shares; min/max over integer keys. Nothing floats anywhere.

Scale shape (100 TB): one corpus scan into per-document integer
stats; one tiny per-value aggregate (+ its bounded window); the
decile map broadcasts back onto the doc stats; dup/kept membership
are semi-join flags against id sets that are both vanishing fractions
of the corpus; final rollup emits ≤ 10 rows. The heavy inputs (pair
set, kept set) are maintained artifacts a deployment already has.

Registered in r10, same round as built (the registration-pipeline
discipline). tests/test_calibration.py pins oracle parity at two SFs,
a pure-Python model on a crafted corpus, and the value-atomic decile
rule's boundary behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.dedup import ORACLE_SIMHASH_PAIRS, dedup_simhash_pairs
from cdc_cascade_spark.llm.incremental import _v1_kept_cached
from cdc_cascade_spark.llm.pipeline import ORACLE_CURATE_CORPUS
from cdc_cascade_spark.llm.prep import TOKENS_SQL, tokens

PPM = 1_000_000
N_DECILES = 10

# the integer milli-scaled quality key (see module docstring)
_Q_MILLI = (
    "CASE WHEN n_tokens > 0 THEN "
    "(least(n_tokens, 100) * n_distinct_tokens * 1000) div n_tokens "
    "ELSE 0 END"
)


def doc_quality_key_frame(docs: DataFrame) -> DataFrame:
    """``(doc_id, q_milli)`` over any ``(doc_id, text)`` frame.

    Counts NON-EMPTY tokens (the llm/prep discipline): text_stats'
    raw split gives an empty document one '' token and therefore the
    MAXIMUM ttr-based score — the known empty-text trap — so the
    calibration computes its own filtered counts instead of reusing
    text_stats_frame, and a token-less document lands at q_milli = 0
    (the bottom decile, where it belongs)."""
    toks = F.filter(tokens(F.col("text")), lambda t: t != F.lit(""))
    st = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias(
            "n_distinct_tokens"
        ),
    )
    return st.select(
        "doc_id", F.expr(_Q_MILLI).cast("bigint").alias("q_milli")
    )


def decile_map_frame(keys: DataFrame) -> DataFrame:
    """``(q_milli, decile)`` — the value-atomic decile of every
    distinct score value: ``ceil(10 · cum / n)`` over the per-value
    cumulative counts. Runs entirely on the per-value aggregate, so
    the global-order window input is |distinct values|, never the
    corpus."""
    per_value = keys.groupBy("q_milli").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.orderBy("q_milli").rowsBetween(W.unboundedPreceding, 0)
    # n = Σ cnt over the per-value aggregate — exactly keys.count(),
    # derived from the tiny rollup instead of a second corpus-sized
    # pass over ``keys`` (r18-opt, guide §2.3: the former
    # keys.agg(count) re-ran the whole tokenize subtree for one scalar)
    cum = per_value.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(per_value.agg(F.sum("cnt").alias("n")))
    )
    return cum.select(
        "q_milli",
        F.expr(f"(cum * {N_DECILES} + n - 1) div n")
        .cast("int")
        .alias("decile"),
    )


def quality_calibration_frame(
    docs: DataFrame, dup_ids: DataFrame, kept_ids: DataFrame
) -> DataFrame:
    """Frame-level face: per-decile corpus size, near-dup incidence
    and curation survival. ``dup_ids`` / ``kept_ids`` are 1-column
    ``doc_id`` sets."""
    # keys feeds two consumers (the decile map's per-value rollup and
    # the corpus-side decile join): snapshot so the corpus tokenize
    # runs once (r18-opt, guide §2.4). The frame is (doc_id, q_milli) —
    # two integers per document, the guide-§8 "decide on small rows"
    # proxy — so the checkpoint is corpus-LINEAR but payload-free.
    keys = doc_quality_key_frame(docs).localCheckpoint(eager=False)
    with_decile = keys.join(
        F.broadcast(decile_map_frame(keys)), "q_milli"
    )
    flags = (
        with_decile.join(
            dup_ids.select("doc_id", F.lit(1).alias("_dup")), "doc_id", "left"
        )
        .join(
            kept_ids.select("doc_id", F.lit(1).alias("_kept")),
            "doc_id",
            "left",
        )
        .select(
            "decile",
            "q_milli",
            F.coalesce("_dup", F.lit(0)).cast("bigint").alias("is_dup"),
            F.coalesce("_kept", F.lit(0)).cast("bigint").alias("is_kept"),
        )
    )
    agg = flags.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("is_dup").cast("bigint").alias("dup_docs"),
        F.sum("is_kept").cast("bigint").alias("kept_docs"),
        F.min("q_milli").cast("bigint").alias("lo_milli"),
        F.max("q_milli").cast("bigint").alias("hi_milli"),
    )
    return agg.select(
        "decile",
        "n_docs",
        "dup_docs",
        F.expr(f"(dup_docs * {PPM}) div n_docs").cast("bigint").alias("dup_ppm"),
        "kept_docs",
        F.expr(f"(kept_docs * {PPM}) div n_docs")
        .cast("bigint")
        .alias("kept_ppm"),
        "lo_milli",
        "hi_milli",
    )


def quality_calibration_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per quality decile: near-dup incidence and curation survival —
    ``(decile, n_docs, dup_docs, dup_ppm, kept_docs, kept_ppm,
    lo_milli, hi_milli)``."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_simhash_pairs(spark, sf_dir)
    dup_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    return quality_calibration_frame(
        docs, dup_ids, _v1_kept_cached(spark, sf_dir)
    )


_TOKS = "list_filter(" + TOKENS_SQL.format(x="text") + ", t -> t <> '')"

ORACLE_CALIBRATION = f"""
WITH pairs_full AS MATERIALIZED (
  {ORACLE_SIMHASH_PAIRS}
),
dup_ids AS MATERIALIZED (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs_full
    UNION ALL
    SELECT doc_b AS doc_id FROM pairs_full
  )
),
kept AS MATERIALIZED (
  SELECT doc_id FROM ({ORACLE_CURATE_CORPUS}) t
),
keys AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           (least(len(toks), 100) * len(list_distinct(toks)) * 1000)
             // len(toks)
         ELSE 0 END AS q_milli
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
),
per_value AS (
  SELECT q_milli, COUNT(*)::BIGINT AS cnt FROM keys GROUP BY 1
),
dmap AS (
  SELECT q_milli,
         ((SUM(cnt) OVER (ORDER BY q_milli
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           * {N_DECILES} + n - 1) // n)::INTEGER AS decile
  FROM per_value CROSS JOIN (SELECT COUNT(*)::BIGINT AS n FROM keys) t
),
flags AS (
  SELECT d.decile, k.q_milli,
         CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END AS is_dup,
         CASE WHEN kp.doc_id IS NULL THEN 0 ELSE 1 END AS is_kept
  FROM keys k
  JOIN dmap d ON d.q_milli = k.q_milli
  LEFT JOIN dup_ids dup ON dup.doc_id = k.doc_id
  LEFT JOIN kept kp ON kp.doc_id = k.doc_id
)
SELECT decile,
       COUNT(*)::BIGINT AS n_docs,
       SUM(is_dup)::BIGINT AS dup_docs,
       ((SUM(is_dup) * {PPM}) // COUNT(*))::BIGINT AS dup_ppm,
       SUM(is_kept)::BIGINT AS kept_docs,
       ((SUM(is_kept) * {PPM}) // COUNT(*))::BIGINT AS kept_ppm,
       MIN(q_milli)::BIGINT AS lo_milli,
       MAX(q_milli)::BIGINT AS hi_milli
FROM flags
GROUP BY decile
"""


QUERIES: dict[str, tuple] = {
    "quality_calibration_report": (
        quality_calibration_report,
        ORACLE_CALIBRATION,
    ),
}
