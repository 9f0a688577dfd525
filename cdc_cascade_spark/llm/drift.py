"""Corpus drift detection: distribution shift between two corpus
slices (yesterday vs today, reference vs candidate, shard vs shard).

A continuously-ingesting training pipeline needs a tripwire BEFORE new
data reaches the trainer: a scraper change, an upstream filter bug, or
a source going dark shows up first as a shift in the token
distribution, the language mix, or the document-length profile. This
module computes a compact drift report between a reference slice and a
current slice of the ``documents`` schema (doc_id, lang, text).

Metrics (one row each, ``(metric, value)``):

- ``vocab_js_divergence`` — Jensen–Shannon divergence between the two
  unigram token distributions, restricted to the UNION of each side's
  top-``top_n`` tokens with all remaining probability folded into one
  out-of-vocabulary bucket. JS (base 2) is symmetric and bounded in
  [0, 1]: 0 = identical vocabularies, 1 = disjoint. The top-N + OOV
  fold keeps the comparison frame bounded at any corpus size.
- ``lang_mix_l1`` — L1 distance between language share vectors,
  bounded in [0, 2]: 0 = identical mix, 2 = disjoint languages.
- ``mean_tokens_rel_shift`` — |mean_cur − mean_ref| / mean_ref of
  per-document token counts (relative, so thresholds transfer across
  corpora).
- ``ttr_shift`` — absolute difference of corpus-level type-token
  ratios (the lexical-diversity canary: boilerplate floods and
  template spam push TTR down before anything else moves).

Scale shape: each side is one explode → map-side partial count →
vocab-keyed shuffle (vocab-sized, not corpus-sized); the top-N cuts
plan as TakeOrderedAndProject (never a global sort of the corpus); the
two distribution frames then full-outer join on token — a
top_n-bounded frame — and every scalar metric is a single-row
aggregate. Nothing is ever corpus × corpus.

Oracle-gate exclusion: drift takes TWO arbitrary caller-supplied
frames, not the fixed catalog tables the driver's single-statement
oracle contract covers; correctness is pinned by identity
(drift(X, X) = 0), disjointness (maximal divergence on disjoint
slices), and determinism tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_cascade_spark.llm.prep import tokens

DRIFT_TOP_N = 2000

# reserved bucket / sentinel names (NUL-prefixed so no real token or
# lang label collides)
_OOV = "\x00OOV"
_NULL_LANG = "\x00nolang"


def _unigram_counts(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")  # whitespace-split artifact
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _doc_stats(docs: DataFrame) -> DataFrame:
    toks = tokens(F.col("text"))
    return docs.select(
        F.size(toks).cast("bigint").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_dist"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("sum_toks"),
        F.sum("n_dist").alias("sum_dist"),
    )


def _ratio(num, den) -> "F.Column":
    """0-guarded division: an empty side contributes zero probability
    mass instead of NULLing the whole aggregate (see the empty-slice
    semantics note in corpus_drift's docstring)."""
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def corpus_drift(
    ref: DataFrame, cur: DataFrame, top_n: int = DRIFT_TOP_N
) -> DataFrame:
    """Drift report between two (doc_id, lang, text) slices — four
    ``(metric, value)`` rows; see module docstring for the metrics and
    their bounds.

    NULL ``lang`` values are folded into one reserved bucket (two
    slices with the same null-lang share are identical, not maximally
    distant — full joins never match NULL keys, so the fold happens
    before grouping). Empty-slice semantics: against a non-empty slice
    an empty side contributes zero probability mass everywhere, giving
    JS = 0.5 and lang L1 = 1.0 (both far above any same-distribution
    baseline, so threshold tripwires fire) and 0.0 for the guarded
    mean/ttr ratios; two empty slices report all zeros.
    """
    # --- vocabulary JS divergence over top-N ∪ top-N (+ OOV fold) ---
    # The count frames are vocab-sized (already reduced); lazy
    # localCheckpoint snapshots them so the corpus explode+count runs
    # once per side even though each frame feeds two subtrees (its
    # top-N cut and the folded join).
    ref_counts = _unigram_counts(ref).localCheckpoint(eager=False)
    cur_counts = _unigram_counts(cur).localCheckpoint(eager=False)
    vocab = (
        ref_counts.orderBy(F.desc("n"), F.asc("token")).limit(top_n)
        .select("token")
        .unionByName(
            cur_counts.orderBy(F.desc("n"), F.asc("token")).limit(top_n)
            .select("token")
        )
        .distinct()
    )

    def fold(counts: DataFrame, out: str) -> DataFrame:
        """Fold a side's tail into its OOV bucket BEFORE any join, so
        every downstream frame is bounded by 2·top_n + 1 rows — the
        join itself must never be vocab-of-the-corpus sized."""
        return (
            counts.join(
                F.broadcast(vocab.withColumn("__in", F.lit(1))), "token", "left"
            )
            .select(
                F.when(F.col("__in").isNotNull(), F.col("token"))
                .otherwise(F.lit(_OOV))
                .alias("token"),
                "n",
            )
            .groupBy("token")
            .agg(F.sum("n").alias(out))
        )

    joint = (
        fold(ref_counts, "n_ref")
        .join(fold(cur_counts, "n_cur"), "token", "full")
        .na.fill(0, ["n_ref", "n_cur"])
    )
    tot = joint.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    pq = joint.crossJoin(F.broadcast(tot)).select(
        _ratio(F.col("n_ref"), F.col("t_ref")).alias("p"),
        _ratio(F.col("n_cur"), F.col("t_cur")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    kl_term = lambda x: F.when(  # noqa: E731 — local expression builder
        x > 0, x * F.log2(x / m)
    ).otherwise(F.lit(0.0))
    js = pq.agg(
        F.coalesce(
            (F.sum(kl_term(F.col("p"))) + F.sum(kl_term(F.col("q")))) / 2,
            F.lit(0.0),  # both sides empty -> empty pq frame -> NULL sum
        ).alias("js")
    )

    # --- language mix L1 (NULL lang folded pre-group) ---
    def lang_shares(d: DataFrame, col: str) -> DataFrame:
        c = (
            d.select(F.coalesce(F.col("lang"), F.lit(_NULL_LANG)).alias("lang"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        t = c.agg(F.sum("n").alias("t"))
        return c.crossJoin(F.broadcast(t)).select(
            "lang", _ratio(F.col("n"), F.col("t")).alias(col)
        )

    l1 = (
        lang_shares(ref, "s_ref")
        .join(lang_shares(cur, "s_cur"), "lang", "full")
        .na.fill(0.0, ["s_ref", "s_cur"])
        .agg(
            F.coalesce(
                F.sum(F.abs(F.col("s_ref") - F.col("s_cur"))), F.lit(0.0)
            ).alias("l1")
        )
    )

    # --- length + diversity shifts (0-guarded ratios) ---
    stats = (
        _doc_stats(ref)
        .crossJoin(F.broadcast(_doc_stats(cur)).toDF("n2", "st2", "sd2"))
    )
    mean_ref = _ratio(F.col("sum_toks"), F.col("n_docs"))
    mean_cur = _ratio(F.col("st2"), F.col("n2"))
    shifts = stats.select(
        _ratio(F.abs(mean_cur - mean_ref), mean_ref).alias("len_shift"),
        F.abs(
            _ratio(F.col("sd2"), F.col("st2"))
            - _ratio(F.col("sum_dist"), F.col("sum_toks"))
        ).alias("ttr_shift"),
    )

    report = (
        js.select(F.lit("vocab_js_divergence").alias("metric"), F.col("js").alias("value"))
        .unionByName(
            l1.select(F.lit("lang_mix_l1").alias("metric"), F.col("l1").alias("value"))
        )
        .unionByName(
            shifts.select(
                F.lit("mean_tokens_rel_shift").alias("metric"),
                F.col("len_shift").alias("value"),
            )
        )
        .unionByName(
            shifts.select(
                F.lit("ttr_shift").alias("metric"), F.col("ttr_shift").alias("value")
            )
        )
    )
    return report
