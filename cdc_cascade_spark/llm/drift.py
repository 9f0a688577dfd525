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

Oracle-gate exclusion (``corpus_drift`` itself): drift takes TWO
arbitrary caller-supplied frames, not the fixed catalog tables the
driver's single-statement oracle contract covers, and JS divergence
needs ``log2`` — a libm call with no cross-engine bit-determinism
guarantee. Correctness is pinned by identity (drift(X, X) = 0),
disjointness (maximal divergence on disjoint slices), and determinism
tests instead.

``corpus_drift_report`` IS oracle-registered: it fixes the two slices
deterministically on the catalog ``documents`` table (even/odd
``doc_id``) and replaces JS with L1 vocabulary distance so every
metric is an exact-integer numerator over an exact-integer denominator
with ONE final IEEE division — bit-identical in both engines (the
``bigram_lift`` log-free convention).
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


# ---------------------------------------------------------------------------
# Oracle-registered fixed-slice drift report
# ---------------------------------------------------------------------------

# Small top-N for the registered report so the OOV fold path is
# actually exercised at every SF (the synthetic vocabulary is ~50
# types; 2000 would leave the OOV bucket empty).
REPORT_TOP_N = 20

# The report's slices are fixed on the catalog table: even doc_id is
# the reference slice, odd the current one.
_REF_PRED = "doc_id % 2 = 0"
_CUR_PRED = "doc_id % 2 = 1"


def _l1_value(num, t_ref, t_cur):
    """|Σ num| / (t_ref·t_cur) with one IEEE division; 0.0 when either
    side is empty. ``num`` must already be an exact (decimal) sum."""
    return F.when(
        (t_ref > 0) & (t_cur > 0),
        num.cast("double") / (t_ref.cast("double") * t_cur.cast("double")),
    ).otherwise(F.lit(0.0))


def corpus_drift_report(spark, sf_dir: str):
    """Fixed-slice drift report over ``documents`` (even vs odd
    ``doc_id``): four ``(metric, value)`` rows —

    - ``vocab_l1_distance``: L1 distance between the two unigram
      distributions over top-``REPORT_TOP_N`` ∪ OOV-fold, in [0, 2].
    - ``lang_mix_l1``: L1 distance between language share vectors.
    - ``mean_tokens_rel_shift``: |mean_cur − mean_ref| / mean_ref of
      per-document token counts.
    - ``ttr_shift``: |TTR_cur − TTR_ref| (corpus-level type-token
      ratios).

    Every metric is Σ|a·d − c·b| — an exact integer (decimal(38,0))
    numerator — divided ONCE by an exact-product denominator, so both
    engines agree bit-for-bit (no log, no float accumulation; the
    ``bigram_lift`` convention). Scale shape is corpus_drift's: two
    explode→partial-count passes, top-N as TakeOrderedAndProject,
    every join bounded by 2·top_n+1 (vocab) or lang-cardinality rows.
    """
    from cdc_cascade_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ref = docs.filter(F.expr(_REF_PRED))
    cur = docs.filter(F.expr(_CUR_PRED))

    dec = "decimal(38,0)"

    # --- vocab L1 over top-N ∪ top-N (+ OOV fold) ---
    ref_counts = _unigram_counts(ref).localCheckpoint(eager=False)
    cur_counts = _unigram_counts(cur).localCheckpoint(eager=False)
    vocab = (
        ref_counts.orderBy(F.desc("n"), F.asc("token")).limit(REPORT_TOP_N)
        .select("token")
        .unionByName(
            cur_counts.orderBy(F.desc("n"), F.asc("token")).limit(REPORT_TOP_N)
            .select("token")
        )
        .distinct()
    )

    def fold(counts, out: str):
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
    vterm = F.abs(
        F.col("n_ref").cast(dec) * F.col("t_cur")
        - F.col("n_cur").cast(dec) * F.col("t_ref")
    )
    vrow = joint.crossJoin(F.broadcast(tot)).agg(
        F.sum(vterm).alias("num"),
        F.max("t_ref").alias("t_ref"),
        F.max("t_cur").alias("t_cur"),
    )
    vocab_l1 = vrow.select(
        _l1_value(F.col("num"), F.col("t_ref"), F.col("t_cur")).alias("value")
    )

    # --- per-side (lang, n, sum_toks, sum_dist) in ONE corpus pass:
    # the lang-mix metric reads the counts, the length/TTR metrics
    # re-reduce the same tiny frame (integer sums are associative, so
    # regrouping cannot change any metric value vs the oracle's
    # separate global aggregates). Lazy localCheckpoint snapshots the
    # lang-cardinality frame so both consumers share the scan.
    def side_stats(d):
        toks = tokens(F.col("text"))
        return (
            d.select(
                F.coalesce(F.col("lang"), F.lit(_NULL_LANG)).alias("lang"),
                F.size(toks).cast("bigint").alias("n_toks"),
                F.size(F.array_distinct(toks)).cast("bigint").alias("n_dist"),
            )
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_toks").alias("st"),
                F.sum("n_dist").alias("sd"),
            )
            .localCheckpoint(eager=False)
        )

    ref_stats = side_stats(ref)
    cur_stats = side_stats(cur)

    def lang_counts(s, out: str):
        return s.select("lang", F.col("n").alias(out))

    ljoint = (
        lang_counts(ref_stats, "n_ref")
        .join(lang_counts(cur_stats, "n_cur"), "lang", "full")
        .na.fill(0, ["n_ref", "n_cur"])
    )
    ltot = ljoint.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    lterm = F.abs(
        F.col("n_ref").cast(dec) * F.col("t_cur")
        - F.col("n_cur").cast(dec) * F.col("t_ref")
    )
    lrow = ljoint.crossJoin(F.broadcast(ltot)).agg(
        F.sum(lterm).alias("num"),
        F.max("t_ref").alias("t_ref"),
        F.max("t_cur").alias("t_cur"),
    )
    lang_l1 = lrow.select(
        _l1_value(F.col("num"), F.col("t_ref"), F.col("t_cur")).alias("value")
    )

    # --- length + diversity shifts (re-reduced from the side frames) ---
    def global_stats(s):
        return s.agg(
            F.sum("n").alias("n_docs"),
            F.sum("st").alias("sum_toks"),
            F.sum("sd").alias("sum_dist"),
        )

    stats = (
        global_stats(ref_stats)
        .crossJoin(F.broadcast(global_stats(cur_stats)).toDF("n2", "st2", "sd2"))
    )
    mean_num = F.abs(
        F.col("st2").cast(dec) * F.col("n_docs")
        - F.col("sum_toks").cast(dec) * F.col("n2")
    )
    mean_shift = F.when(
        (F.col("n2") > 0) & (F.col("sum_toks") > 0),
        mean_num.cast("double")
        / (F.col("n2").cast("double") * F.col("sum_toks").cast("double")),
    ).otherwise(F.lit(0.0))
    ttr_num = F.abs(
        F.col("sd2").cast(dec) * F.col("sum_toks")
        - F.col("sum_dist").cast(dec) * F.col("st2")
    )
    ttr_shift = F.when(
        (F.col("sum_toks") > 0) & (F.col("st2") > 0),
        ttr_num.cast("double")
        / (F.col("sum_toks").cast("double") * F.col("st2").cast("double")),
    ).otherwise(F.lit(0.0))
    shifts = stats.select(
        mean_shift.alias("len_shift"), ttr_shift.alias("ttr_shift")
    )

    return (
        vocab_l1.select(
            F.lit("vocab_l1_distance").alias("metric"), F.col("value")
        )
        .unionByName(
            lang_l1.select(F.lit("lang_mix_l1").alias("metric"), F.col("value"))
        )
        .unionByName(
            shifts.select(
                F.lit("mean_tokens_rel_shift").alias("metric"),
                F.col("len_shift").alias("value"),
            )
        )
        .unionByName(
            shifts.select(
                F.lit("ttr_shift").alias("metric"),
                F.col("ttr_shift").alias("value"),
            )
        )
    )


def _drift_report_oracle_sql() -> str:
    from cdc_cascade_spark.llm.prep import TOKENS_SQL

    toks = TOKENS_SQL.format(x="text")
    # Sentinels only need to be collision-free WITHIN each engine (the
    # report's output is scalar metrics; bucket labels never leave the
    # statement), so the SQL side uses chr(1)-prefixed names instead of
    # embedding NUL bytes in the statement text.
    oov = "chr(1) || 'OOV'"
    nolang = "chr(1) || 'nolang'"
    top_n = REPORT_TOP_N
    return f"""
WITH ref AS (SELECT doc_id, lang, text FROM documents WHERE {_REF_PRED}),
cur AS (SELECT doc_id, lang, text FROM documents WHERE {_CUR_PRED}),
ref_counts AS (
  SELECT t AS token, COUNT(*) AS n
  FROM (SELECT unnest({toks}) AS t FROM ref) WHERE t <> '' GROUP BY t
),
cur_counts AS (
  SELECT t AS token, COUNT(*) AS n
  FROM (SELECT unnest({toks}) AS t FROM cur) WHERE t <> '' GROUP BY t
),
vocab AS (
  SELECT DISTINCT token FROM (
    (SELECT token FROM ref_counts ORDER BY n DESC, token LIMIT {top_n})
    UNION ALL
    (SELECT token FROM cur_counts ORDER BY n DESC, token LIMIT {top_n})
  )
),
fold_ref AS (
  SELECT CASE WHEN v.token IS NOT NULL THEN c.token ELSE {oov} END AS token,
         SUM(n) AS n_ref
  FROM ref_counts c LEFT JOIN vocab v ON c.token = v.token GROUP BY 1
),
fold_cur AS (
  SELECT CASE WHEN v.token IS NOT NULL THEN c.token ELSE {oov} END AS token,
         SUM(n) AS n_cur
  FROM cur_counts c LEFT JOIN vocab v ON c.token = v.token GROUP BY 1
),
joint AS (
  SELECT COALESCE(r.n_ref, 0) AS n_ref, COALESCE(u.n_cur, 0) AS n_cur
  FROM fold_ref r FULL JOIN fold_cur u ON r.token = u.token
),
tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM joint),
vrow AS (
  SELECT SUM(ABS(n_ref * t_cur - n_cur * t_ref)) AS num,
         MAX(t_ref) AS t_ref, MAX(t_cur) AS t_cur
  FROM joint, tot
),
lref AS (
  SELECT COALESCE(lang, {nolang}) AS lang, COUNT(*) AS n_ref
  FROM ref GROUP BY 1
),
lcur AS (
  SELECT COALESCE(lang, {nolang}) AS lang, COUNT(*) AS n_cur
  FROM cur GROUP BY 1
),
ljoint AS (
  SELECT COALESCE(r.n_ref, 0) AS n_ref, COALESCE(u.n_cur, 0) AS n_cur
  FROM lref r FULL JOIN lcur u ON r.lang = u.lang
),
ltot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM ljoint),
lrow AS (
  SELECT SUM(ABS(n_ref * t_cur - n_cur * t_ref)) AS num,
         MAX(t_ref) AS t_ref, MAX(t_cur) AS t_cur
  FROM ljoint, ltot
),
sref AS (
  SELECT COUNT(*) AS n_docs, SUM(n_toks) AS sum_toks, SUM(n_dist) AS sum_dist
  FROM (SELECT CAST(len({toks}) AS BIGINT) AS n_toks,
               CAST(len(list_distinct({toks})) AS BIGINT) AS n_dist
        FROM ref)
),
scur AS (
  SELECT COUNT(*) AS n_docs, SUM(n_toks) AS sum_toks, SUM(n_dist) AS sum_dist
  FROM (SELECT CAST(len({toks}) AS BIGINT) AS n_toks,
               CAST(len(list_distinct({toks})) AS BIGINT) AS n_dist
        FROM cur)
)
SELECT 'vocab_l1_distance' AS metric,
       CASE WHEN t_ref > 0 AND t_cur > 0
            THEN CAST(num AS DOUBLE)
                 / (CAST(t_ref AS DOUBLE) * CAST(t_cur AS DOUBLE))
            ELSE 0.0 END AS value
FROM vrow
UNION ALL
SELECT 'lang_mix_l1',
       CASE WHEN t_ref > 0 AND t_cur > 0
            THEN CAST(num AS DOUBLE)
                 / (CAST(t_ref AS DOUBLE) * CAST(t_cur AS DOUBLE))
            ELSE 0.0 END
FROM lrow
UNION ALL
SELECT 'mean_tokens_rel_shift',
       CASE WHEN c.n_docs > 0 AND r.sum_toks > 0
            THEN CAST(ABS(c.sum_toks * r.n_docs - r.sum_toks * c.n_docs)
                      AS DOUBLE)
                 / (CAST(c.n_docs AS DOUBLE) * CAST(r.sum_toks AS DOUBLE))
            ELSE 0.0 END
FROM sref r, scur c
UNION ALL
SELECT 'ttr_shift',
       CASE WHEN r.sum_toks > 0 AND c.sum_toks > 0
            THEN CAST(ABS(c.sum_dist * r.sum_toks - r.sum_dist * c.sum_toks)
                      AS DOUBLE)
                 / (CAST(r.sum_toks AS DOUBLE) * CAST(c.sum_toks AS DOUBLE))
            ELSE 0.0 END
FROM sref r, scur c
"""


ORACLE_DRIFT_REPORT = _drift_report_oracle_sql()


QUERIES: dict[str, tuple] = {
    "corpus_drift_report": (corpus_drift_report, ORACLE_DRIFT_REPORT),
}
