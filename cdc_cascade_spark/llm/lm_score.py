"""N-gram language-model scoring: the perplexity-style quality filter.

The CCNet/Gopher-family pipelines score every candidate document
against a language model trained on a trusted reference corpus and
drop the tail — text that the reference LM finds surprising is
boilerplate, gibberish, wrong-language, or template spam. The
production filter uses a KenLM 5-gram; this module implements the same
shape with a bigram LM with add-k smoothing, exactly computable inside
the engine (no external model artifact), which is what makes it usable
as a distributed operator: the "model" is a DataFrame.

- ``train_bigram_lm``: unigram + bigram counts over the reference
  slice — two explode → map-side partial count passes, vocab-sized
  outputs (the model is orders of magnitude smaller than the corpus).
- ``score_documents``: per document, the mean negative log2
  probability of its token transitions under the trained model
  (lower = more reference-like). Add-k smoothing over the reference
  vocabulary keeps unseen transitions finite; out-of-vocabulary
  tokens fall back to the unknown-word probability mass. The join
  shape is (doc bigrams) ⋈ (model bigrams) on the bigram key — the
  model side is vocab²-sparse (observed bigrams only) and usually
  broadcastable; the unigram backoff joins the same way.
- ``lm_quality_filter``: keep documents whose score is at or below
  the per-corpus quantile threshold — the distributed-top-K threshold
  pattern shared with ``curation.quality_floor_filter``.

Scale shape: training is two shuffles on token keys (vocab-sized
reducers); scoring is two hash joins of the exploded doc-bigram
relation against model frames, then one groupBy(doc_id) mean — linear
in corpus token count, nothing corpus². At 100 TB the model frames
persist once and broadcast per batch.

Oracle-gate note: the general operators take a caller-chosen reference
frame and a scored frame (two-frame signature, like ``corpus_drift``),
so the fixed-table single-statement oracle contract does not apply to
them; correctness is pinned by model tests — hand-computed
probabilities on a tiny corpus, reference-slice self-scoring beating
gibberish, filter threshold semantics, and determinism.
``lm_score_filter`` below is the oracle-REGISTERED face (r8): the same
add-k bigram model over a fixed reference slice (even ``doc_id`` values)
with the per-transition and per-document decisions rewritten as exact
integer cross-multiplications — no log, no float accumulation — so the
scored-and-filtered corpus is ANSI-expressible and bit-deterministic
across engines (the ``gopher_quality_rules`` trick applied to LM
probabilities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_cascade_spark.llm.prep import tokens

LM_ADD_K = 0.1


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    toks = tokens(F.col("text"))
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select("doc_id", F.explode(pairs).alias("bg"))
        .select(
            "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
        # whitespace-split artifact: empty-string "tokens" from leading/
        # trailing whitespace are formatting, not vocabulary — scoring
        # them would penalize whitespace layout rather than content
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )


def train_bigram_lm(ref: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """(unigram_counts, bigram_counts, vocab_size) from the reference
    slice. Counts are exact longs; the frames ARE the model — and they
    are lineage-snapshotted here (eager localCheckpoint), because every
    consumer reads them at least twice (scoring joins + the threshold
    aggregate) and the snapshot stops each action from re-tokenizing
    the reference corpus."""
    uni = (
        ref.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .localCheckpoint(eager=True)
    )
    bi = (
        _doc_bigrams(ref)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_bg"))
        .localCheckpoint(eager=True)
    )
    vocab_size = uni.count()
    return uni, bi, vocab_size


def score_documents(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab_size: int,
    add_k: float = LM_ADD_K,
) -> DataFrame:
    """(doc_id, n_transitions, lm_score): mean −log2 P(w2|w1) over the
    document's token transitions under the add-k-smoothed bigram model.

    P(w2|w1) = (count(w1,w2) + k) / (count(w1) + k·(V+1)) — the +1
    reserves unknown-word mass, so OOV transitions score via the same
    formula with zero counts (finite, strictly worse than observed
    ones). Documents with no transitions (≤1 token) get NULL, not a
    fake score.
    """
    dbg = _doc_bigrams(docs)
    scored = (
        dbg.join(bi, ["w1", "w2"], "left")
        .join(uni, dbg["w1"] == uni["w"], "left")
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.coalesce(F.col("n_bg"), F.lit(0)) + F.lit(add_k))
                    / (
                        F.coalesce(F.col("n_w"), F.lit(0))
                        + F.lit(add_k) * (vocab_size + 1)
                    )
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.avg("nll").alias("lm_score"),
    )


def lm_quality_filter(
    docs: DataFrame, ref: DataFrame, keep_quantile: float = 0.9
) -> DataFrame:
    """Documents of ``docs`` whose LM score sits at or below the
    ``keep_quantile`` threshold of the scored population (lower score =
    more reference-like). The threshold is a 1-row aggregate joined
    back — the distributed-threshold pattern, no driver-side cut.

    Documents with ≤1 token have no transitions and therefore no
    score: the LM has no evidence against them, so they are KEPT and
    returned with ``n_transitions = 0`` and NULL ``lm_score`` (a
    perplexity filter must never silently drop data it could not
    judge; length-based policies belong to ``quality_floor_filter``).
    """
    uni, bi, vocab = train_bigram_lm(ref)
    scores = score_documents(docs, uni, bi, vocab)
    thr = scores.agg(
        F.expr(f"percentile(lm_score, {keep_quantile})").alias("thr")
    )
    all_docs = docs.select("doc_id")
    joined = all_docs.join(scores, "doc_id", "left").crossJoin(
        F.broadcast(thr)
    )
    return joined.filter(
        F.col("lm_score").isNull() | (F.col("lm_score") <= F.col("thr"))
    ).select(
        "doc_id",
        F.coalesce(F.col("n_transitions"), F.lit(0)).cast("bigint").alias(
            "n_transitions"
        ),
        "lm_score",
    )


# ---------------------------------------------------------------------------
# Oracle-registered integer-decision face (r8)
# ---------------------------------------------------------------------------

# A transition is "improbable" iff P(w2|w1) < 1/LM_IMPROB_DEN under the
# add-0.1-smoothed bigram model. With k = 1/10,
#   P(w2|w1) = (10*n_bg + 1) / (10*n_w1 + V + 1),
# so the decision is the integer cross-multiplication
#   LM_IMPROB_DEN * (10*n_bg + 1) < 10*n_w1 + V + 1
# — exact in both engines, no division, no log. Both products stay far
# below 2^63 at any corpus size (LHS is ~40x the bigram count, RHS ~10x
# the unigram count).
LM_IMPROB_DEN = 40
# A document is kept iff improbable transitions are at most
# LM_KEEP_PCT percent of its transitions: n_improbable * 100 <=
# n_transitions * LM_KEEP_PCT (documents with no transitions are kept —
# the LM has no evidence against them; see lm_quality_filter).
LM_KEEP_PCT = 20


def lm_score_filter(spark, sf_dir: str) -> DataFrame:
    """Per-document LM admission verdicts over the ``documents`` table:
    ``(doc_id, n_transitions, n_improbable, kept)``.

    The reference slice is the even-``doc_id`` half of the corpus (the
    fixed-slice convention shared with ``corpus_drift_report``); every
    document — both halves — is scored against the model trained on it.
    ``n_improbable`` counts transitions whose smoothed conditional
    probability falls below 1/``LM_IMPROB_DEN``; ``kept`` applies the
    ``LM_KEEP_PCT``-percent ceiling. On a homogeneous corpus the rule
    correctly converges to keep-everything as reference evidence grows
    (more observations → fewer surprising transitions); the per-doc
    counts remain the discriminating signal at any scale.

    Scale shape: identical to ``score_documents`` — the model frames
    are vocab-sized (broadcastable), the doc-bigram relation is corpus
    linear, and the only corpus-sized shuffle is the final
    ``groupBy(doc_id)`` with map-side partial aggregation. The vocab
    size is a single bounded driver scalar (one row), the same class as
    the centroid-count collects.
    """
    from cdc_cascade_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    uni, bi, vocab = train_bigram_lm(ref)
    dbg = _doc_bigrams(docs)
    uni1 = uni.select(F.col("w").alias("w1"), "n_w")
    improb = (
        F.lit(LM_IMPROB_DEN)
        * (10 * F.coalesce(F.col("n_bg"), F.lit(0)) + 1)
        < 10 * F.coalesce(F.col("n_w"), F.lit(0)) + F.lit(vocab + 1)
    )
    per_doc = (
        dbg.join(bi, ["w1", "w2"], "left")
        .join(uni1, "w1", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.sum(improb.cast("bigint")).alias("n_improbable"),
        )
    )
    out = docs.select("doc_id").join(per_doc, "doc_id", "left")
    n_tr = F.coalesce(F.col("n_transitions"), F.lit(0))
    n_im = F.coalesce(F.col("n_improbable"), F.lit(0))
    return out.select(
        "doc_id",
        n_tr.alias("n_transitions"),
        n_im.alias("n_improbable"),
        (n_im * 100 <= n_tr * F.lit(LM_KEEP_PCT)).alias("kept"),
    )


# The oracle prefilters empty split artifacts from the token list;
# Spark filters them per-pair instead (_doc_bigrams). Equivalent:
# `\s+` splitting can only produce empty strings at the array edges,
# where dropping the token and dropping its pairs coincide.
ORACLE_LM_SCORE_FILTER = rf"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
  FROM documents
), ref AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
uni AS MATERIALIZED (
  SELECT w, COUNT(*)::BIGINT AS n_w
  FROM (SELECT unnest(toks) AS w FROM ref) GROUP BY w
),
bi AS MATERIALIZED (
  SELECT s.w1 AS w1, s.w2 AS w2, COUNT(*)::BIGINT AS n_bg FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
                  i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
    FROM ref) GROUP BY 1, 2
),
v AS (SELECT COUNT(*)::BIGINT AS v FROM uni),
dbg AS (
  SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                   i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
    FROM tok) t
),
per_doc AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_transitions,
         SUM(CASE WHEN {LM_IMPROB_DEN} * (10*COALESCE(b.n_bg, 0) + 1)
                       < 10*COALESCE(u.n_w, 0) + (SELECT v FROM v) + 1
                  THEN 1 ELSE 0 END)::BIGINT AS n_improbable
  FROM dbg d LEFT JOIN bi b USING (w1, w2) LEFT JOIN uni u ON d.w1 = u.w
  GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(p.n_transitions, 0)::BIGINT AS n_transitions,
       COALESCE(p.n_improbable, 0)::BIGINT AS n_improbable,
       (COALESCE(p.n_improbable, 0) * 100
          <= COALESCE(p.n_transitions, 0) * {LM_KEEP_PCT}) AS kept
FROM tok t LEFT JOIN per_doc p USING (doc_id)
"""


QUERIES: dict[str, tuple] = {
    "lm_score_filter": (lm_score_filter, ORACLE_LM_SCORE_FILTER),
}
