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

Oracle-gate exclusion: the operator takes a caller-chosen reference
frame and a scored frame (two-frame signature, like ``corpus_drift``),
so the fixed-table single-statement oracle contract does not apply;
correctness is pinned by model tests — hand-computed probabilities on
a tiny corpus, reference-slice self-scoring beating gibberish, filter
threshold semantics, and determinism.
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
