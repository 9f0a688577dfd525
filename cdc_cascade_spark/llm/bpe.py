"""Multi-round BPE training: learn the first K merges corpus-wide.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension; r4
verdict #8). ``text.bpe_apply_top_merge`` does ONE training iteration;
this module loops it: each round finds the most frequent adjacent
pre-token pair over the CURRENT (already-merged) token stream, applies
the merge corpus-wide, and continues — exactly the greedy BPE training
loop, distributed.

Scale shape (100 TB):

- Per round: split the separator-joined stream → zip-with adjacent
  pairs → explode → map-side partial count → one shuffle on the pair
  key → top-1 via TakeOrderedAndProject (a bounded 1-row collect, the
  merge decision every trainer must centralize). The merge apply is a
  map-only string ``replace``. Nothing in a round is corpus² and the
  only driver data is K winner rows.
- The stream frame is ``localCheckpoint``-ed every
  ``BPE_CHECKPOINT_EVERY`` rounds (same lineage-truncation pattern as
  ``dedup.connected_components``) — NOT every round: a checkpoint
  materializes the full merged corpus, while re-deriving a few chained
  string ``replace``s on top of the last snapshot is nearly free.
  Measured at sf0.1/K=6: per-round checkpoints 10.3 s cold / 4.0 s
  warm; every-8 (i.e. none intermediate at K=6) 3.2 s for identical
  merges. The cadence bounds re-derivation at O(cadence) replaces per
  aggregation and keeps the analyzed plan constant-size for
  production-scale K (30k+ merges). On a real cluster swap in
  reliable ``checkpoint()``.
- Determinism: counts are exact integers and ties break on the pair
  string, so the learned merge table is bit-identical in both engines
  and across partitionings (pinned by a property test).

The greedy left-to-right non-overlapping merge is expressed as the
tokenwise-anchored string ``replace`` ``␟a␟␟b␟ → ␟ab␟`` over the
sentinel/doubled-separator encoded stream — see
``text._bpe_encode_stream`` for the proof that replace-all over this
encoding IS the greedy merge rule and can never splice a token's
suffix onto the next token's prefix (the boundary-bleed defect of the
unanchored single-separator encoding). Pre-tokens
(``text.BPE_PATTERN``) can never contain a space; the separator
itself IS matchable by the pattern's symbol branch, so raw text is
sanitized (``\\x1f`` stripped) before pre-tokenization. With that, the
"a b" pair encoding is unambiguous even for already-merged
super-tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.text import (
    _BPE_DECODE_SQL,
    _BPE_ENCODE_SQL,
    _BPE_MERGE_SQL,
    _bpe_decode_tokens,
    _bpe_encode_stream,
    _bpe_merge_stream,
    _bpe_pretokens,
    BPE_PATTERN,
)

# Six rounds keeps the oracle's staged SQL readable while exercising
# the loop shape (merged super-tokens re-merging). Production: 30k+
# rounds with periodic reliable checkpoints.
BPE_K = 6

# Lineage-truncation cadence: chain up to this many map-only merge
# replaces before snapshotting the stream (see module docstring for
# the measured tradeoff).
BPE_CHECKPOINT_EVERY = 8


def _adjacent_pairs(stream_col) -> "F.Column":
    toks = _bpe_decode_tokens(stream_col)
    # greatest(n-1, 0): a pretoken-less doc decodes to [] and slice
    # rejects negative lengths
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )


# Trained state shared per (applicationId, sf_dir, k): the merge table
# AND the fully-merged per-doc stream frame, so the trainer query and
# the corpus-encode query pay the K-round loop once per session (the
# doc_fingerprint/shingle-relation sharing pattern). Bounded like
# BoundedDFCache; evicted streams are localCheckpoint RDDs the JVM
# GC reclaims once unreferenced.
_TRAIN_CACHE: dict[tuple, tuple[list, DataFrame]] = {}
_TRAIN_CACHE_MAX = 4


def _trained(
    spark: SparkSession, sf_dir: str, k: int
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Run (or fetch) the K-round training loop; returns the merge list
    and the final (doc_id, n_pretokens, stream) frame with every merge
    applied, checkpointed."""
    key = (spark.sparkContext.applicationId, sf_dir, k)
    if key in _TRAIN_CACHE:
        return _TRAIN_CACHE[key]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pre = _bpe_pretokens(F.col("text"))
    stream = docs.select(
        "doc_id",
        F.size(pre).cast("bigint").alias("n_pretokens"),
        _bpe_encode_stream(pre).alias("stream"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, int]] = []
    pending = 0
    for rank in range(1, k + 1):
        top = (
            stream.select(F.explode(_adjacent_pairs(F.col("stream"))).alias("pair"))
            .filter(F.col("pair") != "")
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:  # corpus exhausted (every doc a single token)
            break
        row = top[0]
        a, b = row.pair.split(" ", 1)
        merges.append((rank, row.pair, row.n_occurrences))
        stream = stream.select(
            "doc_id",
            "n_pretokens",
            _bpe_merge_stream(F.col("stream"), a, b).alias("stream"),
        )
        pending += 1
        if pending >= BPE_CHECKPOINT_EVERY:
            stream = stream.localCheckpoint(eager=True)
            pending = 0
    if pending:
        stream = stream.localCheckpoint(eager=True)
    while len(_TRAIN_CACHE) >= _TRAIN_CACHE_MAX:
        _TRAIN_CACHE.pop(next(iter(_TRAIN_CACHE)))
    _TRAIN_CACHE[key] = (merges, stream)
    return merges, stream


def bpe_train_k_merges(
    spark: SparkSession, sf_dir: str, k: int = BPE_K
) -> DataFrame:
    """Learn the first ``k`` BPE merges; output the merge table
    ``(merge_rank, pair, n_occurrences)`` — rank 1 is the first merge
    learned, ``n_occurrences`` its frequency at the time it was chosen
    (over the stream with all prior merges applied).
    """
    merges, _stream = _trained(spark, sf_dir, k)
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, n_occurrences bigint"
    )


def bpe_encode_corpus(spark: SparkSession, sf_dir: str, k: int = BPE_K) -> DataFrame:
    """Tokenize the corpus with the trained merges — the apply face of
    the trainer, and the operator a 100 TB pipeline actually runs per
    ingest once the vocabulary is frozen: (doc_id, n_pretokens,
    n_tokens, encoded_prefix), where ``n_tokens`` counts the stream
    after all K merges and ``encoded_prefix`` pins the first 8 tokens'
    actual content.

    Rides the session-cached trained state (one training loop per
    (session, sf_dir, k) feeds BOTH this and ``bpe_train_k_merges``);
    the apply itself is map-only chained ``replace`` — no shuffle.

    Registered in r8 (built in r7 after that round's driver window was
    committed); tests/test_llm_bpe_encode.py pins the encode semantics
    alongside the oracle row.
    """
    _merges, stream = _trained(spark, sf_dir, k)
    toks = _bpe_decode_tokens(F.col("stream"))
    return stream.select(
        "doc_id",
        "n_pretokens",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", F.slice(toks, 1, 8)).alias("encoded_prefix"),
    )


def _oracle_train_sql(k: int = BPE_K) -> str:
    """Staged SQL mirror: K unrolled (pairs_i → top_i → stream_{i+1})
    stages — the loop is a compile-time constant, so unrolling keeps
    the oracle a single ANSI statement DuckDB can run."""
    parts = [
        f"""
WITH pre AS (
  SELECT regexp_extract_all(replace(text, chr(31), ''), '{BPE_PATTERN}') AS p
  FROM documents
), s1 AS MATERIALIZED (
  SELECT {_BPE_ENCODE_SQL.format(p='p')} AS stream FROM pre
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""
, pairs{i} AS MATERIALIZED (
  SELECT unnest(list_transform(range(1, len(m)), j -> m[j] || ' ' || m[j+1])) AS pair
  FROM (SELECT {_BPE_DECODE_SQL.format(s='stream')} AS m FROM s{i})
), top{i} AS (
  SELECT {i} AS merge_rank, pair, COUNT(*) AS n
  FROM pairs{i} WHERE pair <> ''
  GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 1
)"""
        )
        if i < k:
            merge_expr = _BPE_MERGE_SQL.format(
                s="stream", pair=f"(SELECT pair FROM top{i})"
            )
            parts.append(
                f"""
, s{i + 1} AS MATERIALIZED (
  SELECT {merge_expr} AS stream
  FROM s{i}
)"""
            )
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, pair, n FROM top{i}" for i in range(1, k + 1)
    )
    parts.append(
        f"""
SELECT CAST(merge_rank AS INTEGER) AS merge_rank, pair,
       CAST(n AS BIGINT) AS n_occurrences
FROM ({union})
ORDER BY merge_rank
"""
    )
    return "".join(parts)


ORACLE_BPE_TRAIN = _oracle_train_sql()


def _oracle_encode_sql(k: int = BPE_K) -> str:
    """Encode oracle: the train oracle's staged unroll, carrying
    (doc_id, n_pretokens) through every stage and applying ALL K
    merges. Each merge is guarded on its top-pair existing so an
    exhausted corpus (fewer than K learnable merges) degrades exactly
    like the Spark loop's early break instead of NULLing the stream."""
    parts = [
        f"""
WITH pre AS (
  SELECT doc_id,
         regexp_extract_all(replace(text, chr(31), ''), '{BPE_PATTERN}') AS p
  FROM documents
), s1 AS MATERIALIZED (
  SELECT doc_id, CAST(len(p) AS BIGINT) AS n_pretokens,
         {_BPE_ENCODE_SQL.format(p='p')} AS stream
  FROM pre
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""
, pairs{i} AS MATERIALIZED (
  SELECT unnest(list_transform(range(1, len(m)), j -> m[j] || ' ' || m[j+1])) AS pair
  FROM (SELECT {_BPE_DECODE_SQL.format(s='stream')} AS m FROM s{i})
), top{i} AS (
  SELECT pair FROM pairs{i} WHERE pair <> ''
  GROUP BY pair ORDER BY COUNT(*) DESC, pair ASC LIMIT 1
)"""
        )
        merge_expr = _BPE_MERGE_SQL.format(
            s="stream", pair=f"(SELECT pair FROM top{i})"
        )
        parts.append(
            f"""
, s{i + 1} AS MATERIALIZED (
  SELECT doc_id, n_pretokens,
         CASE WHEN (SELECT COUNT(*) FROM top{i}) = 0
              THEN stream ELSE {merge_expr} END AS stream
  FROM s{i}
)"""
        )
    parts.append(
        f"""
SELECT doc_id, n_pretokens,
       CAST(len(m) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(m, 1, 8), ' ') AS encoded_prefix
FROM (SELECT doc_id, n_pretokens, {_BPE_DECODE_SQL.format(s='stream')} AS m
      FROM s{k + 1})
"""
    )
    return "".join(parts)


ORACLE_BPE_ENCODE = _oracle_encode_sql()


QUERIES: dict[str, tuple] = {
    "bpe_train_k_merges": (bpe_train_k_merges, ORACLE_BPE_TRAIN),
    "bpe_encode_corpus": (bpe_encode_corpus, ORACLE_BPE_ENCODE),
}


def bpe_fertility_by_lang(
    spark: SparkSession, sf_dir: str, k: int = BPE_K
) -> DataFrame:
    """Per-language tokenizer fertility under the trained merges:
    ``(lang, n_docs, sum_pretokens, sum_tokens, symbols_per_word)``.

    The report every tokenizer-training run ends with: how many
    symbols does the vocabulary spend per word, per language? A
    language whose fertility stays near its character count is being
    under-served by the learned merges (its byte-pairs never won a
    round) — the signal used to rebalance the training mix or grow
    the vocab. ``symbols_per_word`` is the ONE IEEE division of two
    exact bigint sums (the cross-engine determinism convention).

    Rides the shared (session, sf_dir, k) trained state; the rollup
    adds one doc_id join against the documents scan and a lang-keyed
    aggregate (map-side partial, ~langs reducers).

    Built in r8 after that round's window was already committed (the
    established late-surface pattern); registered in r9.
    tests/test_llm_bpe_encode.py pins the oracle agreement and the
    fertility invariants alongside the driver row.
    """
    _merges, stream = _trained(spark, sf_dir, k)
    toks = _bpe_decode_tokens(F.col("stream"))
    per_doc = stream.select(
        "doc_id",
        "n_pretokens",
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    agg = (
        per_doc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_pretokens").cast("bigint").alias("sum_pretokens"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )
    return agg.select(
        "lang",
        "n_docs",
        "sum_pretokens",
        "sum_tokens",
        F.when(
            F.col("sum_pretokens") > 0,
            F.col("sum_tokens").cast("double") / F.col("sum_pretokens"),
        ).alias("symbols_per_word"),
    )


ORACLE_BPE_FERTILITY = f"""
WITH enc AS MATERIALIZED (SELECT * FROM ({ORACLE_BPE_ENCODE}) t)
SELECT d.lang,
       COUNT(*)::BIGINT AS n_docs,
       SUM(e.n_pretokens)::BIGINT AS sum_pretokens,
       SUM(e.n_tokens)::BIGINT AS sum_tokens,
       CASE WHEN SUM(e.n_pretokens) > 0
            THEN SUM(e.n_tokens)::DOUBLE / SUM(e.n_pretokens) END
         AS symbols_per_word
FROM enc e JOIN documents d USING (doc_id)
GROUP BY d.lang
"""

QUERIES["bpe_fertility_by_lang"] = (bpe_fertility_by_lang, ORACLE_BPE_FERTILITY)
