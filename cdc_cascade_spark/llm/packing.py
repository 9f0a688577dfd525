"""Sequence packing: assign documents to fixed-token training chunks.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension). LLM
pre-training consumes fixed-length token windows, not documents; the
standard "concatenate-and-chunk" packer lays the tokenized corpus out
as one long stream and slices it every ``PACK_BUDGET`` tokens, letting
documents straddle chunk boundaries. This operator computes, for every
document, exactly where it lands: its shard, its token offset in the
shard's stream, and the first/last chunk ids it touches.

Scale shape (100 TB):

- A single global prefix-sum would funnel the whole corpus through one
  window reducer. Instead the corpus is sharded by ``doc_id %
  PACK_SHARDS`` and each shard packs independently — the window
  (prefix sum of token counts ordered by doc_id) runs per shard, so
  the plan is one hash shuffle on ``shard`` followed by per-partition
  sorted aggregation. In production shards are sized so one shard's
  chunk stream ≈ one output file (thousands of shards, each a few GB);
  here 8 shards keep every shard multi-chunk at sf0.01.
- The window carries only (doc_id, n_tokens) — never text.
- Deterministic: integer token counts, integer prefix sums, integer
  ``div`` — bit-identical chunk assignment in both engines, across
  cluster layouts and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.prep import TOKENS_SQL, tokens

# Tokens per training chunk. Small on purpose: sf0.01 docs average ~50
# tokens, so 256 makes straddling (first_chunk != last_chunk) common
# enough to be exercised by the oracle. Production: 2048-8192.
PACK_BUDGET = 256
PACK_SHARDS = 8


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk layout: (doc → shard, offset, chunk span).

    Output: (doc_id, shard, n_tokens, start_offset, first_chunk,
    last_chunk) — ``start_offset`` is the exclusive prefix sum of
    token counts within the shard's doc_id order; a document occupies
    stream positions [start_offset, start_offset + n_tokens) and
    therefore chunks [start_offset div B, (start_offset + n_tokens -
    1) div B].
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    with_off = d.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    )
    return with_off.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {PACK_BUDGET}").alias("first_chunk"),
        F.expr(f"(start_offset + n_tokens - 1) div {PACK_BUDGET}").alias(
            "last_chunk"
        ),
    )


ORACLE_PACK = f"""
WITH d AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         len({TOKENS_SQL.format(x='text')}) AS n_tokens
  FROM documents
), o AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM d
)
SELECT doc_id, shard, n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {PACK_BUDGET} AS BIGINT) AS first_chunk,
       CAST((start_offset + n_tokens - 1) // {PACK_BUDGET} AS BIGINT) AS last_chunk
FROM o
"""


# Overlapping chunking (RAG / embedding prep): fixed-size token windows
# with stride < size so consecutive chunks share SIZE−STRIDE tokens of
# context. Small sizes so multi-chunk docs are common at sf0.01
# (docs average ~50 tokens); production: 512/384 or similar.
CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document.

    Output: (doc_id, chunk_id, start_tok, end_tok, chunk_text) with
    ``[start_tok, end_tok)`` 0-based token spans. Chunk count is
    ``1`` for docs ≤ SIZE tokens, else ``ceil((n−SIZE)/STRIDE)+1``;
    the LAST chunk's start is clipped to ``n−SIZE`` so every chunk is
    full-size whenever the doc allows (the standard
    tokenizer-sliding-window convention).

    Scale shape: map-side explode only — each doc expands to
    ~n/STRIDE rows with no shuffle anywhere; the explode factor is
    bounded by document length, not corpus size. Chunk text is built
    by slicing the already-split token array (no re-tokenization).
    Deterministic: pure integer arithmetic, so chunk ids/spans are
    engine-identical.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n")
    )
    n_chunks = F.when(F.col("n") <= CHUNK_SIZE, F.lit(1)).otherwise(
        F.expr(f"(n - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE}") + 1
    )
    ch = d.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.least(
        F.col("chunk_id") * CHUNK_STRIDE,
        F.greatest(F.col("n") - CHUNK_SIZE, F.lit(0)),
    )
    end = F.least(start + CHUNK_SIZE, F.col("n"))
    return ch.select(
        "doc_id",
        "chunk_id",
        start.alias("start_tok"),
        end.alias("end_tok"),
        F.concat_ws(
            " ", F.slice("toks", start + 1, end - start)
        ).alias("chunk_text"),
    )


ORACLE_CHUNKS = f"""
WITH d AS (
  SELECT doc_id, {TOKENS_SQL.format(x='text')} AS toks,
         len({TOKENS_SQL.format(x='text')}) AS n
  FROM documents
), nc AS (
  SELECT *,
         CASE WHEN n <= {CHUNK_SIZE} THEN 1
              ELSE (n - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1
         END AS n_chunks
  FROM d
), ch AS (
  SELECT doc_id, toks, n, unnest(range(n_chunks)) AS chunk_id FROM nc
), sp AS (
  SELECT doc_id, chunk_id,
         least(chunk_id * {CHUNK_STRIDE}, greatest(n - {CHUNK_SIZE}, 0)) AS start_tok,
         least(least(chunk_id * {CHUNK_STRIDE}, greatest(n - {CHUNK_SIZE}, 0))
               + {CHUNK_SIZE}, n) AS end_tok,
         toks
  FROM ch
)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(start_tok AS INTEGER) AS start_tok,
       CAST(end_tok AS INTEGER) AS end_tok,
       array_to_string(toks[start_tok + 1:end_tok], ' ') AS chunk_text
FROM sp
"""


QUERIES: dict[str, tuple] = {
    "pack_sequences": (pack_sequences, ORACLE_PACK),
    "doc_chunks": (doc_chunks, ORACLE_CHUNKS),
}
