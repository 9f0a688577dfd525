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
SELECT doc_id, shard, n_tokens, start_offset,
       start_offset // {PACK_BUDGET} AS first_chunk,
       (start_offset + n_tokens - 1) // {PACK_BUDGET} AS last_chunk
FROM o
"""


QUERIES: dict[str, tuple] = {
    "pack_sequences": (pack_sequences, ORACLE_PACK),
}
