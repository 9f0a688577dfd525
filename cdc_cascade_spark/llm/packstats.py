"""Packing-efficiency report: what the concat-and-chunk layout costs.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension). After
``llm/packing.py::pack_sequences`` lays the corpus out as fixed-budget
training chunks, the run report every training team asks for is: how
full are the chunks, how much compute is padding, and how many
documents straddle a chunk boundary (straddlers matter for attention-
masking strategies and for loss bookkeeping). This module rolls the
per-document layout up per shard:

``(shard, n_docs, n_straddlers, total_tokens, n_chunks,
padding_tokens, fill_rate)``

- ``n_chunks``   = max(last_chunk) + 1 — chunks the shard's stream
  actually occupies;
- ``padding_tokens`` = n_chunks·BUDGET − total_tokens — concat-and-
  chunk only pads the final chunk of each shard, so waste is exactly
  the unfilled tail;
- ``fill_rate``  = total_tokens / (n_chunks·BUDGET) — ONE IEEE
  division of two exact bigints (the cross-engine determinism
  convention).

Scale shape: rides ``pack_sequences``'s plan (one hash shuffle on the
shard key + per-shard window) and adds a shard-keyed aggregate with
map-side partial aggregation — thousands of shards at production
scale, each a few GB of stream, so the rollup is reducer-bounded by
the shard count, never the corpus.

The oracle embeds ``ORACLE_PACK`` verbatim as a materialized CTE (the
curate_corpus composition pattern), so this report cannot drift from
the verified layout query.

Built in r8 after that round's 50-slot driver window was already
committed (the established late-surface pattern); registered in
r9. tests/test_packstats.py pins the oracle agreement and the
model invariants alongside the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.llm.packing import ORACLE_PACK, PACK_BUDGET, pack_sequences


def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard chunk-fill report over the ``pack_sequences`` layout."""
    layout = pack_sequences(spark, sf_dir)
    agg = layout.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            (F.col("first_chunk") != F.col("last_chunk")).cast("bigint")
        ).alias("n_straddlers"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (F.max("last_chunk") + 1).cast("bigint").alias("n_chunks"),
    )
    capacity = F.col("n_chunks") * F.lit(PACK_BUDGET)
    return agg.select(
        "shard",
        "n_docs",
        "n_straddlers",
        "total_tokens",
        "n_chunks",
        (capacity - F.col("total_tokens")).cast("bigint").alias("padding_tokens"),
        (F.col("total_tokens").cast("double") / capacity).alias("fill_rate"),
    )


ORACLE_PACKING_EFFICIENCY = f"""
WITH layout AS MATERIALIZED (SELECT * FROM ({ORACLE_PACK}) t),
agg AS (
  SELECT shard,
         COUNT(*)::BIGINT AS n_docs,
         SUM(CASE WHEN first_chunk <> last_chunk THEN 1 ELSE 0 END)::BIGINT
           AS n_straddlers,
         SUM(n_tokens)::BIGINT AS total_tokens,
         (MAX(last_chunk) + 1)::BIGINT AS n_chunks
  FROM layout GROUP BY shard
)
SELECT shard, n_docs, n_straddlers, total_tokens, n_chunks,
       (n_chunks * {PACK_BUDGET} - total_tokens)::BIGINT AS padding_tokens,
       total_tokens::DOUBLE / (n_chunks * {PACK_BUDGET}) AS fill_rate
FROM agg
"""


QUERIES: dict[str, tuple] = {
    "packing_efficiency": (packing_efficiency, ORACLE_PACKING_EFFICIENCY),
}
