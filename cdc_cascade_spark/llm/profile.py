"""Corpus profiling: the per-stratum "dataset card" summary.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): every
released pretraining corpus ships a datasheet — per (language, source)
stratum: document count, token volume, length distribution markers,
and a lexical-diversity score. This operator computes it in one pass;
it is also the input to mixture design (token_budget_selection's
budgets come from exactly this table).

Scale shape (100 TB): one hash shuffle on the (lang, source) stratum
key; counts and sums partial-aggregate map-side. The exact percentiles
buffer each stratum's values in the reducer (the same trade q18
documents) — at 100 TB swap them for ``percentile_approx`` (t-digest),
which is engine-specific sketch state and therefore deliberately
outside the oracle gate. Everything else is exact integer arithmetic
plus two single double-divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.prep import TOKENS_SQL, tokens


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) datasheet row: (lang, source, n_docs,
    sum_tokens, median_chars, p90_tokens, corpus_ttr)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    d = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_dist"),
    )
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("sum_tokens"),
        F.expr("percentile(n_chars, 0.5)").alias("median_chars"),
        F.expr("percentile(n_toks, 0.9)").alias("p90_tokens"),
        (
            F.sum("n_dist").cast("double") / F.sum("n_toks").cast("double")
        ).alias("corpus_ttr"),
    )


ORACLE_CORPUS_PROFILE = f"""
WITH d AS (
  SELECT lang, source, n_chars,
         len({TOKENS_SQL.format(x='text')}) AS n_toks,
         len(list_distinct({TOKENS_SQL.format(x='text')})) AS n_dist
  FROM documents
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS sum_tokens,
       quantile_cont(n_chars, 0.5) AS median_chars,
       quantile_cont(n_toks, 0.9) AS p90_tokens,
       SUM(n_dist)::DOUBLE / SUM(n_toks)::DOUBLE AS corpus_ttr
FROM d
GROUP BY lang, source
"""


QUERIES: dict[str, tuple] = {
    "corpus_profile": (corpus_profile, ORACLE_CORPUS_PROFILE),
}
