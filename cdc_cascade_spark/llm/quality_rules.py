"""Rule-based document quality gating (Gopher-style heuristics).

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): the
public web-corpus curation literature (Gopher, Rae et al. 2021 §A1.1;
C4, Raffel et al. 2020; RefinedWeb, Penedo et al. 2023) gates crawl
documents through cheap structural heuristics BEFORE any model-based
scoring: word-count bounds, mean word length, symbol-to-word ratio,
alphabetic-word fraction, and stop-word presence. This module computes
the per-document rule flags and the composite ``keep`` decision.

Determinism contract (the repo-wide oracle convention): every rule is
evaluated in EXACT INTEGER arithmetic — ratio thresholds are cleared
by cross-multiplication (``10 * n_symbol_words <= n_words`` instead of
``n_symbol_words / n_words <= 0.1``) so no float ever forms and both
engines agree bit-for-bit at any corpus size.

Scale shape (100 TB): map-only — one projection per document, no
shuffle, no UDF; every per-token reduction is expressed as codegen'd
array expressions (the summed token length rides
``length(concat_ws('', toks))``, not a fold). Filters and the 5-column
projection push into the parquet scan. A downstream consumer filters
on ``keep`` — which also pushes down when this is materialized as a
view over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.prep import TOKENS_SQL, tokens

# Gopher §A1.1 bounds, adapted: the synthetic corpus has ~30-90-word
# docs, so the word-count floor is lowered from Gopher's 50 to 30 to
# keep both rule outcomes represented at every SF (the rule logic is
# what's under test, not the constant).
MIN_WORDS = 30
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3
MAX_MEAN_WORD_LEN = 10
# symbol-to-word ratio <= 0.1, alpha-word fraction >= 0.8 — as
# integer cross-multiplications below.
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")
MIN_STOPWORDS = 2


def quality_rule_flags(docs: DataFrame) -> DataFrame:
    """Frame-level rule evaluation over any (doc_id, text) frame —
    the registered query below and the streaming admission gate
    (streaming/enrich.py) both call this, so the two surfaces cannot
    drift. Returns (doc_id, n_words, sum_word_len, rule_*, keep)."""
    toks = F.filter(tokens(F.col("text")), lambda t: t != "")
    d = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        # Σ len(tok) == len(concat of all toks) — stays in codegen
        # instead of an interpreted aggregate() fold.
        F.length(F.concat_ws("", toks)).cast("bigint").alias("sum_word_len"),
        F.size(
            F.filter(toks, lambda t: t.startswith("#") | t.contains("..."))
        ).cast("bigint").alias("n_symbol_words"),
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("bigint").alias(
            "n_alpha_words"
        ),
        F.size(
            F.array_intersect(
                F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS])
            )
        ).cast("bigint").alias("n_stopwords"),
    )
    rules = d.select(
        "doc_id",
        "n_words",
        "sum_word_len",
        F.col("n_words").between(MIN_WORDS, MAX_WORDS).alias("rule_word_count"),
        (
            (F.col("sum_word_len") >= MIN_MEAN_WORD_LEN * F.col("n_words"))
            & (F.col("sum_word_len") <= MAX_MEAN_WORD_LEN * F.col("n_words"))
        ).alias("rule_mean_word_len"),
        (10 * F.col("n_symbol_words") <= F.col("n_words")).alias(
            "rule_symbol_ratio"
        ),
        (5 * F.col("n_alpha_words") >= 4 * F.col("n_words")).alias(
            "rule_alpha_words"
        ),
        (F.col("n_stopwords") >= MIN_STOPWORDS).alias("rule_stopwords"),
    )
    return rules.select(
        "*",
        (
            F.col("rule_word_count")
            & F.col("rule_mean_word_len")
            & F.col("rule_symbol_ratio")
            & F.col("rule_alpha_words")
            & F.col("rule_stopwords")
        ).alias("keep"),
    )


def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rule flags + composite keep over the catalog
    ``documents`` table: (doc_id, n_words, sum_word_len,
    rule_word_count, rule_mean_word_len, rule_symbol_ratio,
    rule_alpha_words, rule_stopwords, keep)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_rule_flags(docs)


_STOP_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

ORACLE_GOPHER_RULES = f"""
WITH d AS (
  SELECT doc_id,
         list_filter({TOKENS_SQL.format(x='text')}, t -> t <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(length(array_to_string(toks, '')) AS BIGINT) AS sum_word_len,
         CAST(len(list_filter(toks,
              t -> starts_with(t, '#') OR contains(t, '...'))) AS BIGINT)
           AS n_symbol_words,
         CAST(len(list_filter(toks,
              t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
         CAST(len(list_intersect(list_distinct(toks), {_STOP_LIST_SQL}))
              AS BIGINT) AS n_stopwords
  FROM d
), r AS (
  SELECT doc_id, n_words, sum_word_len,
         n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS} AS rule_word_count,
         sum_word_len >= {MIN_MEAN_WORD_LEN} * n_words
           AND sum_word_len <= {MAX_MEAN_WORD_LEN} * n_words
           AS rule_mean_word_len,
         10 * n_symbol_words <= n_words AS rule_symbol_ratio,
         5 * n_alpha_words >= 4 * n_words AS rule_alpha_words,
         n_stopwords >= {MIN_STOPWORDS} AS rule_stopwords
  FROM m
)
SELECT *,
       rule_word_count AND rule_mean_word_len AND rule_symbol_ratio
         AND rule_alpha_words AND rule_stopwords AS keep
FROM r
"""


QUERIES: dict[str, tuple] = {
    "gopher_quality_rules": (gopher_quality_rules, ORACLE_GOPHER_RULES),
}
