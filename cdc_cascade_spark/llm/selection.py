"""Corpus selection operators: token-budget selection and asymmetric
near-containment.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension):

- ``token_budget_selection`` — the "fill each stratum's token budget
  with its best documents" step of dataset mixing: within every
  language, take documents in quality order until the stratum's token
  budget is exhausted. The greedy prefix is the exact semantics every
  mixture spec (e.g. fixed tokens-per-language) reduces to.
- ``shingle_containment`` — asymmetric near-dup: containment
  C(A→B) = |S(A) ∩ S(B)| / |S(A)| catches quotes/excerpts that
  symmetric Jaccard misses (a 50-token doc fully inside a 5000-token
  doc has Jaccard ≈ 0.01 but containment 1.0). Rides the same
  skew-guarded blocking + shared shingle/band frames as the dedup
  family (llm/dedup.py).

Scale shapes (100 TB):

- Budget selection: one shuffle on the stratum key; the prefix-sum
  window runs per stratum in parallel (same per-shard window shape as
  llm/packing.py, which holds at scale because strata are bounded and
  independent). For a single pathologically hot stratum, the two-pass
  variant — quality-histogram → threshold filter (the
  quality_floor_filter shape) — replaces the window; the greedy-prefix
  semantics here is the reference implementation both must match.
- Containment: candidate generation is O(block²≤cap²) + band-join for
  hot blocks; the exact set math touches candidate pairs only, and the
  shuffle carries bigint hash sets, never text.

Determinism: quality is integer arithmetic; the budget prefix is an
integer running sum with a total (quality, doc_id) order; containment
is an integer-size ratio via one double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.dedup import (
    _docs_prepared_cached,
    guarded_block_candidates,
    guarded_candidates_sql,
    minhash_bands_cached,
)
from cdc_cascade_spark.llm.prep import DOCS_CTE, TOKENS_SQL, tokens

# Tokens admitted per language stratum. ~60% of an sf0.01 stratum, so
# the cut is exercised in both directions; production values come from
# the mixture spec (e.g. 30B tokens of code, 200B of web).
STRATUM_TOKEN_BUDGET = 1500

# Quality score: distinct-token ratio in integer parts-per-1000 —
# deterministic (no floats) and a real junk-filter signal (boilerplate
# and loop-generated text repeat tokens).
QUALITY_PPM = 1000

CONTAINMENT_THRESHOLD = 0.9


def budget_filter(docs: DataFrame) -> DataFrame:
    """Greedy per-language token-budget admission over an arbitrary
    (doc_id, lang, text) frame — the frame-level core, so callers can
    budget the corpus they actually have (llm/pipeline.curate_corpus
    budgets the CURATED survivors; budgeting the raw corpus there
    would let already-dropped documents consume stratum budget).

    Output: the admitted documents as (lang, doc_id, quality, n_tokens,
    cum_tokens) — quality = distinct-token ratio in parts-per-1000,
    admission order (quality DESC, doc_id ASC), a document is admitted
    while the stratum's running token total stays within budget
    (first-fit prefix: the document that crosses the budget line is
    rejected and admission stops — running total is monotone).
    """
    # NON-EMPTY tokens only (the segdedup.py discipline): a raw \s+
    # split of '' is [''] — size 1, NOT 0 — so without the filter an
    # empty-text document would sail past the zero-token guard below
    # and be admitted at maximum quality (1 distinct / 1 token).
    toks = F.filter(tokens(F.col("text")), lambda t: t != "")
    d = docs.select(
        "lang",
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    ).filter(
        # token-less documents can't be admitted (zero trainable
        # content) and must never reach the quality division below —
        # without this guard a 0-token row's quality is engine-defined
        # (NULL in Spark, error in DuckDB). Reachable via the segment
        # stage of llm/pipeline.py, whose span rule can rewrite a
        # document to the empty string (r8 advice).
        F.col("n_tokens") > 0
    ).select(
        "lang",
        "doc_id",
        "n_tokens",
        # integer floor division in BOTH engines (`div` / `//`) — a
        # double divide + cast could round the quotient up across an
        # integer boundary before truncation
        F.expr(f"(n_distinct * {QUALITY_PPM}) div n_tokens").alias("quality"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= STRATUM_TOKEN_BUDGET)
        .select("lang", "doc_id", "quality", "n_tokens", "cum_tokens")
    )


def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-language token-budget selection over the documents
    table (see :func:`budget_filter` for the semantics)."""
    return budget_filter(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )


# non-empty tokens, mirroring budget_filter's Spark-side list filter
_NE_TOKS = f"list_filter({TOKENS_SQL.format(x='text')}, t -> t <> '')"

ORACLE_TOKEN_BUDGET = f"""
WITH d AS (
  SELECT lang, doc_id,
         len({_NE_TOKS}) AS n_tokens,
         CAST((len(list_distinct({_NE_TOKS})) * {QUALITY_PPM})
              // len({_NE_TOKS}) AS BIGINT) AS quality
  FROM documents
  WHERE len({_NE_TOKS}) > 0
), o AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY quality DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM d
)
SELECT lang, doc_id, quality,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM o
WHERE cum_tokens <= {STRATUM_TOKEN_BUDGET}
"""


def shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-containment pairs over skew-guarded blocks.

    Output: (doc_a, doc_b, containment_ab, containment_ba) for
    candidate pairs where either direction's containment reaches
    ``CONTAINMENT_THRESHOLD`` — containment_ab = |S(a)∩S(b)| / |S(a)|
    (how much of a sits inside b).
    """
    sh = _docs_prepared_cached(spark, sf_dir)
    pairs = guarded_block_candidates(
        sh, carry=("hset",), bands=minhash_bands_cached(spark, sf_dir)
    )
    inter = F.size(F.array_intersect(F.col("hset_a"), F.col("hset_b")))
    c_ab = inter.cast("double") / F.size("hset_a")
    c_ba = inter.cast("double") / F.size("hset_b")
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            c_ab.alias("containment_ab"),
            c_ba.alias("containment_ba"),
        )
        .filter(
            F.greatest("containment_ab", "containment_ba")
            >= CONTAINMENT_THRESHOLD
        )
    )


_CONTAIN_AB = (
    "len(list_intersect(sa.shingles, sb.shingles))::DOUBLE / len(sa.shingles)"
)
_CONTAIN_BA = (
    "len(list_intersect(sa.shingles, sb.shingles))::DOUBLE / len(sb.shingles)"
)

ORACLE_CONTAINMENT = (
    DOCS_CTE
    + guarded_candidates_sql()
    + f"""
SELECT c.doc_a, c.doc_b,
       {_CONTAIN_AB} AS containment_ab,
       {_CONTAIN_BA} AS containment_ba
FROM cand c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE greatest({_CONTAIN_AB}, {_CONTAIN_BA}) >= {CONTAINMENT_THRESHOLD}
"""
)


QUERIES: dict[str, tuple] = {
    "token_budget_selection": (token_budget_selection, ORACLE_TOKEN_BUDGET),
    "shingle_containment": (shingle_containment, ORACLE_CONTAINMENT),
}
