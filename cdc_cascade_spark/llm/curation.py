"""Corpus-curation operators: benchmark contamination detection and
deterministic stratified sampling.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): these
are the two curation steps a 100 TB training-data pipeline runs after
dedup — "is any eval data inside the training set?" and "rebalance the
corpus across (lang, source) strata" — expressed Spark-first with
DuckDB oracle SQL authored in parallel.

Contamination = n-gram *containment*, the decontamination measure used
by large open-corpus efforts: for a benchmark doc B and a training doc
T, ``|shingles(B) ∩ shingles(T)| / |shingles(B)|``. Unlike Jaccard it
is asymmetric — a short eval question fully embedded in a long training
document scores 1.0 where Jaccard would be near 0 — which is exactly
the leak being hunted.

Scale shape (100 TB):

- The shingle inverted index reuses the session-cached
  ``(doc_id, hset)`` relation the dedup family already materializes;
  the explode carries (8-byte hash, id) rows only, never text.
- Ultra-common shingles (document frequency > ``_df_cap``) are
  removed via a **broadcast anti-join** before the index join: they
  carry no identifying signal (stopword trigrams) and are the entire
  join-skew risk. After the cap, per-shingle join fan-out is bounded
  by cap² — no hot key can quadratically blow up the pair space.
- The bench side models the (small, fixed) benchmark suite as a
  deterministic id slice; in production it is an external table and
  the same plan broadcast-joins it.

Stratified sampling is the map-only form: per-stratum counts are a
partial-aggregated stats frame (broadcast back), and the keep/drop
decision is a deterministic md5-threshold test per row — no window
ranking, because ``ROW_NUMBER() OVER (PARTITION BY stratum)`` funnels
a dominant stratum through one reducer at corpus scale. Expected kept
size per stratum is ``min(n_stratum, SAMPLE_TARGET_PER_STRATUM)``
(Bernoulli, so ±√target variance — the price of the shuffle-free
plan; exact-N would need the per-stratum sort this deliberately
avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash, token_hash_sql
from cdc_cascade_spark.llm.prep import DOCS_CTE

# Benchmark-suite model: every doc_id ≡ 0 (mod 7) is "eval data".
CONTAM_BENCH_MOD = 7
# Shingles present in more than max(5, min(1000, n_docs // 20))
# documents are dropped before the index join (non-discriminative +
# the skew risk). 1/20 is exact in binary; the integer arithmetic is
# engine-identical.
CONTAM_DF_CAP_MIN = 5
CONTAM_DF_CAP_MAX = 1000
CONTAM_MIN_CONTAINMENT = 0.5

# Stratified sampling: equalize (lang, source) strata at ~this many
# docs each; smaller strata are kept whole. Small here so the
# downsampling branch is exercised even at test scales (sf0.01 strata
# have 1-16 docs); production would set thousands.
SAMPLE_TARGET_PER_STRATUM = 5
_SAMPLE_DENOM = 1 << 20
_SAMPLE_SALT = "smp:"


def _df_cap(n_docs: int) -> int:
    return max(CONTAM_DF_CAP_MIN, min(CONTAM_DF_CAP_MAX, n_docs // 20))


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark→training shingle-containment pairs ≥ 0.5.

    Output: (bench_doc, train_doc, n_common, containment), one row per
    contaminated (benchmark doc, training doc) pair. The containment
    denominator counts the bench doc's shingles *after* the df-cap
    filter, so a bench doc whose every shingle is ultra-common simply
    produces no rows (no division by zero, no spurious 1.0 scores
    from stopword overlap).

    The ``prepared.count()`` is a bounded action on the session-cached
    relation (same contract as the dedup guards' probe) — it freezes
    the df cap into the plan, which is fine because the cache is
    per-(session, sf_dir).
    """
    from cdc_cascade_spark.llm.dedup import _docs_prepared_cached

    prepared = _docs_prepared_cached(spark, sf_dir).select("doc_id", "hset")
    cap = _df_cap(prepared.count())
    exploded = prepared.select("doc_id", F.explode("hset").alias("h"))
    hot = (
        exploded.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cap)
        .select("h")
    )
    rare = exploded.join(F.broadcast(hot), "h", "left_anti")
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == 0
    bench = rare.filter(is_bench)
    train = rare.filter(~is_bench)
    bsz = bench.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        bench.select(F.col("doc_id").alias("bench_doc"), "h")
        .join(train.select(F.col("doc_id").alias("train_doc"), "h"), "h")
        .groupBy("bench_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    contained = (
        pairs.join(bsz.withColumnRenamed("doc_id", "bench_doc"), "bench_doc")
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.col("sz").cast("double"),
        )
        .filter(F.col("containment") >= CONTAM_MIN_CONTAINMENT)
    )
    return contained.select("bench_doc", "train_doc", "n_common", "containment")


ORACLE_CONTAMINATION = (
    DOCS_CTE
    + f"""
, cap AS (
  SELECT greatest({CONTAM_DF_CAP_MIN},
                  least({CONTAM_DF_CAP_MAX}, COUNT(*) // 20)) AS v
  FROM docs
)
, expl AS (SELECT doc_id, unnest(shingles) AS h FROM sh)
, hot AS (
  SELECT h FROM expl GROUP BY h HAVING COUNT(*) > (SELECT v FROM cap)
)
, rare AS (SELECT e.* FROM expl e ANTI JOIN hot USING (h))
, bench AS (SELECT * FROM rare WHERE doc_id % {CONTAM_BENCH_MOD} = 0)
, train AS (SELECT * FROM rare WHERE doc_id % {CONTAM_BENCH_MOD} <> 0)
, bsz AS (SELECT doc_id AS bench_doc, COUNT(*) AS sz FROM bench GROUP BY 1)
, m AS (
  SELECT b.doc_id AS bench_doc, t.doc_id AS train_doc, COUNT(*) AS n_common
  FROM bench b JOIN train t USING (h)
  GROUP BY 1, 2
)
SELECT m.bench_doc, m.train_doc, m.n_common,
       m.n_common::DOUBLE / bsz.sz::DOUBLE AS containment
FROM m JOIN bsz USING (bench_doc)
WHERE m.n_common::DOUBLE / bsz.sz::DOUBLE >= {CONTAM_MIN_CONTAINMENT}
"""
)


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced downsample over (lang, source) strata.

    Output: (doc_id, lang, source, n_stratum) — the kept rows. A row
    survives iff ``md5('smp:'||doc_id) % 2^20`` falls under its
    stratum's threshold ``(2^20 · target) // n_stratum`` (capped at
    2^20, i.e. keep-all for small strata). Pure integer arithmetic →
    identical keep set in both engines, reproducible across runs,
    cluster layouts, and partitionings.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    strata = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_stratum")
    )
    # `div` = exact integer division (matches DuckDB `//`); a double
    # division + cast could misround near-integer quotients
    thresh = F.least(
        F.lit(_SAMPLE_DENOM).cast("bigint"),
        F.expr(f"{_SAMPLE_DENOM * SAMPLE_TARGET_PER_STRATUM} div n_stratum"),
    )
    slot = (
        token_hash(F.concat(F.lit(_SAMPLE_SALT), F.col("doc_id").cast("string")))
        % _SAMPLE_DENOM
    )
    return (
        docs.join(F.broadcast(strata), ["lang", "source"])
        .filter(slot < thresh)
        .select("doc_id", "lang", "source", "n_stratum")
    )


_SLOT_SQL = (
    token_hash_sql(f"'{_SAMPLE_SALT}' || doc_id") + f" % {_SAMPLE_DENOM}"
)

ORACLE_STRATIFIED_SAMPLE = f"""
WITH d AS (SELECT doc_id, lang, source FROM documents)
, s AS (SELECT lang, source, COUNT(*) AS n_stratum FROM d GROUP BY 1, 2)
SELECT d.doc_id, d.lang, d.source, s.n_stratum
FROM d JOIN s USING (lang, source)
WHERE {_SLOT_SQL}
      < least({_SAMPLE_DENOM},
              ({_SAMPLE_DENOM * SAMPLE_TARGET_PER_STRATUM}) // s.n_stratum)
"""


QUERIES: dict[str, tuple] = {
    "contamination_check": (contamination_check, ORACLE_CONTAMINATION),
    "stratified_sample": (stratified_sample, ORACLE_STRATIFIED_SAMPLE),
}
