"""Temperature-weighted mixing: the size^α resampling policy.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension)
completing the mixing family: ``llm/mixing.py`` registers the
equal-quota mix (flatten the source distribution); this module
registers the other canonical pretraining policy — temperature
sampling, where stratum s receives budget share ``n_s^α / Σ n_t^α``
with ``0 < α < 1`` (α=1 is proportional-to-size, α→0 is equal-quota).
The stratum here is **language** — the shipped corpus is genuinely
skewed (en ≈ 40 %, four others ≈ 15 % each), so this is the classic
multilingual dial: upsample low-resource languages relative to their
share without flattening entirely. α is fixed at **1/2** — the one
exponent in (0,1) computable with an IEEE-exact operation (``sqrt``
is a correctly-rounded basic op in both engines; arbitrary ``pow``
is libm and banned by the determinism conventions, see
operators/relational.py).

Arithmetic is integer-exact end to end after the single sqrt:

- ``w_micro = round(sqrt(n_s) · 1e6)::BIGINT`` — micro-scaled weight
  (the only float step; same double, same half-up rounding in both
  engines),
- ``quota = TM_BUDGET · w_micro // Σ w_micro`` — BIGINT floor
  division (Σ quota ≤ TM_BUDGET by construction),
- ``rate_ppm = least(1e6, quota · 1e6 // n_s)``,
- admission: ``token_hash('tmix:' || lang || ':' || doc_id) % 1e6
  < rate_ppm`` — the stateless salted-hash-threshold discipline of
  the mixing/split/sampling family (any executor recomputes any
  verdict with no coordination; corpus growth never evicts admitted
  docs; retries are free). The salt differs from every other
  hash-keyed decision, so draws are independent of the equal-quota
  mix, splits, shards, and samples.

Output is the admitted documents carrying their stratum's full plan
row ``(doc_id, lang, n_docs, w_micro, quota, rate_ppm)`` — one
driver row checks the temperature arithmetic AND the per-document
admission together.

Scale shape (100 TB): identical to the equal-quota mix — one
map-side-combined count per stratum, a stratum-count-sized plan
frame broadcast back onto the documents scan, map-only integer
filter; no shuffle touches the corpus, text never moves.

Registered in r10, same round as built (the drained-pipeline
discipline). tests/test_tempmix.py pins oracle parity at two SFs, a
pure-Python model of the weight/quota/admission arithmetic, and the
policy invariants (monotone quotas, sub-linear shares, budget bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash, token_hash_sql

# Global document budget. Same order as the equal-quota mix's budget
# so the two policies are comparable side by side; with the shipped
# per-lang counts the sqrt weighting cuts en (the largest stratum)
# hardest while every stratum keeps a strictly positive quota.
TM_BUDGET = 250

# Weight scale: sqrt(n) in micro-units keeps Σ w_micro · TM_BUDGET
# far below 2^63 for any realistic stratum census (n_s ≤ 1e12 docs →
# w_micro ≤ 1e12; 10^4 strata → Σ ≤ 1e16; ×250 ≈ 2.5e18 < 9.2e18).
W_SCALE = 1_000_000

_SALT = "tmix:"


def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admitted documents under the α=1/2 temperature mix over the
    language strata, each row carrying its stratum's plan arithmetic:
    ``(doc_id, lang, n_docs, w_micro, quota, rate_ppm)``."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = counts.withColumn(
        "w_micro",
        F.round(F.sqrt(F.col("n_docs").cast("double")) * W_SCALE, 0).cast(
            "long"
        ),
    )
    total = w.agg(F.sum("w_micro").alias("w_total"))
    plan = (
        w.crossJoin(F.broadcast(total))
        .withColumn("quota", F.expr(f"({TM_BUDGET} * w_micro) div w_total"))
        .withColumn(
            "rate_ppm",
            F.least(F.lit(1_000_000), F.expr("(quota * 1000000) div n_docs")),
        )
        .select("lang", "n_docs", "w_micro", "quota", "rate_ppm")
    )
    admitted = (
        docs.join(F.broadcast(plan), "lang")
        .filter(
            token_hash(
                F.concat(
                    F.lit(_SALT),
                    F.col("lang"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            )
            % 1_000_000
            < F.col("rate_ppm")
        )
        .select("doc_id", "lang", "n_docs", "w_micro", "quota", "rate_ppm")
    )
    return admitted


_HASH = token_hash_sql(
    f"'{_SALT}' || d.lang || ':' || CAST(d.doc_id AS VARCHAR)"
)

ORACLE_TEMPERATURE_MIX = f"""
WITH counts AS (
  SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang
),
w AS (
  SELECT lang, n_docs,
         CAST(ROUND(sqrt(CAST(n_docs AS DOUBLE)) * {W_SCALE}, 0) AS BIGINT)
           AS w_micro
  FROM counts
),
total AS (SELECT SUM(w_micro)::BIGINT AS w_total FROM w),
plan AS (
  SELECT lang, n_docs, w_micro,
         (({TM_BUDGET} * w_micro) // w_total)::BIGINT AS quota,
         least(1000000,
               ((({TM_BUDGET} * w_micro) // w_total) * 1000000)
                 // n_docs)::BIGINT AS rate_ppm
  FROM w CROSS JOIN total
)
SELECT d.doc_id, d.lang AS lang, p.n_docs, p.w_micro, p.quota,
       p.rate_ppm
FROM documents d JOIN plan p ON d.lang = p.lang
WHERE {_HASH} % 1000000 < p.rate_ppm
"""


QUERIES: dict[str, tuple] = {
    "temperature_mixture_sample": (
        temperature_mixture_sample,
        ORACLE_TEMPERATURE_MIX,
    ),
}
