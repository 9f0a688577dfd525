"""Oracle-checkable corpus mixing: equal-quota source rebalancing.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension) that
puts the MIXING SEMANTICS of ``llm/shuffling.py::mix_corpora`` under
the external driver gate. ``shuffling.py`` is deliberately test-pinned
(its claims are physical — global order and file layout, which an
order-insensitive row-hash oracle cannot see); what the oracle CAN
check is the admission decision itself: which documents a
deterministic weighted mix admits. This module registers that face
over the fixed ``documents`` table, with the same hash-threshold
discipline as ``corpus_split`` / ``stratified_sample``:

- ``corpus_mixture_plan`` — the per-source rate table: every source's
  document count, its equal share of the global document budget
  (``MIX_BUDGET div n_sources`` — the "flatten the source
  distribution" mix every web+code+reference blend reduces to), and
  the admission rate in parts-per-million,
  ``least(1e6, quota * 1e6 div n_docs)``. All integer arithmetic, so
  both engines agree bit-for-bit.
- ``corpus_mixture_sample`` — the admitted documents:
  ``token_hash('mix:' || source || ':' || doc_id) % 1e6 < rate_ppm``.
  The salt keeps the draw independent of every other hash-keyed
  decision (split assignment, sampling, sharding), and salting with
  the SOURCE means the same doc_id in two sources draws
  independently — the ``mix_corpora`` contract.

Why hash-threshold instead of exact per-source top-N: admission must
be (a) stateless — any executor can recompute any document's verdict
with no coordination, (b) stable under corpus growth — new documents
never evict old ones from the mix, and (c) reproducible under
retries. Exact quotas need a per-source total order (a window); at
100 TB the stateless rate is the production shape and the quota is
its expectation.

Scale shape: the plan is one map-side-combined count per source
(sources are bounded — tens to thousands) cross-joined with a 1-row
total; the sample is map-only — a broadcast join of the plan's rate
column onto the documents scan plus an integer filter. No shuffle
touches the corpus; text never moves.

Registered in r9, same round as built (r8 verdict #3: keep the
registration pipeline drained). tests/test_mixing_leakage.py pins the
oracle agreement, the rate arithmetic against a pure-Python model,
and consistency between plan and sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash, token_hash_sql

# Global document budget for the registered fixed-table mix: half the
# sf0.001/sf0.01 corpus, so with 20 equal sources (quota 12) the rate
# clamps at 1e6 for small sources and cuts large ones — both branches
# of the `least` are exercised at every SF.
MIX_BUDGET = 250
_SALT = "mix:"


def _mixture_plan_frame(docs: DataFrame) -> DataFrame:
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    total = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources")
    )
    quota = F.expr(f"{MIX_BUDGET} div n_sources")
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("quota", quota)
        .select(
            "source",
            "n_docs",
            "quota",
            F.least(
                F.lit(1_000_000).cast("bigint"),
                F.expr("(quota * 1000000) div n_docs"),
            )
            .cast("bigint")
            .alias("rate_ppm"),
        )
    )


def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source admission-rate table for the equal-quota mix:
    ``(source, n_docs, quota, rate_ppm)``."""
    return _mixture_plan_frame(
        load_table(spark, sf_dir, "documents").select("source")
    )


def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admitted documents of the equal-quota mix:
    ``(doc_id, source, lang, mix_ppm)`` where ``mix_ppm`` is the
    salted admission draw (kept in the output so the threshold
    decision is auditable per row)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    plan = _mixture_plan_frame(docs.select("source")).select(
        "source", "rate_ppm"
    )
    ppm = token_hash(
        F.concat(
            F.lit(_SALT),
            F.col("source"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    ) % 1_000_000
    return (
        docs.join(F.broadcast(plan), "source")
        .withColumn("mix_ppm", ppm.cast("bigint"))
        .filter(F.col("mix_ppm") < F.col("rate_ppm"))
        .select("doc_id", "source", "lang", "mix_ppm")
    )


_PLAN_SQL = f"""
counts AS (
  SELECT source, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY source
),
plan AS (
  SELECT source, n_docs,
         ({MIX_BUDGET} // (SELECT COUNT(*) FROM counts))::BIGINT AS quota,
         least(
           1000000,
           (({MIX_BUDGET} // (SELECT COUNT(*) FROM counts)) * 1000000)
             // n_docs
         )::BIGINT AS rate_ppm
  FROM counts
)"""

ORACLE_MIXTURE_PLAN = f"""
WITH {_PLAN_SQL}
SELECT source, n_docs, quota, rate_ppm FROM plan
"""

_SALTED_MIX_ID_SQL = f"'{_SALT}' || source || ':' || CAST(doc_id AS VARCHAR)"
_MIX_PPM_SQL = f"({token_hash_sql(_SALTED_MIX_ID_SQL)}) % 1000000"

ORACLE_MIXTURE_SAMPLE = f"""
WITH {_PLAN_SQL}
SELECT d.doc_id, d.source, d.lang,
       CAST({_MIX_PPM_SQL} AS BIGINT) AS mix_ppm
FROM documents d JOIN plan p USING (source)
WHERE {_MIX_PPM_SQL} < p.rate_ppm
"""


QUERIES: dict[str, tuple] = {
    "corpus_mixture_plan": (corpus_mixture_plan, ORACLE_MIXTURE_PLAN),
    "corpus_mixture_sample": (corpus_mixture_sample, ORACLE_MIXTURE_SAMPLE),
}
