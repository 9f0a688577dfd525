"""Collocation mining: bigram lift over the document corpus.

Beyond-reference text-analysis surface (SURVEY.md §2 extension): the
statistical-phrase detector (lift / PMI-style association) used to
mine multi-word expressions for tokenizer vocabularies and to spot
templated boilerplate (abnormally high-lift bigrams are machine
text's tell).

    lift(a b) = N · c(a b) / (c(a) · c(b))

with N = total token count — > 1 means the pair co-occurs more than
independence predicts. Computed WITHOUT logs (PMI = log lift) so both
engines agree bit-for-bit: every count is an exact int64, each product
stays < 2^53 (counts are corpus-bounded), and the single double
division is IEEE-deterministic. Consumers wanting PMI apply log
client-side — monotone, so the top-k set is identical.

Scale shape (100 TB): two explode → partial-agg count passes (tokens,
bigrams) — the same Zipf-concentrated single-shuffle shape as
text_vocabulary / bpe_merge_pairs; the unigram relation joins back to
the bigram relation twice — vocabulary is ~log-linear in corpus size,
so both joins broadcast (hinted; at extreme vocab drop the hint and
let AQE shuffle-join with skew handling). The MIN_COUNT floor prunes
the hapax tail before the joins. Top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.prep import TOKENS_SQL, tokens

# Floor on bigram support: kills one-off noise pairs whose lift is
# huge purely because both words are rare.
MIN_COUNT = 5
TOP_COLLOCATIONS = 30


def bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by lift: (bigram, n_pair, n_left, n_right,
    lift), lift DESC, ties on the bigram string."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = tokens(F.col("text"))
    td = docs.select(toks.alias("toks"))
    # snapshot the unigram relation: three consumers (left join, right
    # join, total) would otherwise each re-run the corpus scan +
    # explode + count — the aggregate is vocabulary-sized, so the
    # materialization is tiny and keeps the operator at its documented
    # two corpus passes
    uni = (
        td.select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    total = uni.agg(F.sum("c").cast("bigint").alias("n_total"))
    n = F.size("toks")
    bg = (
        td.select(
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, n - 1),
                    F.slice("toks", 2, n - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("bigram")
        )
        .filter(F.col("bigram") != "")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= MIN_COUNT)
    )
    left = F.split(F.col("bigram"), " ").getItem(0)
    right = F.split(F.col("bigram"), " ").getItem(1)
    ua = uni.select(F.col("t").alias("ta"), F.col("c").alias("n_left"))
    ub = uni.select(F.col("t").alias("tb"), F.col("c").alias("n_right"))
    lift = (F.col("n_pair").cast("double") * F.col("n_total").cast("double")) / (
        F.col("n_left").cast("double") * F.col("n_right").cast("double")
    )
    return (
        bg.withColumn("ta", left)
        .withColumn("tb", right)
        .join(F.broadcast(ua), "ta")
        .join(F.broadcast(ub), "tb")
        .crossJoin(F.broadcast(total))
        .select("bigram", "n_pair", "n_left", "n_right", lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("bigram"))
        .limit(TOP_COLLOCATIONS)
    )


ORACLE_BIGRAM_LIFT = f"""
WITH td AS (
  SELECT {TOKENS_SQL.format(x='text')} AS toks FROM documents
), uni AS (
  SELECT t, COUNT(*) AS c
  FROM (SELECT unnest(toks) AS t FROM td) GROUP BY t
), total AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM uni
), bg AS (
  SELECT bigram, COUNT(*) AS n_pair
  FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM td
  )
  WHERE bigram <> ''
  GROUP BY bigram
  HAVING COUNT(*) >= {MIN_COUNT}
)
SELECT bg.bigram,
       CAST(bg.n_pair AS BIGINT) AS n_pair,
       CAST(ua.c AS BIGINT) AS n_left,
       CAST(ub.c AS BIGINT) AS n_right,
       (bg.n_pair::DOUBLE * total.n_total::DOUBLE)
         / (ua.c::DOUBLE * ub.c::DOUBLE) AS lift
FROM bg
JOIN uni ua ON ua.t = split_part(bg.bigram, ' ', 1)
JOIN uni ub ON ub.t = split_part(bg.bigram, ' ', 2)
CROSS JOIN total
ORDER BY lift DESC, bigram ASC
LIMIT {TOP_COLLOCATIONS}
"""


QUERIES: dict[str, tuple] = {
    "bigram_lift": (bigram_lift, ORACLE_BIGRAM_LIFT),
}
