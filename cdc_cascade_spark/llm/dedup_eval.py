"""Dedup-detector evaluation: the MinHash banding characterization
curve, and the incremental index-probe face.

Beyond-reference LLM-pipeline surfaces (SURVEY.md §2 extension):

- ``minhash_banding_curve`` — the eval every LSH deployment runs
  before trusting its banding parameters: over a fixed document
  sample, compute EXACT Jaccard for every pair (brute force — that is
  the point of ground truth), bucket pairs by Jaccard decile, and
  report how many pairs in each bucket the banding would surface as
  candidates. One table answers both tuning questions: recall at high
  similarity (the top deciles' ``catch_ppm`` should be ~1e6) and
  pruning at low similarity (decile 0's ``catch_ppm`` should be ~0 —
  the fraction of non-dup pairs the verifier must pay to reject).
  All-pairs on the FULL corpus is exactly what banding exists to
  avoid, so the eval runs on a deterministic FIXED-SIZE sample
  (``doc_id % SAMPLE_MOD == 0`` capped at ``SAMPLE_CAP`` docs by the
  id bound): a fixed eval budget, the standard production practice —
  the cap keeps the ground-truth cost constant at any corpus size.
- ``dedup_index_probe`` — the oracle-checkable SEMANTICS of the
  persistent MinHash index's daily-ingest probe
  (llm/dedup_index.py, whose no-corpus-shuffle plan claims stay
  test-pinned): verified near-dup pairs (banded candidates, exact
  Jaccard ≥ 0.8) between a batch (``doc_id % BATCH_MOD == 0``) and
  the full corpus. Because banding is symmetric, this equals the
  corpus-wide pair set filtered to pairs touching the batch — which
  is what the embedded oracle states, making probe-vs-rebuild
  equivalence a DRIVER-checked fact, not only a local test.

Determinism: shingle sets, band keys and Jaccard all ride the shared
md5 family (functions/hashing.py); decile and catch_ppm are integer
arithmetic (``(inter*10) div union``, ``(caught*1e6) div n_pairs``).

Scale shapes:
- banding curve: fixed anchors × corpus — O(n·SAMPLE_CAP) posting
  work, flat per-doc cost at any corpus size (the brute-force spec
  lives only in the oracle); the candidate probe joins the anchors'
  band rows against the shared band relation.
- index probe: bands(batch) ⋈ bands(corpus) on (band, bkey) —
  O(batch + candidates) shuffle, the incremental-index shape; shingle
  sets are fetched only for candidate pairs.

Registered in r9, same round as built (r8 verdict #3).
tests/test_dedup_eval.py pins the oracle agreement, a pure-Python
banding model, and probe ≡ filtered-rebuild equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.functions.hashing import (
    LSH_BANDS,
    band_key_sql,
    minhash_signature_sql,
)
from cdc_cascade_spark.llm.dedup import (
    JACCARD_THRESHOLD,
    _docs_prepared_cached,
    minhash_bands_cached,
)
from cdc_cascade_spark.llm.prep import DOCS_CTE, jaccard, jaccard_sql

# Eval budget: a FIXED anchor set — every 2nd document capped at
# SAMPLE_CAP anchors via the id bound (doc_id < SAMPLE_MOD *
# SAMPLE_CAP, a pure pushdown predicate; 250 anchors at the 500-doc
# SFs, 256 at sf0.1+). r9 verdict #4 flagged the old every-2nd-doc
# sample as corpus-proportional (O(n²/MOD) ground truth) and
# prescribed a fixed-size cap; a capped SAMPLE×SAMPLE eval, however,
# catches a near-dup pair only when BOTH ends land in the fixed
# sample — a vanishing fraction as the corpus grows (measured: zero
# of sf0.1's 256 true near-dup pairs have both ends among the first
# 256 even ids, so the curve's top deciles go empty exactly where the
# recall question lives). The eval therefore pairs the fixed anchors
# against the FULL corpus instead: O(n·SAMPLE_CAP) ground truth — the
# same fixed-budget × corpus shape the verdict prescribed for
# ann_recall_report — an unbiased pair sample (anchor choice is
# content-independent) that a near-dup pair enters whenever EITHER
# end is an anchor, keeping every decile populated at every SF.
SAMPLE_MOD = 2
SAMPLE_CAP = 256

# Daily-ingest batch for the probe face: every 7th document — overlaps
# both parities of the id space (testdata sources correlate with
# parity) and yields a batch : corpus ratio (~14%) in the
# incremental-ingest regime.
BATCH_MOD = 7


def _is_anchor(c: "F.Column") -> "F.Column":
    """Membership predicate of the fixed anchor set (see SAMPLE_MOD /
    SAMPLE_CAP): pure id arithmetic, so both join sides and the oracle
    can evaluate it inline without materializing the anchor list."""
    return (c % SAMPLE_MOD == 0) & (c < SAMPLE_MOD * SAMPLE_CAP)


def _anchor_sql(x: str) -> str:
    return f"({x} % {SAMPLE_MOD} = 0 AND {x} < {SAMPLE_MOD * SAMPLE_CAP})"


# Unordered-pair dedup rule for the anchor×corpus join: every
# qualifying {a, b} pair is emitted exactly once — from its anchor end
# when the other end is a non-anchor, from the smaller id when both
# ends are anchors. Shared between the ground-truth posting join and
# the banding candidate join (and mirrored verbatim in the oracle), so
# the two relations count pairs identically.
def _pair_once(a: "F.Column", b: "F.Column") -> "F.Column":
    return (a != b) & (~_is_anchor(b) | (a < b))


def _pair_once_sql(a: str, b: str) -> str:
    return f"({a} <> {b} AND (NOT {_anchor_sql(b)} OR {a} < {b}))"


def minhash_banding_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding characterization over the anchors×corpus ground truth:
    ``(jaccard_decile, n_pairs, n_candidates, catch_ppm)``.

    The pair population is every unordered pair with at least one end
    in the fixed anchor set (see SAMPLE_MOD/SAMPLE_CAP note). The
    ORACLE states the spec as the literal brute-force join (anchor
    side × full corpus, exact Jaccard per pair); the Spark side
    computes the identical table the scalable way — an inverted
    shingle index: explode shingle sets, join anchor postings against
    corpus postings on the shingle hash, and count shared shingles per
    pair (sparse set intersection — only pairs with ≥1 shared shingle
    ever materialize). Pairs sharing NOTHING are all in decile 0 by
    definition, so their count is pure arithmetic:
    ``|A|·(N−1) − C(|A|,2)`` minus the materialized pairs. The
    driver's green row is then a machine proof that the sparse plan
    equals the brute-force spec.

    Scale: anchors are a fixed budget, so ground truth is O(n·|A|)
    postings work and the per-SF eval cost is flat in corpus size
    (SCALE.md ladder); nothing quadratic in n ever materializes."""
    prepared = _docs_prepared_cached(spark, sf_dir).select("doc_id", "hset")
    anchors = prepared.filter(_is_anchor(F.col("doc_id")))
    sizes = prepared.select("doc_id", F.size("hset").alias("sz"))
    post = prepared.select("doc_id", F.explode("hset").alias("s"))
    post_a = anchors.select(F.col("doc_id").alias("pa"), F.explode("hset").alias("s"))
    inter_pairs = (
        post_a.join(post.select(F.col("doc_id").alias("pb"), "s"), "s")
        .filter(_pair_once(F.col("pa"), F.col("pb")))
        .groupBy(
            F.least("pa", "pb").alias("doc_a"),
            F.greatest("pa", "pb").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    with_dec = (
        inter_pairs.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("(inter * 10) div (sz_a + sz_b - inter)").alias("decile"),
        )
    )
    # the materialized (inter ≥ 1) pair relation feeds three consumers
    # (per-decile counts, the total for the zero-pair arithmetic, and
    # the candidate decile lookup): snapshot so the posting join runs
    # once
    with_dec = with_dec.localCheckpoint(eager=False)
    d1 = with_dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    # pairs sharing no shingle: |A|·(N−1) − C(|A|,2) − |materialized|
    # (each anchor pairs with all N−1 other docs; both-anchor pairs
    # would be counted from each end, so C(|A|,2) corrects the double
    # count) — all decile 0
    zero = (
        anchors.agg(F.count(F.lit(1)).cast("bigint").alias("a"))
        .crossJoin(prepared.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
        .crossJoin(
            with_dec.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        )
        .select(
            F.lit(0).cast("bigint").alias("decile"),
            (
                F.expr("a * (n - 1) - a * (a - 1) div 2") - F.col("m")
            ).alias("n_pairs"),
        )
    )
    bands = minhash_bands_cached(spark, sf_dir)
    cand = (
        bands.filter(_is_anchor(F.col("doc_id")))
        .select(F.col("doc_id").alias("pa"), "band", "bkey")
        .join(
            bands.select(F.col("doc_id").alias("pb"), "band", "bkey"),
            ["band", "bkey"],
        )
        .filter(_pair_once(F.col("pa"), F.col("pb")))
        .select(
            F.least("pa", "pb").alias("doc_a"),
            F.greatest("pa", "pb").alias("doc_b"),
        )
        .distinct()
    )
    # candidates are few: fetch their exact decile (a candidate pair
    # sharing no shingle — possible only by md5 collision — lands in
    # decile 0 via the coalesce, exactly as the oracle computes it)
    cand_dec = (
        cand.join(with_dec, ["doc_a", "doc_b"], "left")
        .groupBy(F.coalesce("decile", F.lit(0)).alias("decile"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    )
    merged = (
        d1.select("decile", "n_pairs", F.lit(0).cast("bigint").alias("n_candidates"))
        .unionByName(zero.select("decile", "n_pairs", F.lit(0).cast("bigint").alias("n_candidates")))
        .unionByName(
            cand_dec.select(
                "decile", F.lit(0).cast("bigint").alias("n_pairs"), "n_candidates"
            )
        )
        .groupBy("decile")
        .agg(
            F.sum("n_pairs").cast("bigint").alias("n_pairs"),
            F.sum("n_candidates").cast("bigint").alias("n_candidates"),
        )
    )
    return (
        # drop empty buckets BEFORE the share division: the synthetic
        # decile-0 row is 0 on an empty/1-doc corpus (ANSI div-by-zero)
        # and the oracle emits rows only for deciles that hold pairs
        merged.filter(F.col("n_pairs") > 0)
        .select(
            F.col("decile").cast("bigint").alias("jaccard_decile"),
            "n_pairs",
            "n_candidates",
            F.expr("(n_candidates * 1000000) div n_pairs")
            .cast("bigint")
            .alias("catch_ppm"),
        )
    )


def dedup_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-probe face: verified near-dup pairs
    ``(doc_a, doc_b, jaccard, in_batch_a, in_batch_b)`` between the
    ``doc_id % BATCH_MOD == 0`` batch and the full corpus — the band
    join touches only batch bands on one side."""
    bands = minhash_bands_cached(spark, sf_dir)
    batch_bands = bands.filter(F.col("doc_id") % BATCH_MOD == 0)
    # batch side ⋈ full corpus side: candidates touching the batch.
    # Pair normalization (least/greatest) dedups the both-in-batch
    # pairs that appear in either orientation.
    raw = (
        batch_bands.select(F.col("doc_id").alias("p"), "band", "bkey")
        .join(bands.select(F.col("doc_id").alias("q"), "band", "bkey"),
              ["band", "bkey"])
        .filter(F.col("p") != F.col("q"))
        .select(
            F.least("p", "q").alias("doc_a"),
            F.greatest("p", "q").alias("doc_b"),
        )
        .distinct()
    )
    prepared = _docs_prepared_cached(spark, sf_dir).select("doc_id", "hset")
    pa = prepared.select(
        F.col("doc_id").alias("doc_a"), F.col("hset").alias("sh_a")
    )
    pb = prepared.select(
        F.col("doc_id").alias("doc_b"), F.col("hset").alias("sh_b")
    )
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        raw.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            (F.col("doc_a") % BATCH_MOD == 0).alias("in_batch_a"),
            (F.col("doc_b") % BATCH_MOD == 0).alias("in_batch_b"),
        )
    )


def _banding_curve_oracle_sql() -> str:
    """Brute-force spec: fixed anchors × full corpus, exact Jaccard
    per pair, candidates from the full band relation under the same
    pair-once rule."""
    sig = minhash_signature_sql("shingles")
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS band, {band_key_sql('sig', i)} AS bkey"
        " FROM sigs"
        for i in range(LSH_BANDS)
    )
    inter = "len(list_intersect(a.shingles, b.shingles))"
    uni = (
        "(len(a.shingles) + len(b.shingles)"
        " - len(list_intersect(a.shingles, b.shingles)))"
    )
    return (
        DOCS_CTE
        + f"""
, pairs AS MATERIALIZED (
  SELECT least(a.doc_id, b.doc_id) AS doc_a,
         greatest(a.doc_id, b.doc_id) AS doc_b,
         (({inter}) * 10) // {uni} AS decile
  FROM sh a JOIN sh b
    ON {_anchor_sql('a.doc_id')}
   AND {_pair_once_sql('a.doc_id', 'b.doc_id')}
)
, sigs AS MATERIALIZED (SELECT doc_id, {sig} AS sig FROM sh)
, bands AS MATERIALIZED (
{band_selects}
)
, cand AS (
  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
                  greatest(x.doc_id, y.doc_id) AS doc_b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey
   AND {_anchor_sql('x.doc_id')}
   AND {_pair_once_sql('x.doc_id', 'y.doc_id')}
)
SELECT CAST(p.decile AS BIGINT) AS jaccard_decile,
       COUNT(*)::BIGINT AS n_pairs,
       SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_candidates,
       ((SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
          // COUNT(*))::BIGINT AS catch_ppm
FROM pairs p
LEFT JOIN cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
GROUP BY p.decile
"""
    )


ORACLE_BANDING_CURVE = _banding_curve_oracle_sql()


def _index_probe_oracle_sql() -> str:
    """The corpus-wide verified pair set (the dedup_minhash_lsh oracle
    chain VERBATIM) filtered to pairs touching the batch — banding is
    symmetric, so the incremental probe must equal exactly this."""
    sig = minhash_signature_sql("shingles")
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS band, {band_key_sql('sig', i)} AS bkey"
        " FROM sigs"
        for i in range(LSH_BANDS)
    )
    jac = jaccard_sql("sa.shingles", "sb.shingles")
    return (
        DOCS_CTE
        + f"""
, sigs AS MATERIALIZED (SELECT doc_id, {sig} AS sig FROM sh)
, bands AS MATERIALIZED (
{band_selects}
)
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                           AND a.doc_id < b.doc_id
  WHERE a.doc_id % {BATCH_MOD} = 0 OR b.doc_id % {BATCH_MOD} = 0
)
SELECT c.doc_a, c.doc_b, {jac} AS jaccard,
       c.doc_a % {BATCH_MOD} = 0 AS in_batch_a,
       c.doc_b % {BATCH_MOD} = 0 AS in_batch_b
FROM cand c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE {jac} >= {JACCARD_THRESHOLD}
"""
    )


ORACLE_INDEX_PROBE = _index_probe_oracle_sql()


QUERIES: dict[str, tuple] = {
    "minhash_banding_curve": (minhash_banding_curve, ORACLE_BANDING_CURVE),
    "dedup_index_probe": (dedup_index_probe, ORACLE_INDEX_PROBE),
}
