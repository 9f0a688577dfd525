"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The four standard near-dup strategies of large-scale training-data
pipelines, each expressed shuffle-consciously:

- **exact**: hash-groupBy on a normalized key — one shuffle on a short
  hash, the cheapest possible dedup.
- **n-gram Jaccard**: exact set similarity, *blocked* so the pair space
  stays linear-ish (here: equal first shingle; production: any cheap
  equality key). Never all-pairs.
- **MinHash+LSH**: signatures are a pure per-row array expression (no
  explode); the only shuffle is the band-key self-join that produces
  candidates, which is O(candidates), not O(n²). Candidates are then
  verified with exact Jaccard.
- **SimHash**: per-token bit votes aggregated per document; near-dup
  docs land on close hashes (small hamming distance).

All hashes are md5-derived (functions/hashing.py) so the DuckDB oracle
reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import (
    LSH_BANDS,
    band_key,
    band_key_sql,
    minhash_signature,
    minhash_signature_sql,
    token_hash,
    token_hash_sql,
)
from cdc_cascade_spark.llm.prep import (
    DOCS_CTE,
    distinct_shingles,
    first_shingle,
    first_shingle_sql,
    jaccard,
    jaccard_sql,
    tokens,
)

JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 32


def _docs_with_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "text",
        distinct_shingles(tokens(F.col("text"))).alias("shingles"),
    )


# ---------------------------------------------------------------------------
# Exact (normalized) dedup
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized key (lowercased 50-char prefix).

    Classic hash-groupBy: at 100 TB the shuffle carries only
    (32-byte hash, doc_id) pairs, not document text. Returns duplicate
    groups with the kept representative (min doc_id).
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.lower(F.substring("text", 1, 50)))
    return (
        docs.select(key.alias("norm_key"), "doc_id")
        .groupBy("norm_key")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(lower(substr(text, 1, 50))) AS norm_key,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keep_doc_id
FROM documents
GROUP BY 1
HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked exact set similarity)
# ---------------------------------------------------------------------------


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard, blocked on first shingle.

    The block key (a document's first 3-token shingle) turns the O(n²)
    pair space into per-block joins; the join shuffles both sides on
    the same key, so candidates co-locate. Threshold 0.8.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sh = docs.select(
        "doc_id",
        distinct_shingles(toks).alias("shingles"),
        first_shingle(toks).alias("block"),
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        "block",
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        "block",
    )
    pairs = a.join(b, "block").filter(F.col("doc_a") < F.col("doc_b"))
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


ORACLE_NGRAM_JACCARD = (
    DOCS_CTE
    + f"""
, blocked AS (SELECT doc_id, shingles, {first_shingle_sql('toks')} AS block FROM sh)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {jaccard_sql('a.shingles', 'b.shingles')} AS jaccard
FROM blocked a JOIN blocked b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE {jaccard_sql('a.shingles', 'b.shingles')} >= {JACCARD_THRESHOLD}
"""
)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-dup detection with exact-Jaccard verification.

    shingle → 16-permutation MinHash signature (pure array expression)
    → 4 LSH bands → self-join on band key → distinct candidate pairs
    → verify with exact Jaccard ≥ 0.8.

    Scale: the signature step is a projection; band explode multiplies
    rows by 4 (constant); the self-join shuffles on band keys whose
    groups are tiny except for true dup clusters. This is the standard
    100 TB near-dedup shape (vs. the blocked-Jaccard's reliance on a
    lucky equality key).
    """
    sh = _docs_with_shingles(spark, sf_dir)
    sig = sh.select(
        "doc_id",
        "shingles",
        minhash_signature(F.transform("shingles", token_hash)).alias("sig"),
    )
    bands = sig.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"), band_key(F.col("sig"), i).alias("bkey")
                    )
                    for i in range(LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "shingles", "b.band", "b.bkey")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"),
        "band", "bkey",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"),
        "band", "bkey",
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return cand.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


def _minhash_oracle_sql() -> str:
    # bands via UNION ALL — one SELECT per band (LSH_BANDS is a small
    # constant), since VALUES can't reference per-row sig expressions.
    hashes = f"list_transform(shingles, s -> {token_hash_sql('s')})"
    sig = minhash_signature_sql(hashes)
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, shingles, {i} AS band, {band_key_sql('sig', i)} AS bkey FROM sigs"
        for i in range(LSH_BANDS)
    )
    return (
        DOCS_CTE
        + f"""
, sigs AS (SELECT doc_id, shingles, {sig} AS sig FROM sh)
, bands AS (
{band_selects}
)
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                           AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       {jaccard_sql('sa.shingles', 'sb.shingles')} AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE {jaccard_sql('sa.shingles', 'sb.shingles')} >= {JACCARD_THRESHOLD}
"""
    )


ORACLE_MINHASH = _minhash_oracle_sql()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash over token frequencies.

    Each token votes ±1 on each bit of its hash; the document hash is
    the sign vector. Implemented as a per-row array fold (aggregate +
    zip_with) — no explode, no shuffle: at 100 TB this is map-only.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Expressed as one SQL expression because the Python wrappers for
    # shiftleft/shiftright only accept literal shift amounts, while the
    # SQL functions take arbitrary expressions (the lambda variable j).
    th = "cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)"
    bits = SIMHASH_BITS - 1
    simhash = F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate(
              split(text, '\\\\s+'),
              array_repeat(0, {SIMHASH_BITS}),
              (acc, t) -> zip_with(
                acc,
                transform(sequence(0, {bits}),
                          j -> IF((shiftright({th}, j) & 1) = 1, 1, -1)),
                (x, y) -> x + y)),
            sequence(0, {bits}),
            (v, j) -> IF(v > 0, shiftleft(cast(1 as bigint), j), cast(0 as bigint))),
          cast(0 as bigint),
          (acc, x) -> acc + x)
        """
    )
    return docs.select("doc_id", simhash.alias("simhash"))


def _simhash_oracle_sql() -> str:
    th = token_hash_sql("t")
    # votes per bit via unnest (DuckDB lacks a clean list fold with
    # list-typed accumulators); same result, different mechanism.
    return (
        DOCS_CTE
        + f"""
, tok AS (SELECT doc_id, unnest(toks) AS t FROM sh)
, bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (({th}) >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM tok, range({SIMHASH_BITS}) r(j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
FROM bits
GROUP BY doc_id
"""
    )


ORACLE_SIMHASH = _simhash_oracle_sql()


QUERIES: dict[str, tuple] = {
    "dedup_exact": (dedup_exact, ORACLE_DEDUP_EXACT),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, ORACLE_NGRAM_JACCARD),
    "dedup_minhash_lsh": (dedup_minhash_lsh, ORACLE_MINHASH),
    "dedup_simhash": (dedup_simhash, ORACLE_SIMHASH),
}
