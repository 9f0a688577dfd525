"""Shared document preparation: tokenization and shingle hashing.

Both the Spark expressions and the DuckDB oracle fragments live here so
the two can never drift.

Design note (performance): Spark's higher-order array functions are
CodegenFallback (interpreted), so per-shingle string building + md5
was the dominant cost of every dedup operator. Instead, each *token*
is md5-hashed once, and a 3-token shingle's identity is an arithmetic
combination of the three token hashes mod P:

    shingle_hash(i) = (K1*rh[i] + K2*rh[i+1] + K3*rh[i+2]) mod P,
    rh[j] = token_hash(tok[j]) mod P

Each product stays under P² < 2^63 (DuckDB errors on int64 overflow,
Spark wraps silently — neither acceptable), and the reduction keeps
the 3-term sum under 3P. Hash collisions across distinct shingles are
~n²/P per doc (n≈50, P≈2³¹) — negligible for set similarity.

Documents shorter than 3 tokens fall back to one whole-document hash
of the space-joined tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cdc_cascade_spark.functions.hashing import MINHASH_P, token_hash, token_hash_sql

SHINGLE_K = 3
SHINGLE_K1 = 1_000_003
SHINGLE_K2 = 1_000_033
SHINGLE_K3 = 1_000_037


def tokens(col: Column) -> Column:
    return F.split(col, r"\s+")


TOKENS_SQL = r"string_split_regex({x}, '\s+')"


def shingle_hash_set(toks: Column) -> Column:
    """Distinct 3-token shingle hashes (array<bigint>, values < P).

    Built from three shifted slices of the token-hash array combined
    with ``zip_with`` — NOT ``element_at`` in a positional transform:
    Spark inlines array subexpressions, so per-index ``element_at(rh,
    i)`` re-evaluates the entire md5 transform for every access
    (O(n²) hashing). The slice/zip_with form touches each hash O(1)
    times.
    """
    rh = F.transform(toks, lambda t: token_hash(t) % MINHASH_P)
    n = F.size(toks)
    m = n - (SHINGLE_K - 1)
    t1 = F.slice(rh, 1, m)
    t2 = F.slice(rh, 2, m)
    t3 = F.slice(rh, 3, m)
    part = F.zip_with(
        t1,
        t2,
        lambda x, y: (F.lit(SHINGLE_K1) * x) % MINHASH_P
        + (F.lit(SHINGLE_K2) * y) % MINHASH_P,
    )
    combos = F.zip_with(
        part, t3, lambda s, z: (s + (F.lit(SHINGLE_K3) * z) % MINHASH_P) % MINHASH_P
    )
    whole = F.array(token_hash(F.concat_ws(" ", toks)) % MINHASH_P)
    return F.when(n >= SHINGLE_K, F.array_distinct(combos)).otherwise(whole)


_WHOLE_DOC_HASH_SQL = (
    token_hash_sql("array_to_string(toks, ' ')") + f" % {MINHASH_P}"
)

_COMBO_SQL = (
    f"(({SHINGLE_K1} * rh[i]) % {MINHASH_P} "
    f"+ ({SHINGLE_K2} * rh[i+1]) % {MINHASH_P} "
    f"+ ({SHINGLE_K3} * rh[i+2]) % {MINHASH_P}) % {MINHASH_P}"
)

# Standard documents CTE shared by the dedup/text oracle queries:
# docs (tokens) → with_rh (per-token reduced hashes) → sh (distinct
# shingle-hash set in column `shingles`).
DOCS_CTE = (
    "WITH docs AS (\n"
    "  SELECT doc_id, lang, source, n_chars, text,\n"
    f"         {TOKENS_SQL.format(x='text')} AS toks\n"
    "  FROM documents\n"
    "), with_rh AS (\n"
    f"  SELECT *, list_transform(toks, t -> {token_hash_sql('t')} % {MINHASH_P}) AS rh\n"
    "  FROM docs\n"
    "), sh AS (\n"
    "  SELECT * EXCLUDE (rh),\n"
    f"         CASE WHEN len(toks) >= {SHINGLE_K} THEN "
    f"list_distinct(list_transform(range(1, len(toks) - {SHINGLE_K - 2}), i -> {_COMBO_SQL})) "
    f"ELSE [{_WHOLE_DOC_HASH_SQL}] END AS shingles\n"
    "  FROM with_rh\n"
    ")\n"
)


def first_shingle(toks: Column) -> Column:
    """First 3-token shingle string, straight from the token array.

    Used as a blocking key — computed from ``toks`` (ordered), NOT from
    the deduplicated shingle list: DuckDB's ``list_distinct`` does not
    preserve element order, so ``shingles[1]`` is engine-dependent.
    """
    n = F.size(toks)
    return F.when(
        n >= SHINGLE_K, F.concat_ws(" ", F.slice(toks, 1, SHINGLE_K))
    ).otherwise(F.concat_ws(" ", toks))


def first_shingle_sql(toks_expr: str) -> str:
    k = SHINGLE_K
    return (
        f"CASE WHEN len({toks_expr}) >= {k} THEN "
        f"array_to_string({toks_expr}[1:{k}], ' ') "
        f"ELSE array_to_string({toks_expr}, ' ') END"
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two deduplicated arrays (double)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - F.size(F.array_intersect(a, b)))


def jaccard_sql(a: str, b: str) -> str:
    return (
        f"len(list_intersect({a}, {b}))::DOUBLE / "
        f"(len({a}) + len({b}) - len(list_intersect({a}, {b})))"
    )
