"""Shared document preparation: tokenization and shingling.

Both the Spark expressions and the DuckDB oracle fragments live here so
the two can never drift. Tokenization is whitespace splitting; shingles
are 3-token windows (deduplicated for set-based similarity). Documents
shorter than 3 tokens fall back to a single whole-document shingle.

Everything is a per-row array expression — no explode, no shuffle, no
Python; at 100 TB this is embarrassingly parallel map work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_K = 3


def tokens(col: Column) -> Column:
    return F.split(col, r"\s+")


TOKENS_SQL = r"string_split_regex({x}, '\s+')"


def distinct_shingles(toks: Column) -> Column:
    """Deduplicated 3-token shingles of a token array."""
    n = F.size(toks)
    windowed = F.transform(
        F.sequence(F.lit(1), n - (SHINGLE_K - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, SHINGLE_K)),
    )
    return F.when(
        n >= SHINGLE_K, F.array_distinct(windowed)
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def distinct_shingles_sql(toks_expr: str) -> str:
    k = SHINGLE_K
    return (
        f"CASE WHEN len({toks_expr}) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len({toks_expr}) - {k - 2}), "
        f"i -> array_to_string({toks_expr}[i:i+{k - 1}], ' '))) "
        f"ELSE [array_to_string({toks_expr}, ' ')] END"
    )


# Standard documents CTE shared by the dedup/text oracle queries.
DOCS_CTE = (
    "WITH docs AS (\n"
    "  SELECT doc_id, lang, source, n_chars, text,\n"
    f"         {TOKENS_SQL.format(x='text')} AS toks\n"
    "  FROM documents\n"
    "), sh AS (\n"
    f"  SELECT *, {distinct_shingles_sql('toks')} AS shingles FROM docs\n"
    ")\n"
)


def first_shingle(toks: Column) -> Column:
    """First 3-token shingle straight from the token array.

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
