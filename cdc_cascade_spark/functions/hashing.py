"""Cross-engine deterministic hashing for dedup/fingerprint operators.

Spark's native hash functions (xxhash64, murmur) have no DuckDB
counterpart, so every hash the oracle must reproduce is built from
**md5**, which both engines implement identically:

    token_hash(s) = int(md5(s)[0:15], 16)        (60 bits, non-negative)

Spark:  CAST(conv(substr(md5(s),1,15), 16, 10) AS BIGINT)
DuckDB: CAST('0x' || substr(md5(s),1,15) AS BIGINT)

MinHash uses the classic universal-hash family
``h_i(x) = (a_i * (x mod P) + b_i) mod P`` with P = 2^31 - 1; reducing
x mod P first keeps ``a_i * x`` within int64 in both engines (DuckDB
errors on int64 overflow, Spark silently wraps — neither is acceptable).

At 100 TB these are pure per-row projections (JVM-side, codegen'd), no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (prime); keeps a*(x mod P) + b within int64 for a,b < P.
MINHASH_P = 2_147_483_647

# Fixed universal-hash coefficients (M = 16 permutations). Arbitrary but
# fixed; both the Spark expressions and the generated oracle SQL read
# from these same lists.
MINHASH_A = [
    1203077351, 1503091843, 1804289383, 846930886,
    1681692777, 1714636915, 1957747793, 424238335,
    719885386, 1649760492, 596516649, 1189641421,
    1025202362, 1350490027, 783368690, 1102520059,
]
MINHASH_B = [
    2044897763, 1967513926, 1365180540, 1540383426,
    304089172, 1303455736, 35005211, 521595368,
    294702567, 1726956429, 336465782, 861021530,
    278722862, 233665123, 2145174067, 468703135,
]
MINHASH_M = len(MINHASH_A)

# LSH banding: 4 bands × 4 rows over the 16-signature. For Jaccard s,
# candidate probability = 1 - (1 - s^4)^4 — ≈0.9995 at s=0.9, ≈0.23 at
# s=0.5: high recall on true near-dups, few false candidates (the exact
# Jaccard verification removes those).
LSH_BANDS = 4
LSH_ROWS = MINHASH_M // LSH_BANDS


def token_hash(col: Column) -> Column:
    """60-bit non-negative md5-based hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def token_hash_sql(expr: str) -> str:
    """DuckDB fragment computing the identical hash."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# Note: the Spark-side signature is computed as 16 min() AGGREGATE
# expressions over exploded shingle-hash rows (llm/dedup.py), not as an
# array expression — Spark's higher-order array functions are
# interpreted (CodegenFallback), while the aggregate form is codegen'd
# with map-side partial mins. The SQL builders below exist for the
# DuckDB oracle, where list lambdas are native and fast.


def minhash_signature_sql(hashes_expr: str) -> str:
    """DuckDB fragment: the identical signature as a LIST(BIGINT)."""
    parts = [
        f"list_min(list_transform({hashes_expr}, "
        f"h -> ({a} * (h % {MINHASH_P}) + {b}) % {MINHASH_P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    return "[" + ", ".join(parts) + "]"


def band_key_sql(sig_expr: str, band: int) -> str:
    cols = ", ".join(
        f"CAST({sig_expr}[{band * LSH_ROWS + r + 1}] AS VARCHAR)"
        for r in range(LSH_ROWS)
    )
    return f"md5(concat_ws(',', {cols}))"
