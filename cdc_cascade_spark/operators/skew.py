"""Skew-aware join utilities.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) covers sort-merge joins automatically; ``salted_join`` is
the explicit fallback for cases AQE can't fix — e.g. a hot key in a
shuffled hash join or an aggregation feeding a join.

Salting: the skewed (large) side gets a random-ish salt in [0, n);
the small side is replicated n× with every salt value; the join key
becomes (key, salt), splitting each hot key's row group across n
reducers. Salt is derived from a stable column hash, not rand(), so
results stay deterministic and retries are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the large side's hot keys split across ``n_salts``
    partitions and the small side replicated to match.

    Columns of both inputs are preserved (the duplicate key column from
    the small side is dropped).
    """
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*large.columns), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_small = small.select("*", salts)
    joined = salted_large.join(
        replicated_small,
        on=[salted_large[key] == replicated_small[key],
            salted_large["__salt"] == replicated_small["__salt"]],
        how=how,
    )
    return joined.drop(replicated_small[key]).drop("__salt")
