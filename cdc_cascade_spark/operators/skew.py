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


def _check_join_type(how: str, op: str) -> None:
    """Reject join types whose unmatched SMALL-side rows would reach
    the output once per salt replica (right/full family); accept every
    Spark alias of the safe types (inner/left/semi/anti), since
    ``DataFrame.join`` itself treats e.g. ``leftsemi`` and
    ``left_semi`` as the same join."""
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "left", "leftouter", "leftsemi", "semi",
                    "leftanti", "anti"):
        raise ValueError(f"{op} does not support how={how!r}")


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
    _check_join_type(how, "salted_join")
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(*large.columns), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__rsalt")
    # the small side's key and salt are RENAMED before the join and
    # dropped by name after it — never dropped via a frame-qualified
    # column reference: when the two inputs share lineage (e.g. both
    # derive from the same table, or the join runs inside foreachBatch
    # where the analyzer deduplicates attribute ids), drop(df[col])
    # can silently no-op on the rewritten ids and leak a duplicate key
    # column into the output
    replicated_small = small.withColumnRenamed(key, "__rkey").select("*", salts)
    joined = salted_large.join(
        replicated_small,
        on=[salted_large[key] == replicated_small["__rkey"],
            salted_large["__salt"] == replicated_small["__rsalt"]],
        how=how,
    )
    return joined.drop("__rkey", "__rsalt", "__salt")


def salted_join_targeted(
    large: DataFrame,
    small: DataFrame,
    key: str,
    hot: DataFrame,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Partial salting: split ONLY the keys in ``hot`` across
    ``n_salts`` reducers; cold keys keep salt 0 and the small side is
    replicated only for hot keys.

    ``hot`` is a one-column frame of hot key values — in production,
    the output of the streaming skew monitor
    (``streaming/windows.py::hot_keys``) for the current period. This
    is the shape that matters at 100 TB: blanket salting
    (:func:`salted_join`) multiplies the ENTIRE small side n×, which
    for a skew profile of a handful of hot keys wastes (n−1)·|small|
    rows of shuffle and state; targeted salting's replication cost is
    (n−1)·|hot ∩ small| rows — proportional to the skew, not the
    table. The hot list broadcasts (it is small by definition — a key
    list a monitor emitted), so marking costs no shuffle on either
    side.

    Salt is a stable column hash (never ``rand()``): deterministic
    under retries, and output equals the plain join for ANY hot list
    (property-tested) — the list only moves rows between reducers.
    """
    _check_join_type(how, "salted_join_targeted")
    hot_keys_df = F.broadcast(
        hot.select(F.col(hot.columns[0]).alias(key)).distinct()
    )
    hot_marked = hot_keys_df.withColumn("__hot", F.lit(1))
    salted_large = (
        large.join(hot_marked, key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(F.xxhash64(*large.columns), F.lit(n_salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    # rename-before-join / drop-by-name, for the same shared-lineage
    # reason documented in salted_join
    replicated_small = (
        small.join(hot_marked, key, "left")
        .withColumn(
            "__salts",
            F.when(
                F.col("__hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .drop("__hot")
        .withColumn("__rsalt", F.explode("__salts"))
        .drop("__salts")
        .withColumnRenamed(key, "__rkey")
    )
    joined = salted_large.join(
        replicated_small,
        on=[salted_large[key] == replicated_small["__rkey"],
            salted_large["__salt"] == replicated_small["__rsalt"]],
        how=how,
    )
    return joined.drop("__rkey", "__rsalt", "__salt")
