"""Data-quality constraint gate: the validation report an ingest
pipeline runs before promoting a batch.

Declarative checks (PK uniqueness, referential integrity, null and
range constraints, derived-column consistency) evaluated as ordinary
DataFrame plans and emitted as one (check_name, n_violations) row per
check — the shape a quality dashboard or a promote/quarantine decision
consumes. The reference enforces its one PK constraint in Postgres DDL
(scripts/init.sql:4, SURVEY.md §2 C7); this generalizes that gate to
engine-side checks that run anywhere.

Scale shape (100 TB):

- Same-table row predicates (nulls, ranges, derived-column drift) are
  FUSED into one scan with conditional-sum aggregates — five checks
  cost one pass, map-side combined, result is 1 row.
- PK uniqueness is ``count(*) − count(DISTINCT pk)`` — one hash
  aggregate on the key, no join.
- Referential checks are anti-joins on the key columns; at scale these
  shuffle only (key) pairs and AQE picks broadcast sides when a
  dimension fits.
- Every check result is a single bigint row; the union is trivially
  cheap regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

LINEITEM_QTY_MIN = 1.0
LINEITEM_QTY_MAX = 50.0


def _check(name: str, count_col) -> tuple:
    return (name, count_col)


def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check_name, n_violations) for the standing constraint suite.

    A clean corpus reports zeros; ``orders_without_lineitem`` fires on
    the TPC-H-style data (orders legitimately exist with no line items
    — the check demonstrates a *fired* row flows through the same
    path, it is not an error in the data).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    pk = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n")
    ).select(F.lit("orders_pk_unique").alias("check_name"), F.col("n"))

    fk_li = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == orders.o_orderkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("lineitem_fk_orders").alias("check_name"), F.col("n"))
    )

    no_li = (
        orders.join(
            lineitem.select("l_orderkey"),
            orders.o_orderkey == lineitem.l_orderkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("orders_without_lineitem").alias("check_name"), F.col("n"))
    )

    # fused single-pass row predicates over lineitem
    li_fused = lineitem.agg(
        F.sum(
            F.when(
                F.col("l_quantity").isNull()
                | F.col("l_extendedprice").isNull()
                | F.col("l_discount").isNull(),
                1,
            ).otherwise(0)
        ).alias("nulls"),
        F.sum(
            F.when(
                (F.col("l_quantity") < LINEITEM_QTY_MIN)
                | (F.col("l_quantity") > LINEITEM_QTY_MAX),
                1,
            ).otherwise(0)
        ).alias("range"),
    )
    li_nulls = li_fused.select(
        F.lit("lineitem_required_columns_not_null").alias("check_name"),
        F.col("nulls").alias("n"),
    )
    li_range = li_fused.select(
        F.lit("lineitem_quantity_in_range").alias("check_name"),
        F.col("range").alias("n"),
    )

    doc_len = docs.agg(
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("n")
    ).select(
        F.lit("documents_n_chars_consistent").alias("check_name"), F.col("n")
    )

    out = pk
    for frame in (fk_li, no_li, li_nulls, li_range, doc_len):
        out = out.unionByName(frame)
    return out


ORACLE_DQ = f"""
SELECT 'orders_pk_unique' AS check_name,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n
FROM orders
UNION ALL
SELECT 'lineitem_fk_orders',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l ANTI JOIN orders o
        ON l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'orders_without_lineitem',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o ANTI JOIN lineitem l
        ON o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem_required_columns_not_null',
       (SELECT CAST(COALESCE(SUM(CASE WHEN l_quantity IS NULL
                                   OR l_extendedprice IS NULL
                                   OR l_discount IS NULL THEN 1 ELSE 0 END), 0)
             AS BIGINT)
        FROM lineitem)
UNION ALL
SELECT 'lineitem_quantity_in_range',
       (SELECT CAST(COALESCE(SUM(CASE WHEN l_quantity < {LINEITEM_QTY_MIN}
                                   OR l_quantity > {LINEITEM_QTY_MAX}
                                 THEN 1 ELSE 0 END), 0)
             AS BIGINT)
        FROM lineitem)
UNION ALL
SELECT 'documents_n_chars_consistent',
       (SELECT CAST(COALESCE(SUM(CASE WHEN n_chars <> length(text)
                                 THEN 1 ELSE 0 END), 0)
             AS BIGINT)
        FROM documents)
"""


QUERIES: dict[str, tuple] = {
    "dq_constraint_report": (dq_constraint_report, ORACLE_DQ),
}
