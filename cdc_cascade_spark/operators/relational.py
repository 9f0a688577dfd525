"""Batch relational operator library (SURVEY.md §7 Phase 1).

The reference delegates all relational work to Postgres via GORM
(reference: controllers/controllers.go:24-119 — insert, full scan, point
lookup, keyed update, keyed delete); here the same *capability class*
(scan, filter, join, aggregate, window, sort/limit, set ops, scalar
functions) is expressed declaratively on DataFrames so Catalyst plans it
(pushdown, pruning, broadcast selection, partial aggregation).

Determinism conventions (so the DuckDB oracle hash-matches exactly):

- Money/measure sums go through ``DECIMAL`` so the aggregation is exact
  and order-independent (float sums depend on partition order), then are
  cast back to DOUBLE so both engines emit the same schema.
- Averages are computed as ``CAST(decimal_sum AS DOUBLE) / count`` —
  one deterministic double division instead of an engine-specific
  decimal average.
- Every top-k ORDER BY carries a unique tiebreaker key so LIMIT picks
  the same rows in both engines.

Scale notes are in each docstring: what broadcasts, what shuffles, and
why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table


def _dec_sum(col, scale: int = 2, precision: int = 27):
    """Exact, order-independent sum of a double expression → DOUBLE."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → hash agg → sort.

    Scale: single shuffle on a 6-value grouping key with map-side partial
    aggregation; the shipdate filter and 7-column projection push into
    the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(disc_price, scale=6).alias("sum_disc_price"),
            _dec_sum(charge, scale=6).alias("sum_charge"),
            (
                F.sum(F.col("l_quantity").cast("decimal(27,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q04_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style single-group aggregate: pure scan-side filters.

    Scale: no shuffle at all after AQE folds the single-group agg; every
    predicate is parquet-pushdown-eligible (min/max row-group skipping).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q04 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q07_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (mktsegment, orderstatus): grouping sets in one pass.

    Scale: Spark expands the rollup into grouping sets inside a single
    hash aggregate (one shuffle); customer side broadcasts.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"
    )
    return (
        joined.rollup("c_mktsegment", "o_orderstatus")
        .agg(
            _dec_sum(F.col("o_totalprice")).alias("sum_totalprice"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE_Q07 = """
SELECT c_mktsegment, o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_totalprice,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
"""


def q14_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per market segment × order status.

    Scale: pivot on a known 3-value domain compiles to conditional
    aggregates — one shuffle, no per-value scans.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_finished"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


ORACLE_Q14 = """
SELECT c_mktsegment,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q16_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates: exact distinct counts per order priority.

    Scale: count(distinct) expands to a two-stage aggregate
    (dedup shuffle then count) — Catalyst plans both stages with partial
    aggregation. ``approx_count_distinct`` (HLL) is the 100 TB-scale
    variant; the exact form is used here so the oracle can match it.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        _dec_sum(F.col("o_totalprice")).alias("sum_totalprice"),
    )


ORACLE_Q16 = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_totalprice
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


def q02_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join → agg → global top-10 by revenue.

    Scale: customer is a broadcast dim (no shuffle); orders⋈lineitem is
    the one big shuffle, on the join key that the subsequent groupBy
    reuses. The LIMIT is a TakeOrderedAndProject — no global sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q02 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q03_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: 5 tables, revenue by nation in a region.

    Scale: region/nation/supplier/customer all broadcast (fixed or
    sub-linear cardinality); the single shuffle is orders⋈lineitem.
    Filters on the region dim prune before the fact-table shuffle.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(supp, supp.s_nationkey == nation.n_nationkey)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


ORACLE_Q03 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY n_name
"""


def q05_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS via LEFT SEMI join.

    Scale: semi join only needs the distinct keys of the probe side —
    Spark's left-semi hash join never materializes matched rows twice.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_Q05 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via LEFT ANTI join: customers with no orders.

    Scale: anti join broadcasts the distinct order custkeys when small;
    at 100 TB it degrades gracefully to a shuffled semi-structure keyed
    on the same column.
    """
    cust = load_table(spark, sf_dir, "customer")
    # Filtered build side ('P' is the rarest status) so the anti join
    # produces a non-trivial, non-empty result at every scale factor.
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dec_sum(F.col("c_acctbal")).alias("sum_acctbal"),
        )
    )


ORACLE_Q06 = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS sum_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY c_mktsegment
"""


def q15_outer_join_part_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: every part with its (possibly zero) order stats.

    Scale: part is the smaller side but the LEFT side must be preserved,
    so Spark broadcasts the aggregated lineitem summary instead of the
    dimension — aggregate-before-join shrinks the shuffle by orders of
    magnitude (partial agg on l_partkey first).
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    li_agg = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        _dec_sum(F.col("l_quantity")).alias("sum_qty"),
    )
    return (
        part.join(li_agg, part.p_partkey == li_agg.l_partkey, "left")
        .select(
            "p_partkey",
            "p_brand",
            F.coalesce("n_lineitems", F.lit(0)).alias("n_lineitems"),
            F.coalesce("sum_qty", F.lit(0.0)).alias("sum_qty"),
        )
    )


ORACLE_Q15 = """
SELECT p_partkey, p_brand,
       COALESCE(n_lineitems, 0) AS n_lineitems,
       COALESCE(sum_qty, 0.0) AS sum_qty
FROM part
LEFT JOIN (
  SELECT l_partkey, COUNT(*) AS n_lineitems,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_partkey
) li ON p_partkey = l_partkey
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


def q08_topk_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by account balance per market segment (row_number).

    Scale: one shuffle on the partition key; rank-pushdown (Spark 3.5+
    WindowGroupLimit) stops each partition after k rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rank_in_segment", F.row_number().over(w))
        .filter(F.col("rank_in_segment") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rank_in_segment")
    )


ORACLE_Q08 = """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal, rank_in_segment
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_segment
  FROM customer
) WHERE rank_in_segment <= 3
"""


def q09_monthly_revenue_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with running total, lag delta, and dense rank.

    Demonstrates frame-based windows (running sum), offset windows
    (lag), and ranking — the same primitives the CDC latest-wins
    compaction uses (SURVEY.md §4).

    Scale: the aggregation shrinks data to one row per month before any
    window runs, so the window's single-partition sort is tiny.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month")
    ).agg(_dec_sum(F.col("o_totalprice")).alias("revenue"))
    w = W.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(27,6)"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_revenue"),
        (F.col("revenue") - F.lag("revenue", 1).over(w)).alias("mom_delta"),
        F.dense_rank().over(W.orderBy(F.desc("revenue"), F.asc("month"))).alias("revenue_rank"),
    )


ORACLE_Q09 = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       CAST(SUM(CAST(revenue AS DECIMAL(27,6))) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue,
       revenue - LAG(revenue, 1) OVER (ORDER BY month) AS mom_delta,
       DENSE_RANK() OVER (ORDER BY revenue DESC, month ASC) AS revenue_rank
FROM monthly
"""


def q13_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap>30min starts a new session (lag + cumsum).

    The batch analog of streaming ``session_window`` (Phase 3); per-user
    windows shuffle once on user_id and never cross partitions.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ has no direct long cast; with the session pinned to
    # UTC the round-trip through TIMESTAMP is exact (floor to seconds).
    sec = F.col("ts").cast("timestamp").cast("long")
    with_gap = ev.select(
        "user_id",
        "ts",
        "event_id",
        sec.alias("sec"),
        (F.coalesce(sec - F.lag(sec, 1).over(w), F.lit(0)) > 1800)
        .cast("int")
        .alias("new_session"),
    )
    with_sid = with_gap.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("sec") - F.min("sec")).alias("duration_sec"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.max("duration_sec").alias("max_session_sec"),
        )
    )


ORACLE_Q13 = """
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), flagged AS (
  SELECT user_id, ts, event_id, sec,
         CASE WHEN COALESCE(sec - LAG(sec) OVER w, 0) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, sec,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
), sessions AS (
  SELECT user_id, session_seq, COUNT(*) AS n_events,
         MAX(sec) - MIN(sec) AS duration_sec
  FROM sid GROUP BY user_id, session_seq
)
SELECT user_id, COUNT(*) AS n_sessions,
       MAX(n_events) AS max_session_events,
       CAST(MAX(duration_sec) AS BIGINT) AS max_session_sec
FROM sessions GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


def q10_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-key sets, tagged counts.

    Scale: set ops compile to aggregate/join forms; keys stay
    partitioned by the same hash throughout, so the three branches reuse
    one exchange.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("k")
    )
    active = orders.select(F.col("o_custkey").alias("k")).distinct()
    rich_and_active = rich.intersect(active)
    rich_not_active = rich.exceptAll(rich_and_active)
    either = rich.union(active).distinct()
    return (
        rich_and_active.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("rich_and_active").alias("set_name"), "n"
        )
        .union(
            rich_not_active.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("rich_not_active").alias("set_name"), "n"
            )
        )
        .union(
            either.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("rich_or_active").alias("set_name"), "n"
            )
        )
    )


ORACLE_Q10 = """
WITH rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
     active AS (SELECT DISTINCT o_custkey AS k FROM orders)
SELECT 'rich_and_active' AS set_name, COUNT(*) AS n FROM (SELECT k FROM rich INTERSECT SELECT k FROM active)
UNION ALL
SELECT 'rich_not_active', COUNT(*) FROM (SELECT k FROM rich EXCEPT SELECT k FROM active)
UNION ALL
SELECT 'rich_or_active', COUNT(*) FROM (SELECT k FROM rich UNION SELECT k FROM active)
"""


# ---------------------------------------------------------------------------
# Scalar functions (string / date / math / conditional)
# ---------------------------------------------------------------------------


def q11_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function coverage: string, date, math, conditional.

    All JVM-side built-ins — the whole projection stays inside one
    WholeStageCodegen span with zero Python involvement.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.upper(F.substring("o_orderpriority", 3, 20)).alias("priority_name"),
        F.concat_ws("#", F.col("o_orderstatus"), F.col("o_orderpriority")).alias(
            "status_tag"
        ),
        F.length("o_orderpriority").alias("priority_len"),
        # floor, not round: round() half-boundary rules differ between
        # engines (Spark HALF_UP vs DuckDB half-to-even)
        F.floor(F.col("o_totalprice")).alias("price_floor"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.abs(F.col("o_totalprice") - 150000.0).alias("price_dev"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


ORACLE_Q11 = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
       upper(substring(o_orderpriority, 3, 20)) AS priority_name,
       concat_ws('#', o_orderstatus, o_orderpriority) AS status_tag,
       CAST(length(o_orderpriority) AS INTEGER) AS priority_len,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       o_orderkey % 7 AS key_mod7,
       abs(o_totalprice - 150000.0) AS price_dev,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band
FROM orders
"""


def q12_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over events.props (get_json_object).

    Scale: JSON path extraction is a JVM built-in; the aggregate then
    shuffles only 5 groups.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum(F.col("value"), scale=6).alias("sum_value"),
        )
    )


ORACLE_Q12 = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""


def q17_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling window: hourly event counts (streaming analog: Phase 3).

    Scale: date_trunc is a pure projection; the agg shuffles on
    (hour, event_type) with map-side combine.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum(F.col("value"), scale=6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ORACLE_Q17 = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q18_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90) per order status.

    Uses exact ``percentile`` (sort-based within group) so the oracle
    matches; ``percentile_approx`` (t-digest) is the 100 TB variant but
    its sketch is engine-specific.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


ORACLE_Q18 = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus
"""


def q19_cube_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_Q19 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q20_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


ORACLE_Q20 = """
SELECT o_orderstatus, o_orderpriority,
       CAST(CASE WHEN GROUPING(o_orderstatus) THEN 1 ELSE 0 END AS INTEGER) AS g_status,
       CAST(CASE WHEN GROUPING(o_orderpriority) THEN 1 ELSE 0 END AS INTEGER) AS g_priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


def q21_above_segment_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: customers above their segment's mean
    balance — decorrelated into an aggregate + broadcast join (what
    Catalyst does to the subquery form anyway, stated explicitly).
    """
    cust = load_table(spark, sf_dir, "customer")
    seg_avg = cust.groupBy("c_mktsegment").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("seg_avg")
    )
    return (
        cust.join(F.broadcast(seg_avg), "c_mktsegment")
        .filter(F.col("c_acctbal") > F.col("seg_avg"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_above_avg"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


ORACLE_Q21 = """
WITH seg AS (
  SELECT c_mktsegment,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS seg_avg
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_mktsegment, COUNT(*) AS n_above_avg, MAX(c_acctbal) AS max_bal
FROM customer c JOIN seg s ON c.c_mktsegment = s.c_mktsegment
WHERE c.c_acctbal > s.seg_avg
GROUP BY c.c_mktsegment
"""


def q22_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subquery shapes via SQL (Catalyst rewrites to
    semi/anti joins — asserted in tests/test_plans.py)."""
    register = load_table
    register(spark, sf_dir, "orders").createOrReplaceTempView("orders_q22")
    register(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q22")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders_q22
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_q22
                             WHERE l_quantity >= 45)
        GROUP BY o_orderstatus
        """
    )


ORACLE_Q22 = """
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 45)
GROUP BY o_orderstatus
"""


def q23_timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time-series rollup: hourly → daily by partial
    re-aggregation (the hypertable/continuous-aggregate pattern).

    The daily tier aggregates the *hourly tier's* partials, not the raw
    events — at 100 TB each coarser resolution reads the much smaller
    finer rollup, and counts/sums compose losslessly (count-distinct
    would not; it stays per-tier).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,6)")).alias("sum_value_dec"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("hour")).cast("timestamp_ntz").alias("day"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_dec").cast("double").alias("sum_value"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    return daily


ORACLE_Q23 = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(27,6))) AS sum_value_dec
  FROM events GROUP BY 1, 2
)
SELECT date_trunc('day', hour) AS day, event_type,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(sum_value_dec) AS DOUBLE) AS sum_value,
       COUNT(*) AS n_hours
FROM hourly GROUP BY 1, 2
"""


def q24_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + posexplode (lateral view): generate one row
    per installment of each order, with a deterministic split amount.

    Covers array generation (`sequence`), lateral flattening
    (`posexplode`), and position-dependent projection — the UNNEST WITH
    ORDINALITY shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    n_installments = (F.col("o_orderkey") % 3 + 1).cast("int")
    return (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            n_installments.alias("n_inst"),
            F.posexplode(F.sequence(F.lit(1), n_installments)).alias("pos", "inst"),
        )
        .select(
            "o_orderkey",
            (F.col("pos") + 1).alias("installment_no"),
            F.col("n_inst"),
            # raw IEEE division — round() half-boundary rules differ
            # between engines, plain double division does not
            (F.col("o_totalprice") / F.col("n_inst")).alias("amount"),
        )
    )


ORACLE_Q24 = """
SELECT o_orderkey,
       CAST(u.i AS INTEGER) AS installment_no,
       CAST(o_orderkey % 3 + 1 AS INTEGER) AS n_inst,
       o_totalprice / (o_orderkey % 3 + 1) AS amount
FROM orders, LATERAL (SELECT unnest(range(1, o_orderkey % 3 + 2)) AS i) u
"""


def q25_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar coverage: truncation, arithmetic, extraction."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_trunc("quarter", d).cast("timestamp_ntz").alias("quarter_start"),
        F.quarter(d).alias("quarter_no"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("week_no"),
        # DATE columns arrive in pandas as python date objects (vs
        # datetime64 from DuckDB) — emit timestamps for stable compares
        F.last_day(d.cast("date")).cast("timestamp_ntz").alias("month_end"),
        F.date_add(d.cast("date"), 30).cast("timestamp_ntz").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias(
            "days_to_2002"
        ),
        F.unix_timestamp(d.cast("timestamp")).alias("epoch_sec"),
    )


ORACLE_Q25 = """
SELECT o_orderkey,
       date_trunc('quarter', o_orderdate) AS quarter_start,
       CAST(quarter(o_orderdate) AS INTEGER) AS quarter_no,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS week_no,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec
FROM orders
"""


def q26_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex scalar coverage over part names."""
    part = load_table(spark, sf_dir, "part")
    s = F.col("p_name")
    return part.select(
        "p_partkey",
        F.initcap(s).alias("name_title"),
        F.reverse(s).alias("name_rev"),
        F.translate(s, "aeiou", "AEIOU").alias("name_vowels_up"),
        F.regexp_replace(s, "[0-9]+", "#").alias("name_num_masked"),
        F.regexp_extract(F.col("p_type"), "([A-Z]+)$", 1).alias("type_last_word"),
        F.element_at(F.split(F.col("p_brand"), "#"), 2).alias("brand_no"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.instr(F.col("p_type"), "E").alias("first_e_pos"),
        (F.col("p_type").rlike("^[A-Z]")).cast("int").alias("starts_upper"),
    )


ORACLE_Q26 = """
SELECT p_partkey,
       -- DuckDB has no initcap; emulate per word
       array_to_string(list_transform(string_split(p_name, ' '),
         w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ') AS name_title,
       reverse(p_name) AS name_rev,
       translate(p_name, 'aeiou', 'AEIOU') AS name_vowels_up,
       regexp_replace(p_name, '[0-9]+', '#', 'g') AS name_num_masked,
       COALESCE(regexp_extract(p_type, '([A-Z]+)$', 1), '') AS type_last_word,
       string_split(p_brand, '#')[2] AS brand_no,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       CAST(strpos(p_type, 'E') AS INTEGER) AS first_e_pos,
       CASE WHEN regexp_matches(p_type, '^[A-Z]') THEN 1 ELSE 0 END AS starts_upper
FROM part
"""


def q27_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with unmatched rows on both sides.

    Scale: full outer cannot broadcast (both sides must be preserved)
    — it shuffles both inputs on the key; the pre-aggregation of the
    orders side shrinks the bigger input before that shuffle.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 7000
    ).select("c_custkey", "c_mktsegment", "c_acctbal")
    big_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
    )
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.coalesce("c_mktsegment", F.lit("<no-cust-row>")).alias("segment"),
            F.coalesce("n_big_orders", F.lit(0)).alias("n_big_orders"),
            (F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull())
            .cast("int")
            .alias("matched"),
        )
    )


ORACLE_Q27 = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_acctbal > 7000
), big AS (
  SELECT o_custkey, COUNT(*) AS n_big_orders FROM orders
  WHERE o_totalprice > 250000 GROUP BY o_custkey
)
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       COALESCE(c_mktsegment, '<no-cust-row>') AS segment,
       CAST(COALESCE(n_big_orders, 0) AS BIGINT) AS n_big_orders,
       CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL
            THEN 1 ELSE 0 END AS matched
FROM cust FULL OUTER JOIN big ON c_custkey = o_custkey
"""


def q28_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended window-function coverage: ntile, percent_rank,
    cume_dist, first/last value, and a RANGE frame — all over one
    window spec so a single sort serves every function."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).alias("poorest_custkey"),
        F.last("c_custkey")
        .over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("richest_custkey"),
        F.count(F.lit(1))
        .over(
            W.partitionBy("c_mktsegment")
            .orderBy("c_acctbal")
            .rangeBetween(-1000, 0)
        )
        .alias("peers_within_1000"),
    )


ORACLE_Q28 = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(c_custkey) OVER w AS poorest_custkey,
       last_value(c_custkey) OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal ASC, c_custkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_custkey,
       COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
           RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS peers_within_1000
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
"""


def q29_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + element ops: sequence generation, contains,
    position-stable sort, slicing, and an exact integer fold — the
    array-native surface (DuckDB lists / Spark arrays).

    All deterministic: arrays are generated (``sequence``), never
    aggregated from rows, so element order is defined in both engines.
    Pure per-row projection — no shuffle at any scale.
    """
    part = load_table(spark, sf_dir, "part")
    arr = F.sequence(F.lit(1), (F.col("p_partkey") % 5) + 1)
    return part.select(
        "p_partkey",
        F.size(arr).alias("arr_len"),
        F.array_contains(arr, 3).alias("has_three"),
        F.element_at(F.reverse(arr), 1).alias("last_elem"),
        F.slice(arr, 1, 2).cast("string").alias("first_two"),
        F.aggregate(arr, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "arr_sum"
        ),
        F.array_max(arr).alias("arr_max"),
    )


ORACLE_Q29 = """
SELECT p_partkey,
       CAST(len(range(1, (p_partkey % 5) + 2)) AS INTEGER) AS arr_len,
       list_contains(range(1, (p_partkey % 5) + 2), 3) AS has_three,
       list_reverse(range(1, (p_partkey % 5) + 2))[1] AS last_elem,
       CAST(CAST(range(1, (p_partkey % 5) + 2)[1:2] AS BIGINT[]) AS VARCHAR) AS first_two,
       list_sum(range(1, (p_partkey % 5) + 2))::BIGINT AS arr_sum,
       list_max(range(1, (p_partkey % 5) + 2)) AS arr_max
FROM part
"""


def q30_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: null-safe equality (<=> / IS NOT DISTINCT
    FROM), NULLIF, COALESCE chains, and NULL-tolerant greatest/least —
    the semantics corner every engine port gets subtly wrong.

    Pure projection over an outer join that manufactures real NULLs
    (customers without orders), so the NULL paths are exercised by
    data, not literals.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        _dec_sum(F.col("o_totalprice")).alias("spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    j = cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.col("n_orders").eqNullSafe(F.lit(None).cast("long")).alias("never_ordered"),
        F.nullif(F.col("n_orders"), F.lit(1)).alias("orders_unless_one"),
        F.coalesce(F.col("spend"), F.col("c_acctbal"), F.lit(0.0)).alias(
            "effective_value"
        ),
        F.greatest(F.col("spend"), F.col("c_acctbal")).alias("best_value"),
        (F.col("spend").isNull() & (F.col("c_acctbal") > 0)).alias(
            "dormant_with_balance"
        ),
    )


ORACLE_Q30 = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS spend,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey,
       n_orders IS NOT DISTINCT FROM NULL AS never_ordered,
       nullif(n_orders, 1) AS orders_unless_one,
       coalesce(spend, c_acctbal, 0.0) AS effective_value,
       greatest(spend, c_acctbal) AS best_value,
       (spend IS NULL AND c_acctbal > 0) AS dormant_with_balance
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
"""


def q31_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long reshaping) — the inverse of q14's pivot.

    Per-priority order metrics computed wide, then melted into
    (priority, metric, value) rows with ``DataFrame.unpivot`` (Spark's
    ``stack``/melt). The unpivot is a zero-shuffle projection — each
    wide row expands in place — so the only exchange is the aggregate's.
    """
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        _dec_sum(F.col("o_totalprice")).alias("sum_total"),
        F.max("o_totalprice").alias("max_total"),
        F.min("o_totalprice").alias("min_total"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["sum_total", "max_total", "min_total"],
        "metric",
        "value",
    )


ORACLE_Q31 = """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_total,
         MAX(o_totalprice) AS max_total,
         MIN(o_totalprice) AS min_total
  FROM orders GROUP BY o_orderpriority
)
UNPIVOT wide ON sum_total, max_total, min_total INTO NAME metric VALUE value
"""


QUERIES: dict[str, tuple] = {
    "q01_pricing_summary": (q01_pricing_summary, ORACLE_Q01),
    "q02_topk_orders": (q02_topk_orders, ORACLE_Q02),
    "q03_supplier_volume": (q03_supplier_volume, ORACLE_Q03),
    "q04_forecast_revenue": (q04_forecast_revenue, ORACLE_Q04),
    "q05_order_priority_semi": (q05_order_priority_semi, ORACLE_Q05),
    "q06_customers_without_orders": (q06_customers_without_orders, ORACLE_Q06),
    "q07_rollup_sales": (q07_rollup_sales, ORACLE_Q07),
    "q08_topk_customers_per_segment": (q08_topk_customers_per_segment, ORACLE_Q08),
    "q09_monthly_revenue_window": (q09_monthly_revenue_window, ORACLE_Q09),
    "q10_set_operations": (q10_set_operations, ORACLE_Q10),
    "q11_scalar_functions": (q11_scalar_functions, ORACLE_Q11),
    "q12_json_extraction": (q12_json_extraction, ORACLE_Q12),
    "q13_sessionize_events": (q13_sessionize_events, ORACLE_Q13),
    "q14_pivot_status": (q14_pivot_status, ORACLE_Q14),
    "q15_outer_join_part_activity": (q15_outer_join_part_activity, ORACLE_Q15),
    "q16_distinct_stats": (q16_distinct_stats, ORACLE_Q16),
    "q17_tumbling_hourly": (q17_tumbling_hourly, ORACLE_Q17),
    "q18_price_percentiles": (q18_price_percentiles, ORACLE_Q18),
    "q19_cube_volume": (q19_cube_volume, ORACLE_Q19),
    "q20_grouping_sets": (q20_grouping_sets, ORACLE_Q20),
    "q21_above_segment_average": (q21_above_segment_average, ORACLE_Q21),
    "q22_in_subquery": (q22_in_subquery, ORACLE_Q22),
    "q23_timeseries_rollup": (q23_timeseries_rollup, ORACLE_Q23),
    "q24_explode_lateral": (q24_explode_lateral, ORACLE_Q24),
    "q25_datetime_functions": (q25_datetime_functions, ORACLE_Q25),
    "q26_string_functions": (q26_string_functions, ORACLE_Q26),
    "q27_full_outer_join": (q27_full_outer_join, ORACLE_Q27),
    "q28_window_suite": (q28_window_suite, ORACLE_Q28),
    "q29_array_functions": (q29_array_functions, ORACLE_Q29),
    "q30_null_semantics": (q30_null_semantics, ORACLE_Q30),
    "q31_unpivot_metrics": (q31_unpivot_metrics, ORACLE_Q31),
}
