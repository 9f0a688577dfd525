"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, find the latest right row with the same key whose
time is ≤ the left row's time. Implemented with the scalable
union-sort-window composition:

  1. tag and union both sides on (key, time)
  2. one window per key ordered by (time, right-before-left on ties,
     tiebreaker) with ``last(struct(<right cols>), ignorenulls=True)``
     carrying the most recent right row forward — a SINGLE struct, not
     one carry per column, so every ``matched_*`` value comes from the
     same right row even when some right columns are NULL (per-column
     carries would stitch fields from different rows and resurrect
     stale non-NULL values over a legitimately-NULL latest one)
  3. keep left rows, project the struct's fields

One shuffle + one sort per key — no per-key loops, no range-explosion
join, state bounded by the window frame. This is the standard 100 TB
as-of shape (pd.merge_asof per group via applyInPandas is the
small-data alternative; the window form wins at scale because it never
materializes per-key pandas frames).

Ties (several right rows at the same timestamp) break by a caller-
supplied tiebreaker column (highest wins), which keeps the result
deterministic — native ASOF implementations (e.g. DuckDB's ASOF JOIN)
leave tie choice unspecified, so the oracle uses this same windowed
SQL rather than ASOF syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tiebreaker: str,
    strict: bool = False,
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + ``matched_<col>`` for each
    right value column (NULL when no right row is ≤ the left time).

    ``strict=True`` requires the right time to be strictly *before* the
    left time (a row never matches a same-timestamp right row — the
    self-join case where each side is the same table). Implemented by
    flipping the tie order: at equal time the left row sorts before the
    right rows, so its frame excludes them — same single window, no
    extra shuffle.

    ``tolerance_micros`` bounds staleness: a match older than the
    tolerance (left time − right time, in microseconds) becomes NULL —
    pd.merge_asof's ``tolerance`` semantics. The right row's own time
    rides inside the carried struct, so the bound is a post-projection
    on the window output; the plan is unchanged. Correct because the
    carried row is the *latest* eligible right row: any other is older
    still.
    """
    left_cols = left.columns
    rdt = dict(right.dtypes)
    rv_fields = [f"{c}:{rdt[c]}" for c in right_values]
    struct_cols = [F.col(c).alias(c) for c in right_values]
    if tolerance_micros is not None:
        rv_fields.append(f"__rt:{rdt[right_time]}")
        struct_cols.append(F.col(right_time).alias("__rt"))
    rv_type = "struct<" + ",".join(rv_fields) + ">"
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.col(tiebreaker).cast("long").alias("__tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        F.struct(*struct_cols).alias("__rv"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy("__k")
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_right").asc() if strict else F.col("__is_right").desc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__m")
    )
    if tolerance_micros is None:
        matched = [F.col(f"__m.{c}").alias(f"matched_{c}") for c in right_values]
    else:
        age = F.unix_micros(F.col("__t").cast("timestamp")) - F.unix_micros(
            F.col("__m.__rt").cast("timestamp")
        )
        matched = [
            F.when(age <= tolerance_micros, F.col(f"__m.{c}")).alias(f"matched_{c}")
            for c in right_values
        ]
    return carried.filter(F.col("__is_right") == 0).select(*left_cols, *matched)


def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event matched to the user's most recent order at event time."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        tiebreaker="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("matched_o_orderkey").alias("asof_orderkey"),
        F.col("matched_o_totalprice").alias("asof_totalprice"),
    )


ORACLE_ASOF = """
WITH u AS (
  SELECT user_id AS k, ts AS t, 0 AS is_right, event_id,
         NULL::BIGINT AS tb,
         NULL::STRUCT(orderkey BIGINT, totalprice DOUBLE) AS rv
  FROM events
  UNION ALL
  SELECT o_custkey, o_orderdate, 1, NULL,
         o_orderkey,
         {'orderkey': o_orderkey, 'totalprice': o_totalprice}
  FROM orders
), carried AS (
  SELECT event_id, k, is_right,
         last_value(rv IGNORE NULLS) OVER w AS m
  FROM u
  WINDOW w AS (PARTITION BY k
               ORDER BY t ASC, is_right DESC, tb ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, k AS user_id, m.orderkey AS asof_orderkey,
       m.totalprice AS asof_totalprice
FROM carried WHERE is_right = 0
"""


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tiebreaker: str,
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` + ``pd.merge_asof`` —
    the groupwise-pandas alternative to the window composition.

    Spark cogroups both sides by key and hands each key's pair of
    pandas frames to one Arrow batch; ``merge_asof`` does the
    per-group backward search. Tie semantics are aligned with
    :func:`asof_join` by sorting the right side so the highest
    ``tiebreaker`` row is the last one at each timestamp (merge_asof
    takes the last).

    Shape trade-off, recorded honestly: the window form shuffles once
    and streams; this form materializes each key group as a pandas
    frame — a hot key's whole history must fit in one task's memory,
    so at 100 TB prefer :func:`asof_join` and use this one when group
    sizes are known-bounded (it exists to pin the window operator
    against pandas' reference implementation, and as the idiomatic
    cogroup/applyInPandas example).
    """
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
    )
    rdt = dict(right.dtypes)
    out_schema = out_fields + ", " + ", ".join(
        f"matched_{c} {rdt[c]}" for c in right_values
    )
    left_cols = left.columns

    matched_cols = [f"matched_{c}" for c in right_values]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values([left_time])
        if rpdf.empty:
            for mc in matched_cols:
                lpdf[mc] = pd.Series([None] * len(lpdf), dtype="object")
            return lpdf[left_cols + matched_cols]
        # "__rt" sidesteps a left/right time-column name collision
        # (the self-as-of case); object dtype keeps unmatched rows as
        # None instead of NaN so Arrow can build integer columns
        rpdf = rpdf.sort_values([right_time, tiebreaker]).rename(
            columns={right_time: "__rt", **{c: f"matched_{c}" for c in right_values}}
        )
        merged = pd.merge_asof(
            lpdf,
            rpdf[["__rt"] + matched_cols],
            left_on=left_time,
            right_on="__rt",
            direction="backward",
        )
        for mc in matched_cols:
            col = merged[mc]
            merged[mc] = col.astype(object).where(col.notna(), None)
        return merged[left_cols + matched_cols]

    return (
        left.groupBy(left_key)
        .cogroup(right.groupBy(right_key))
        .applyInPandas(merge, out_schema)
    )


# Max staleness for the tolerance query: one day. Over the testdata's
# per-user prior-click gap distribution (p10 ≈ 5 h, p50 ≈ 35 h) this
# leaves roughly half the events matched and half NULLed — both
# outcomes live under the oracle.
ASOF_TOLERANCE_SECS = 86_400


def asof_prev_click_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event matched to the user's most recent *click* event
    strictly before it, but only if that click is at most one day old —
    the nearest-asof-with-tolerance shape (session attribution with a
    staleness bound). Strict self-as-of: an event never matches itself.
    """
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(
        left,
        right,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["click_id"],
        tiebreaker="click_id",
        strict=True,
        tolerance_micros=ASOF_TOLERANCE_SECS * 1_000_000,
    )
    return joined.select(
        "event_id", "user_id", F.col("matched_click_id").alias("prev_click_id")
    )


ORACLE_ASOF_TOLERANCE = f"""
WITH u AS (
  SELECT user_id AS k, ts AS t, 0 AS is_right, event_id,
         NULL::BIGINT AS tb,
         NULL::STRUCT(click_id BIGINT, rt TIMESTAMP) AS rv
  FROM events
  UNION ALL
  SELECT user_id, ts, 1, NULL,
         event_id,
         {{'click_id': event_id, 'rt': ts}}
  FROM events WHERE event_type = 'click'
), carried AS (
  SELECT event_id, k, t, is_right,
         last_value(rv IGNORE NULLS) OVER w AS m
  FROM u
  WINDOW w AS (PARTITION BY k
               ORDER BY t ASC, is_right ASC, tb ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, k AS user_id,
       CASE WHEN epoch_us(t) - epoch_us(m.rt) <= {ASOF_TOLERANCE_SECS * 1_000_000}
            THEN m.click_id END AS prev_click_id
FROM carried WHERE is_right = 0
"""


QUERIES: dict[str, tuple] = {
    "asof_latest_order": (asof_latest_order, ORACLE_ASOF),
    "asof_prev_click_tolerance": (asof_prev_click_tolerance, ORACLE_ASOF_TOLERANCE),
}
