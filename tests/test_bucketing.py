"""Bucketing: the fact⋈fact shuffle eliminator (SCALE.md).

Writing both join sides bucketed on the join key (same bucket count)
lets the sort-merge join read co-located buckets with NO exchange —
the storage-level answer to the one remaining big shuffle at 100 TB.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.plans.explain import physical_plan

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_li = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    load_table(spark, SF, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable(t_orders)
    load_table(spark, SF, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable(t_li)
    # disable broadcast so the join takes the sort-merge path it would
    # at fact⋈fact scale (where neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(t_orders)
        li = spark.table(t_li)
        joined = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # bucketed SMJ: no Exchange under the join (the final 1-group
        # agg may still exchange; assert the join inputs don't)
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan, plan[:1500]
        join_pos = plan.find("SortMergeJoin")
        scan_section = plan[join_pos:]
        n_rows = joined.collect()
        want = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .count()
            .collect()
        )
        assert {(r.o_orderstatus, r.n) for r in n_rows} == {
            (r.o_orderstatus, r["count"]) for r in want
        }
        # exactly one shuffle total (the groupBy); zero for the join —
        # asserted on the pre-execution plan (post-collect, AQE's final
        # plan string renders stages differently)
        import re

        assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


def test_supervisor_restarts_then_succeeds():
    from cdc_cascade_spark.streaming.pipeline import run_supervised

    calls = {"n": 0}

    class FakeQuery:
        def __init__(self, fail: bool) -> None:
            self._fail = fail

        def awaitTermination(self):
            if self._fail:
                raise RuntimeError("stream crashed")

    def start():
        calls["n"] += 1
        return FakeQuery(fail=calls["n"] == 1)

    import time as _time

    orig = _time.sleep
    _time.sleep = lambda s: None  # no 5 s wait in tests
    try:
        run_supervised(start, max_restarts=2)
    finally:
        _time.sleep = orig
    assert calls["n"] == 2
