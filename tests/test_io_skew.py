"""IO round-trips, salted-join equivalence, approximate-aggregate sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.operators.skew import salted_join
from cdc_cascade_spark.sources.io import read_table, write_delta, write_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path, fmt):
    df = load_table(spark, SF, "nation")
    path = str(tmp_path / fmt)
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=df.schema)
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in df.collect()
    )


def test_partitioned_write_prunes(spark, tmp_path):
    df = load_table(spark, SF, "customer")
    path = str(tmp_path / "part")
    write_table(df, path, partition_by=["c_mktsegment"])
    back = read_table(spark, path).filter(F.col("c_mktsegment") == "BUILDING")
    from cdc_cascade_spark.plans.explain import physical_plan

    # partition filter must prune at planning time, not post-scan
    assert "PartitionFilters: [isnotnull(c_mktsegment" in physical_plan(back)
    want = df.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert back.count() == want


def test_schema_inference_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), fmt="json")


def test_delta_stub(spark):
    df = load_table(spark, SF, "region")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        write_delta(df, "/tmp/never-written")


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"), cust, "c_custkey"
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert {(r.c_mktsegment, r["count"]) for r in plain.collect()} == {
        (r.c_mktsegment, r["count"]) for r in salted.collect()
    }


def test_approx_aggregates_near_exact(spark):
    """approx_count_distinct / percentile_approx: engine-specific
    sketches (no DuckDB oracle possible) — verified against exact
    values within documented error bounds instead."""
    orders = load_table(spark, SF, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5).alias("p50_approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05
    assert abs(row.p50_approx - row.p50_exact) / row.p50_exact < 0.05


def test_compact_table_merges_small_files(spark, tmp_path):
    """Many small appended files must compact to few target-sized files
    with byte-identical row content, and the source must survive via
    the temp-swap (no partial state on success)."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.sources.io import compact_table

    path = str(tmp_path / "t")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type"
    )
    # simulate 10 micro-batch appends -> >= 10 small files
    for i in range(10):
        ev.filter(F.col("event_id") % 10 == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    stats = compact_table(spark, path)
    assert stats["files_before"] >= 10
    assert stats["files_after"] == 1  # tiny table -> one target-size file
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before
    # transient siblings gone on success — and they are dot-prefixed so
    # a crash could never leave reader-visible debris either
    assert not (tmp_path / ".t._compact_tmp").exists()
    assert not (tmp_path / ".t._compact_bak").exists()
    assert not (tmp_path / "t._compact_tmp").exists()
    assert not (tmp_path / "t._compact_bak").exists()


def test_targeted_salted_join_equivalence_and_bounded_replication(spark):
    """salted_join_targeted: (a) output equals the plain join for a
    monitor-provided hot list; (b) hot keys' large-side rows really
    spread across multiple salts while cold keys stay on salt 0; (c)
    the small side is replicated ONLY for hot keys — the property that
    makes targeted salting cheaper than blanket salting at scale."""
    from pyspark.sql import functions as F

    from cdc_cascade_spark.operators.skew import salted_join_targeted

    orders = load_table(spark, SF, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    # "monitor output": the 5 highest-frequency customer keys
    hot = (
        orders.groupBy("c_custkey").count()
        .orderBy(F.desc("count"), F.asc("c_custkey")).limit(5)
        .select(F.col("c_custkey").alias("key"))
    )
    n_salts = 8

    plain = orders.join(cust, "c_custkey").groupBy("c_mktsegment").count()
    salted = (
        salted_join_targeted(orders, cust, "c_custkey", hot, n_salts=n_salts)
        .groupBy("c_mktsegment")
        .count()
    )
    assert {(r.c_mktsegment, r["count"]) for r in plain.collect()} == {
        (r.c_mktsegment, r["count"]) for r in salted.collect()
    }

    # replication bound: |small| + (n_salts - 1) * |hot ∩ small|
    hot_keys = {r.key for r in hot.collect()}
    hotb = F.broadcast(hot.select(F.col("key").alias("c_custkey")).distinct())
    replicated = (
        cust.join(hotb.withColumn("__hot", F.lit(1)), "c_custkey", "left")
        .withColumn(
            "__salts",
            F.when(
                F.col("__hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .select(F.explode("__salts"))
    )
    n_small = cust.count()
    n_hot_in_small = cust.filter(F.col("c_custkey").isin(hot_keys)).count()
    assert replicated.count() == n_small + (n_salts - 1) * n_hot_in_small
    assert n_hot_in_small > 0

    # salt spread: hot keys use >1 salt, cold keys only salt 0
    marked = orders.join(
        F.broadcast(hot.withColumnRenamed("key", "c_custkey")).withColumn(
            "__hot", F.lit(1)
        ),
        "c_custkey",
        "left",
    ).withColumn(
        "__salt",
        F.when(
            F.col("__hot").isNotNull(),
            F.pmod(F.xxhash64(*orders.columns), F.lit(n_salts)),
        ).otherwise(F.lit(0)),
    )
    spread = {
        r.c_custkey: r.n
        for r in marked.groupBy("c_custkey")
        .agg(F.countDistinct("__salt").alias("n"))
        .collect()
    }
    assert all(spread[k] > 1 for k in hot_keys)
    assert all(n == 1 for k, n in spread.items() if k not in hot_keys)


def test_targeted_salted_join_rejects_right_joins(spark):
    import pytest as _pytest

    from cdc_cascade_spark.operators.skew import salted_join_targeted

    orders = load_table(spark, SF, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    hot = cust.select(F.col("c_custkey").alias("key")).limit(1)
    with _pytest.raises(ValueError):
        salted_join_targeted(orders, cust, "c_custkey", hot, how="full")


def test_salted_joins_accept_spark_aliases(spark):
    """Spark treats 'leftsemi'/'left_semi'/'semi' as the same join —
    the guard must accept every safe alias and reject the right/full
    family in any spelling."""
    from cdc_cascade_spark.operators.skew import _check_join_type

    for ok in ("inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"):
        _check_join_type(ok, "salted_join")  # must not raise
    for bad in ("right", "rightouter", "right_outer", "full",
                "fullouter", "full_outer", "outer", "cross"):
        with pytest.raises(ValueError):
            _check_join_type(bad, "salted_join")


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session's AQE skew-join claim (session.py, SCALE.md,
    operators/skew.py docstring), demonstrated: a deliberately skewed
    sort-merge join gets its hot partition SPLIT at runtime — the
    final adaptive plan marks SortMergeJoin(skew=true) — and the
    result is identical to the un-assisted join. Thresholds are
    tightened locally because the defaults (256 MB) target real
    clusters; they are restored afterwards."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
    try:
        conf.set(keys[0], "64KB")
        conf.set(keys[1], "2")
        conf.set(keys[2], "16KB")
        conf.set(keys[3], "-1")  # force SMJ so skew handling is reachable
        big = spark.range(400_000).select(
            F.when(F.col("id") % 4 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-payload-payload-"), F.col("id")).alias("p"),
        )
        small = spark.range(5_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        agg = big.join(small, "k").select(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("p")).alias("s")
        )
        row = agg.collect()[0]
        final_plan = spark._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "formatted"
        )
        assert "skew=true" in final_plan, final_plan[:3000]
        # correctness unchanged by the split
        conf.set(keys[0], "256MB")  # effectively disable the split
        row_plain = (
            big.join(small, "k")
            .select(F.count(F.lit(1)).alias("n"), F.sum(F.length("p")).alias("s"))
            .collect()[0]
        )
        assert (row.n, row.s) == (row_plain.n, row_plain.s)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
