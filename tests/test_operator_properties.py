"""Property-based tests for the custom operators.

- asof_join vs a trivial per-row replay model (scan all right rows,
  keep the latest ≤ t with the highest tiebreaker) on arbitrary
  generated tables — the window implementation must agree everywhere,
  including NULL value columns and tied timestamps.
- guarded_block_candidates vs the plain blocked pair space: whenever no
  block exceeds the cap, the guard must be a no-op (identical pairs);
  with a hot block, its output must stay a subset of the block pairs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

# right rows: (key 0..2, time 0..5, tiebreaker 0..9, value or None)
right_row = st.tuples(
    st.integers(0, 2),
    st.integers(0, 5),
    st.integers(0, 9),
    st.one_of(st.none(), st.integers(0, 99)),
)
# left rows: (key 0..2, time 0..5)
left_row = st.tuples(st.integers(0, 2), st.integers(0, 5))


def _asof_model(left, right):
    """Replay model: latest right row (time, then tiebreaker) ≤ t."""
    out = {}
    for i, (k, t) in enumerate(left):
        best = None
        for rk, rt, tb, v in right:
            if rk == k and rt <= t:
                if best is None or (rt, tb) > (best[0], best[1]):
                    best = (rt, tb, v)
        out[i] = None if best is None else (best[1], best[2])
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(left_row, min_size=1, max_size=8, unique=True),
       st.lists(right_row, min_size=0, max_size=10, unique_by=lambda r: (r[0], r[1], r[2])))
def test_asof_join_matches_replay_model(spark, left, right):
    from cdc_cascade_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(
        right or [(None, None, None, None)], "k long, t long, tb long, v long"
    ).filter("k IS NOT NULL")
    got = {
        r.lid: (None if r.matched_tb is None else (r.matched_tb, r.matched_v))
        for r in asof_join(
            ldf, rdf, "k", "k", "t", "t", right_values=["tb", "v"], tiebreaker="tb"
        ).collect()
    }
    assert got == _asof_model(left, right)


# corpora: lists of (doc_id, block 0..3, 3 shingle hashes)
doc = st.tuples(
    st.integers(0, 49),
    st.integers(0, 3),
    st.lists(st.integers(1, 8), min_size=1, max_size=3, unique=True),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(doc, min_size=1, max_size=12, unique_by=lambda d: d[0]))
def test_guard_is_noop_below_cap_and_subset_above(spark, docs):
    from cdc_cascade_spark.llm.dedup import guarded_block_candidates

    df = spark.createDataFrame(
        [(i, b, h) for i, b, h in docs], "doc_id long, block int, hset array<long>"
    )
    got = {
        (r.doc_a, r.doc_b) for r in guarded_block_candidates(df, cap=4).collect()
    }
    blocked = {
        (a, b)
        for ia, ba, _ in docs
        for ib, bb, _ in docs
        if ba == bb and ia < ib
        for a, b in [(ia, ib)]
    }
    sizes = {}
    for _, b, _ in docs:
        sizes[b] = sizes.get(b, 0) + 1
    if all(n <= 4 for n in sizes.values()):
        assert got == blocked  # guard must be a pure no-op
    else:
        assert got <= blocked  # never invents cross-block pairs
        # identical docs in a hot block must still pair up
        by_hset = {}
        for i, b, h in docs:
            by_hset.setdefault((b, tuple(sorted(h))), []).append(i)
        for (b, _), ids in by_hset.items():
            if len(ids) > 1 and sizes[b] > 4:
                a, bb = sorted(ids)[:2]
                assert (a, bb) in got, f"identical docs {a},{bb} lost"


# intervals: (key 0..1, start hour 0..20, duration hours 1..30)
interval = st.tuples(st.integers(0, 1), st.integers(0, 20), st.integers(1, 30))
point = st.tuples(st.integers(0, 1), st.integers(0, 59))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(interval, min_size=1, max_size=6),
       st.lists(point, min_size=1, max_size=10))
def test_bucketed_range_join_matches_naive_model(spark, intervals, points):
    """Bucket binning must reproduce the naive start ≤ t < end join for
    arbitrary window spans (including spans ≫ the bucket width)."""
    import datetime

    from cdc_cascade_spark.operators.ranges import bucketed_range_join

    base = datetime.datetime(2024, 1, 1)
    h = datetime.timedelta(hours=1)
    ivals = [
        (i, k, base + s * h, base + (s + d) * h)
        for i, (k, s, d) in enumerate(intervals)
    ]
    evs = [(j, k, base + t * h) for j, (k, t) in enumerate(points)]
    idf = spark.createDataFrame(
        ivals, "iid long, ikey long, s timestamp, e timestamp"
    )
    edf = spark.createDataFrame(evs, "eid long, ekey long, t timestamp")
    got = {
        (r.iid, r.eid)
        for r in bucketed_range_join(edf, idf, "ekey", "ikey", "t", "s", "e").collect()
    }
    want = {
        (i, j)
        for i, k, s, e in ivals
        for j, ek, t in evs
        if ek == k and s <= t < e
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(interval, min_size=1, max_size=6),
       st.lists(interval, min_size=1, max_size=6))
def test_interval_overlap_join_matches_naive_model(spark, left, right):
    """First-shared-bucket binning must reproduce the naive
    s1 < e2 AND s2 < e1 join — each pair exactly once — for arbitrary
    spans (including spans ≫ the bucket width)."""
    import datetime

    from cdc_cascade_spark.operators.ranges import interval_overlap_join

    base = datetime.datetime(2024, 1, 1)
    h = datetime.timedelta(hours=1)
    li = [(i, k, base + s * h, base + (s + d) * h)
          for i, (k, s, d) in enumerate(left)]
    ri = [(j, k, base + s * h, base + (s + d) * h)
          for j, (k, s, d) in enumerate(right)]
    ldf = spark.createDataFrame(li, "lid long, lkey long, ls timestamp, le timestamp")
    rdf = spark.createDataFrame(ri, "rid long, rkey long, rs timestamp, re timestamp")
    rows = interval_overlap_join(
        ldf, rdf, "lkey", "rkey", "ls", "le", "rs", "re", bucket_unit="hour"
    ).collect()
    got = [(r.lid, r.rid) for r in rows]
    assert len(got) == len(set(got)), "pair emitted more than once"
    want = {
        (i, j)
        for i, lk, s1, e1 in li
        for j, rk, s2, e2 in ri
        if lk == rk and s1 < e2 and s2 < e1
    }
    assert set(got) == want


def test_bounded_df_cache_evicts_and_unpersists(spark):
    """The shared feature-frame cache must stay bounded and unpersist
    what it evicts (three operator families rely on it)."""
    from cdc_cascade_spark.functions.caching import BoundedDFCache

    cache = BoundedDFCache(max_entries=2)
    frames = {}
    sizes = {"a": 5, "a2": 5, "b": 6, "c": 7, "a3": 5}

    def build(tag):
        # distinct row counts → distinct canonicalized plans: Spark's
        # CacheManager keys on the plan, so identical plans would share
        # one cache entry and confound the eviction assertions
        df = spark.range(sizes[tag])
        frames[tag] = df
        return df

    a = cache.get_or_build(spark, "a", lambda: build("a"))
    assert cache.get_or_build(spark, "a", lambda: build("a2")) is a  # hit
    cache.get_or_build(spark, "b", lambda: build("b"))
    assert a.storageLevel.useMemory
    cache.get_or_build(spark, "c", lambda: build("c"))  # evicts "a"
    assert not frames["a"].storageLevel.useMemory  # unpersisted
    assert frames["b"].storageLevel.useMemory
    # a rebuild after eviction is a fresh frame, not the stale one
    a2 = cache.get_or_build(spark, "a", lambda: build("a3"))
    assert a2 is not a


def test_bounded_df_cache_concurrent_build_single_winner(spark):
    """Two threads racing a cold key must agree on ONE cached frame and
    the losing build must be unpersisted, not leaked (ADVICE r3)."""
    import threading

    from cdc_cascade_spark.functions.caching import BoundedDFCache

    cache = BoundedDFCache(max_entries=2)
    built, results = [], []
    gate = threading.Barrier(2)

    def make_build(n):
        # distinct row counts → distinct canonicalized plans: Spark's
        # CacheManager keys on the plan, so identical plans would share
        # ONE cache entry and the loser's unpersist would clear the
        # winner's too
        def build():
            df = spark.range(n)
            built.append(df)
            return df

        return build

    def worker(n):
        gate.wait()
        results.append(cache.get_or_build(spark, "k", make_build(n)))

    threads = [threading.Thread(target=worker, args=(100 + i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(results) == 2
    assert results[0] is results[1], "both callers must get the same frame"
    winner = results[0]
    assert winner.storageLevel.useMemory
    for df in built:
        if df is not winner:
            assert not df.storageLevel.useMemory, "losing build leaked a persisted frame"


# ---------------------------------------------------------------------------
# Sequence packing: tiling invariant over arbitrary corpora
# ---------------------------------------------------------------------------

doc_text = st.text(alphabet="ab ", min_size=0, max_size=40)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(doc_text, min_size=1, max_size=12))
def test_pack_sequences_tiles_any_corpus(spark, texts):
    """For arbitrary (including empty / whitespace-heavy) documents the
    packed stream must tile gaplessly per shard and chunk spans must be
    consistent with the offsets — the same invariant the sf-data test
    checks, under adversarial token counts."""
    import re

    from pyspark.sql import functions as F, Window as W
    from cdc_cascade_spark.llm.packing import PACK_BUDGET, PACK_SHARDS
    from cdc_cascade_spark.llm.prep import tokens

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # inline the operator body over the synthetic frame (pack_sequences
    # loads from a sf_dir; the plan under test is identical)
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    rows = (
        d.withColumn(
            "start_offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint")),
        )
        .collect()
    )
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in shard_rows:
            assert r.start_offset == off
            assert r.n_tokens == len(re.split(r"\s+", texts[r.doc_id]))
            off += r.n_tokens


def test_contamination_df_cap_kills_hot_shingle(spark):
    """A shingle present in EVERY document (boilerplate) must be
    removed by the df-cap before the index join: docs that share ONLY
    boilerplate must produce no contamination pair, while a genuine
    containment pair must survive."""
    from pyspark.sql import functions as F

    from cdc_cascade_spark.llm.curation import (
        CONTAM_BENCH_MOD,
        CONTAM_MIN_CONTAINMENT,
    )
    from cdc_cascade_spark.llm.prep import shingle_hash_set, tokens

    # 200 docs all opening with the same boilerplate sentence, then a
    # unique tail; doc 0 (bench: 0 % 7 == 0) is fully contained in doc
    # 1 (train). Docs 7k share only boilerplate with everything else.
    boiler = "terms of service apply to this document"
    rows = [(0, boiler + " alpha beta gamma delta"),
            (1, boiler + " alpha beta gamma delta epsilon zeta " +
             " ".join(f"t{j}" for j in range(10)))]
    rows += [(i, boiler + f" unique{i} tail{i} x{i} y{i}") for i in range(2, 200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = tokens(F.col("text"))
    prepared = docs.select("doc_id", shingle_hash_set(toks).alias("hset"))

    # replicate contamination_check's plan over the synthetic frame
    cap = max(5, min(1000, 200 // 20))
    exploded = prepared.select("doc_id", F.explode("hset").alias("h"))
    hot = (
        exploded.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cap).select("h")
    )
    rare = exploded.join(F.broadcast(hot), "h", "left_anti")
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == 0
    bench = rare.filter(is_bench)
    train = rare.filter(~is_bench)
    bsz = bench.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        bench.select(F.col("doc_id").alias("bench_doc"), "h")
        .join(train.select(F.col("doc_id").alias("train_doc"), "h"), "h")
        .groupBy("bench_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(bsz.withColumnRenamed("doc_id", "bench_doc"), "bench_doc")
        .withColumn("containment",
                    F.col("n_common").cast("double") / F.col("sz").cast("double"))
        .filter(F.col("containment") >= CONTAM_MIN_CONTAINMENT)
        .collect()
    )
    found = {(r.bench_doc, r.train_doc) for r in pairs}
    assert (0, 1) in found, "genuine containment must survive the cap"
    # boilerplate-only overlaps: no pair involving the unique-tail docs
    assert all(p == (0, 1) for p in found), f"boilerplate-only pairs leaked: {found - {(0,1)}}"


# ---------------------------------------------------------------------------
# Funnel conversion: strictly-after semantics vs a replay model
# ---------------------------------------------------------------------------

event_row = st.tuples(
    st.integers(0, 3),              # user
    st.integers(0, 20),             # ts (as int seconds)
    st.sampled_from(["view", "click", "purchase", "error"]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event_row, min_size=1, max_size=20,
                unique_by=lambda e: (e[0], e[1])))
def test_funnel_matches_replay_model(spark, events):
    """The chained-aggregate funnel must agree with a trivial per-user
    replay (first view, first click strictly after it, first purchase
    strictly after that) on arbitrary event sets — including users
    with purchases BEFORE their first view (must not convert)."""
    import datetime

    from pyspark.sql import functions as F, Window as W

    base = datetime.datetime(2024, 1, 1)
    rows = [(u, base + datetime.timedelta(seconds=t), et) for u, t, et in events]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    # replay model
    expected = {"1_view": set(), "2_click": set(), "3_purchase": set()}
    by_user: dict[int, list] = {}
    for u, t, et in events:
        by_user.setdefault(u, []).append((t, et))
    for u, evs in by_user.items():
        evs.sort()
        t1 = min((t for t, et in evs if et == "view"), default=None)
        if t1 is None:
            continue
        expected["1_view"].add(u)
        t2 = min((t for t, et in evs if et == "click" and t > t1), default=None)
        if t2 is None:
            continue
        expected["2_click"].add(u)
        t3 = min((t for t, et in evs if et == "purchase" and t > t2), default=None)
        if t3 is not None:
            expected["3_purchase"].add(u)

    # the operator body over the synthetic frame (funnel_conversion
    # itself loads from sf_dir; the plan under test is identical)
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id").filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id").filter(F.col("ts") > F.col("t2"))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    got = {
        "1_view": {r.user_id for r in v.collect()},
        "2_click": {r.user_id for r in c.collect()},
        "3_purchase": {r.user_id for r in p.collect()},
    }
    assert got == expected


def test_gap_fill_dense_spine_and_locf(spark):
    """Every event type covers the full global hour span; gap hours have
    n_events=0 and carry the previous observed value forward."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.operators.timeseries import events_gap_fill
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = events_gap_fill(spark, sf).collect()
    ev = load_table(spark, sf, "events")
    b = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("h0"),
        F.max(F.date_trunc("hour", "ts")).alias("h1"),
    ).collect()[0]
    span = int((b.h1 - b.h0).total_seconds() // 3600) + 1
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert all(len(v) == span for v in by_type.values()), {
        k: len(v) for k, v in by_type.items()
    }
    found_gap = False
    for series in by_type.values():
        series.sort(key=lambda r: r.hour)
        assert series[0].hour == b.h0 and series[-1].hour == b.h1
        prev = None
        for r in series:
            if r.n_events == 0:
                found_gap = True
                # locf: gap hours repeat the previous filled value
                assert r.filled_value == prev or (
                    r.filled_value is None and prev is None
                )
            prev = r.filled_value
    assert found_gap, "expected at least one gap hour at sf0.001"


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """est is always a multiple of 1/16 and stays within 5 sigma of the
    exact Jaccard on this fixed corpus (sigma = sqrt(J(1-J)/16))."""
    from cdc_cascade_spark.llm.dedup import minhash_jaccard_estimate

    rows = minhash_jaccard_estimate(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert abs(r.est_jaccard * 16 - round(r.est_jaccard * 16)) < 1e-12
        j = r.exact_jaccard
        sigma = (j * (1 - j) / 16) ** 0.5
        assert abs(r.est_jaccard - j) <= max(5 * sigma, 1.0 / 16 + 1e-12), (
            r.doc_a, r.doc_b, r.est_jaccard, j)


def test_every_query_survives_empty_corpus(spark, tmp_path):
    """An empty partition (no events today, empty shard, fresh table) is
    a normal pipeline state: every registered query must return an
    EMPTY (or degenerate-aggregate) frame on zero-row inputs, never
    crash. (bpe_apply_top_merge formerly raised here by documented
    exception; it now returns the empty pair table — which is what its
    DuckDB oracle produces on an empty corpus, so the empty behavior
    is oracle-consistent too.)"""
    from cdc_cascade_spark.catalog import TABLES, load_table
    from cdc_cascade_spark.registry import queries

    empty_dir = str(tmp_path / "sf_empty")
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(f"{empty_dir}/{t}.parquet")

    failures = {}
    for name, fn in sorted(queries().items()):
        try:
            rows = fn(spark, empty_dir).collect()
        except Exception as exc:  # noqa: BLE001 — collecting a report
            failures[name] = repr(exc)[:120]
            continue
        # aggregates may legitimately emit a single degenerate row
        # (e.g. global count 0); anything larger is suspicious
        if len(rows) > 10:
            failures[name] = f"returned {len(rows)} rows from empty corpus"
    assert not failures, failures


def test_segmented_locf_equals_single_window_gap_fill(spark):
    """The two-phase (per-day segments + carry-in join) locf must be
    row-identical to the single-window form — the claim that lets the
    100 TB deployment swap it in without semantic drift."""
    from cdc_cascade_spark.operators.timeseries import (
        events_gap_fill,
        events_gap_fill_segmented,
    )

    sf = "/root/testdata/sf0.001"
    a = {(r.event_type, r.hour): (r.n_events, r.filled_value)
         for r in events_gap_fill(spark, sf).collect()}
    b = {(r.event_type, r.hour): (r.n_events, r.filled_value)
         for r in events_gap_fill_segmented(spark, sf).collect()}
    assert a == b
    # and the segmented plan's locf windows are day-bounded
    from cdc_cascade_spark.plans.explain import physical_plan

    plan = physical_plan(events_gap_fill_segmented(spark, sf))
    assert "windowspecdefinition(event_type" in plan


def test_histogram_quantile_within_one_bucket_of_exact(spark):
    """The scalable histogram quantile must land within BUCKET_WIDTH of
    the exact percentile — the accuracy contract that justifies using
    it where exact percentiles can't scale."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.operators.quantiles import (
        BUCKET_WIDTH,
        quantile_histogram,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    est = {r.o_orderstatus: (r.est_p50, r.est_p90)
           for r in quantile_histogram(spark, sf).collect()}
    exact = {
        r.o_orderstatus: (r.p50, r.p90)
        for r in load_table(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in est:
        assert abs(est[k][0] - exact[k][0]) <= BUCKET_WIDTH, (k, est[k], exact[k])
        assert abs(est[k][1] - exact[k][1]) <= BUCKET_WIDTH, (k, est[k], exact[k])
