"""Plan-shape assertions: the scale properties each operator claims.

These protect the 100 TB contract — pushdown, column pruning,
broadcast joins, shuffle counts — from silent regressions.
"""

from __future__ import annotations

from cdc_cascade_spark.operators.relational import (
    q01_pricing_summary,
    q02_topk_orders,
    q03_supplier_volume,
    q04_forecast_revenue,
    q08_topk_customers_per_segment,
)
from cdc_cascade_spark.plans.explain import (
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    scan_read_schema,
    shuffle_count,
)

SF = "/root/testdata/sf0.001"


def test_q01_filter_pushdown_and_pruning(spark):
    df = q01_pricing_summary(spark, SF)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    # 7 of 11 lineitem columns needed — scan must not read the rest
    (schema,) = scan_read_schema(df)
    assert "l_orderkey" not in schema and "l_partkey" not in schema, schema


def test_q04_all_predicates_pushed(spark):
    df = q04_forecast_revenue(spark, SF)
    pushed = " ".join(pushed_filters(df))
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, (c, pushed)


def test_q02_customer_broadcasts(spark):
    df = q02_topk_orders(spark, SF)
    assert has_broadcast_join(df)
    # top-k must be TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_q03_dims_broadcast_single_fact_shuffle(spark):
    df = q03_supplier_volume(spark, SF)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]


def test_q08_rank_pushdown(spark):
    """row_number ≤ k must trigger WindowGroupLimit (per-partition top-k
    before the full sort) — the property that keeps per-key state
    bounded at scale."""
    df = q08_topk_customers_per_segment(spark, SF)
    assert "WindowGroupLimit" in physical_plan(df)


def test_broadcast_threshold_is_set(spark):
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "64m"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_asof_join_single_shuffle(spark):
    """The as-of join must be one exchange on the key (union-sort-window),
    not a range-join explosion."""
    from cdc_cascade_spark.operators.asof import asof_latest_order

    df = asof_latest_order(spark, SF)
    assert shuffle_count(df) == 1, physical_plan(df)[:1500]


def test_minhash_partial_aggregation(spark):
    """MinHash signature minima must partial-aggregate map-side
    (two HashAggregate levels around the exchange)."""
    from cdc_cascade_spark.llm.dedup import dedup_minhash_lsh

    plan = physical_plan(dedup_minhash_lsh(spark, SF))
    assert "partial_min" in plan or plan.count("HashAggregate") >= 2, plan[:1500]


def test_q09_windows_see_only_preaggregated_input(spark):
    """q09's unpartitioned windows are safe ONLY because their input is
    pre-aggregated to one row per month. Pin both halves of that claim
    so a refactor can't silently un-shrink the window input:
    (a) plan order — every Window sits above the month Aggregate;
    (b) cardinality — the window input is |months|, orders-of-magnitude
        below |orders|."""
    from cdc_cascade_spark.operators.relational import q09_monthly_revenue_window

    df = q09_monthly_revenue_window(spark, SF)
    plan = physical_plan(df)
    # (a) the windows consume the aggregate's output: in the root-first
    # plan text every Window line precedes the HashAggregate feeding it
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.rfind("Window (")
    assert 0 <= win_pos < agg_pos, plan[:2000]
    # (b) the aggregate output (window input) is tiny vs the fact table
    from cdc_cascade_spark.catalog import load_table
    from pyspark.sql import functions as F

    months = df.count()
    orders = load_table(spark, SF, "orders").count()
    assert months <= 120, months          # ~80 months of TPC-H dates
    # bounded by the calendar, not the data: the ratio only grows with SF
    assert months * 10 < orders, (months, orders)


def test_int8_pool_cut_is_window_group_limit(spark):
    """ann_int8_topk's candidate-pool cut must plan as a bounded
    top-k (TakeOrderedAndProject / WindowGroupLimit partial pruning) —
    NOT a rangepartitioning exchange, which would shuffle every scored
    row to sort it. The rank-filter form is what keeps the quantized
    scan stage map-bounded at 100 TB."""
    from cdc_cascade_spark.llm.vectorops import ann_int8_topk

    plan = physical_plan(ann_int8_topk(spark, SF))
    assert "rangepartitioning" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, (
        plan[:2000]
    )


def test_plan_lint_all_registered_queries(spark):
    """Plan lint over the whole registry: no accidental cartesian
    products, no single-partition window shuffles, no nested-loop
    joins — except the explicitly whitelisted, by-design cases. A new
    query that trips a flag must either fix its plan or justify a
    whitelist entry here."""
    import sys

    sys.path.insert(0, "/root/repo")
    from cdc_cascade_spark.registry import queries

    WHITELIST = {
        # 1-row query vector broadcast: BroadcastNestedLoopJoin over a
        # single-row build side IS the intended map-side shape.
        "ann_cosine_topk": {"bnlj"},
        "ann_ivf_topk": {"bnlj"},
        "ann_ivf_kmeans_topk": {"bnlj"},
        "ann_lsh_topk": {"bnlj"},
        "ann_lsh_multiprobe_topk": {"bnlj"},
        "ann_lsh_multitable_topk": {"bnlj"},
        # 1-row query broadcast twice: once for the int8 candidate
        # scan, once for the POOL-row exact rerank
        "ann_int8_topk": {"bnlj"},
        # inherits quality_floor_filter's 1-row threshold broadcast
        # (the composed pipelines contain that stage verbatim)
        "curate_corpus": {"bnlj"},
        "curate_corpus_segmented": {"bnlj"},
        "curation_audit": {"bnlj"},
        "curation_audit_segmented": {"bnlj"},
        # same stage, same 1-row threshold broadcast — the incremental
        # engine re-runs the quality-floor election over its state
        "curate_corpus_incremental": {"bnlj"},
        # composes both kept-set derivations, each carrying that same
        # 1-row threshold broadcast
        "curation_invalidation_report": {"bnlj"},
        # 1-row corpus-count frame broadcast into the idf-tier weight
        "dedup_simhash_weighted": {"bnlj"},
        # 1-row quality-threshold frame (TakeOrderedAndProject result)
        # broadcast into the keep-filter
        "quality_floor_filter": {"bnlj"},
        # N_QUERIES-row (5) query-set broadcast: every candidate scores
        # against every query map-side — the batch-kNN shape
        "knn_join_topk": {"bnlj"},
        # 1-row total-token-count frame broadcast into the lift formula
        "bigram_lift": {"bnlj"},
        # 1-row (N, Σdl) corpus-stats frame broadcast into the BM25
        # weight (the bigram_lift shape); every corpus-sized join in
        # the plan is a BroadcastHashJoin (pinned in test_bm25)
        "bm25_topk": {"bnlj"},
        # inherits bm25_topk's stats broadcast verbatim (sparse side)
        "hybrid_retrieval_rrf": {"bnlj"},
        # 1-row query-vector broadcast over the partition-pruned bucket
        # scan (the ann_cosine_topk shape on the persistent layout)
        "ann_lsh_indexed": {"bnlj"},
        # same shape over the trained-IVF cell layout: the 1-row query
        # frame (itself a partition-pruned 1-directory lookup) is
        # broadcast into the nprobe-pruned rerank scan
        "ann_ivf_indexed": {"bnlj"},
        # the two persistent-index probes each broadcast their 1-row
        # summed-stats frame into the shared BM25 weight (the bm25_topk
        # shape); every corpus/index-sized join is a BroadcastHashJoin
        # over the partition-pruned postings scan (pinned in
        # test_bm25_index / test_chunk_index)
        "retrieval_mrr_indexed": {"bnlj"},
        # composes three list plans that each carry exactly that
        # 1-row-stats-broadcast shape: sparse (bm25_topk verbatim),
        # chunked (the chunk_retrieval_eval chunk side), and the
        # fused list built over the checkpointed sparse/dense frames;
        # every corpus-sized join underneath is a BroadcastHashJoin
        # (pinned in the constituent modules' plan tests)
        "retrieval_mrr_summary": {"bnlj"},
        # both retrieval sides carry the 1-row stats broadcast: the
        # whole-doc side embeds bm25_topk verbatim, the chunk side
        # broadcasts its own 1-row (n_units, Σ chunk length) frame
        # into the chunk weight (plan pinned in test_chunkeval)
        "chunk_retrieval_eval": {"bnlj"},
        # 1-row n_sources frame broadcast into the per-source quota
        # arithmetic (plan is source-cardinality-sized; the sample
        # inherits the plan subtree verbatim)
        "corpus_mixture_plan": {"bnlj"},
        "corpus_mixture_sample": {"bnlj"},
        # 1-row Σ w_micro frame broadcast into the per-stratum quota
        # arithmetic (the corpus_mixture_plan shape)
        "temperature_mixture_sample": {"bnlj"},
        # 1-row × 1-row cross of (sample count, materialized-pair
        # count) for the zero-shared-shingle pair arithmetic (the
        # bigram_lift shape)
        "minhash_banding_curve": {"bnlj"},
        # Q-row query-sample broadcast for the exact ground-truth scan
        # — recall eval is all-pairs against the sample BY DESIGN (the
        # knn_join_topk shape); the bucketed approx side hash-joins
        "ann_recall_report": {"bnlj"},
        # 1-row totals / per-side stats frames broadcast into each
        # metric's single division (the bigram_lift shape, x3)
        "corpus_drift_report": {"bnlj"},
        # 1-row global (min,max) bounds frame broadcast into the dense
        # spine generator
        "events_gap_fill": {"bnlj"},
        # contains events_gap_fill's spine generator verbatim (the
        # segmented locf re-fills the same dense series)
        "events_gap_fill_segmented": {"bnlj"},
        # pairwise sketch join on type_a < type_b: |groups| one-row
        # sketches of K longs each — the build side is kilobytes by
        # construction (that is the point of sketch algebra)
        "sketch_kmv_setops": {"bnlj"},
        # global windows over the ~80-row month aggregate; safety pinned
        # by test_q09_windows_see_only_preaggregated_input.
        "q09_monthly_revenue_window": {"single-part-window"},
        # the decile map's cumulative window runs over the per-VALUE
        # aggregate (≤ |distinct q_milli| rows, never the corpus — the
        # quantile_histogram shape); the 1-row corpus-count frame
        # broadcasts into the decile arithmetic (bigram_lift shape),
        # and the composed curate_corpus kept-set carries its 1-row
        # threshold broadcast
        "quality_calibration_report": {"single-part-window", "bnlj"},
    }
    bad = {}
    for name, fn in sorted(queries().items()):
        plan = physical_plan(fn(spark, SF))
        flags = set()
        if "CartesianProduct" in plan:
            flags.add("cartesian")
        if "BroadcastNestedLoopJoin" in plan:
            flags.add("bnlj")
        if "Exchange SinglePartition" in plan and "Window" in plan:
            flags.add("single-part-window")
        flags -= WHITELIST.get(name, set())
        if flags:
            bad[name] = sorted(flags)
    assert not bad, f"un-whitelisted plan hazards: {bad}"


def test_check_first_queries_lead_the_registry():
    """The driver verifies only the first ~50 registry entries; every
    query that still needs a green CORRECTNESS row must sit inside that
    window. CHECK_FIRST pins them to the very front."""
    from cdc_cascade_spark.registry import CHECK_FIRST, all_queries

    names = list(all_queries())
    assert names[: len(CHECK_FIRST)] == CHECK_FIRST
    assert len(CHECK_FIRST) <= 50
    # every CHECK_FIRST entry must have an oracle (the whole point is a
    # full rows+schema+hash row, not the weaker rows-only check)
    for name in CHECK_FIRST:
        assert all_queries()[name][1] is not None, name


def test_map_only_doc_queries_prune_to_id_and_text(spark):
    """The r4 scan-project operators must read ONLY (doc_id, text) from
    the documents parquet — lang/source/n_chars never reach the scan."""
    import re

    from cdc_cascade_spark.llm.curation import pii_redaction
    from cdc_cascade_spark.llm.packing import doc_chunks, pack_sequences

    for fn in (pii_redaction, doc_chunks, pack_sequences):
        plan = physical_plan(fn(spark, SF))
        schemas = re.findall(r"ReadSchema: (\S+)", plan)
        assert schemas, plan[:500]
        for s in schemas:
            assert s == "struct<doc_id:bigint,text:string>", (fn.__name__, s)


def test_knn_join_rank_pushdown_and_broadcast(spark):
    """The batch k-NN join must keep per-query state bounded
    (WindowGroupLimit on the rnk filter) and ship the query set as a
    broadcast, never shuffling the candidate side by query_id before
    the top-k cut."""
    from cdc_cascade_spark.llm.vectorops import knn_join_topk

    plan = physical_plan(knn_join_topk(spark, SF))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_gap_fill_window_partitions_by_type(spark):
    """The locf window must partition by event_type (bounded span-hours
    partitions), never collapse to a single partition."""
    from cdc_cascade_spark.operators.timeseries import events_gap_fill

    plan = physical_plan(events_gap_fill(spark, SF))
    assert "Window" in plan, plan[:1500]
    # the formatted explain carries the window spec in a detail line:
    # partition key must be event_type
    assert "windowspecdefinition(event_type" in plan, plan[:2500]


def test_minhash_estimate_reads_cached_signature_frame(spark):
    """minhash_jaccard_estimate must consume the session-shared
    signature relation (InMemoryTableScan), not re-derive the explode +
    16-minima aggregation from raw documents."""
    from cdc_cascade_spark.llm.dedup import (
        minhash_jaccard_estimate,
        minhash_sigs_cached,
    )

    minhash_sigs_cached(spark, SF).count()  # warm, as the bench does
    plan = physical_plan(minhash_jaccard_estimate(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:1500]


def test_single_corpus_scan_after_snapshot_boundaries(spark):
    """The r8 scan-elimination contract: queries whose shared subtree
    feeds multiple consumers must scan their base table at most once —
    the snapshot at the corpus-scan boundary is what makes the plan
    survive 100 TB (each extra scan re-reads and re-hashes the
    corpus). Counts the executed plan's parquet scans per table."""
    from cdc_cascade_spark.llm.segdedup import segment_dedup
    from cdc_cascade_spark.llm.sources import source_reputation
    from cdc_cascade_spark.operators.anomaly import events_rate_anomaly
    from cdc_cascade_spark.operators.cms import sketch_cms_heavy_hitters

    bounds = [
        # (query, table, max scans of that table in the executed plan)
        (sketch_cms_heavy_hitters, "documents", 1),
        (events_rate_anomaly, "events", 0),  # both reads hit the snapshot
        (segment_dedup, "documents", 1),
        # rules need one text scan, the norm-key snapshot the other
        (source_reputation, "documents", 2),
    ]
    for fn, table, cap in bounds:
        plan = physical_plan(fn(spark, SF))
        n = plan.count(f"{table}.parquet")
        assert n <= cap, (fn.__name__, table, n, cap)
