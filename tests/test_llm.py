"""Semantic tests for the LLM-data-pipeline operators (beyond oracle
parity, which tests/test_relational_parity.py covers for every
registered query): recall of known near-dup pairs, agreement between
dedup strategies, LSH-vs-brute-force containment, and the multimodal
stub contract.
"""

from __future__ import annotations

import pytest

from cdc_cascade_spark.llm.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from cdc_cascade_spark.llm.multimodal import (
    decode_media,
    extract_features,
    multimodal_features,
    with_media_columns,
)
from cdc_cascade_spark.llm.similarity import ann_cosine_topk, ann_lsh_topk

SF = "/root/testdata/sf0.001"


def test_minhash_finds_blocked_jaccard_pairs(spark):
    """LSH candidates must recover (at least) every pair the blocked
    exact-Jaccard pass finds — at these parameters (4 bands × 4 rows,
    jac ≥ 0.8) candidate probability is ≥ 0.96."""
    exact = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, SF).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF).collect()}
    assert exact, "expected injected near-dup pairs in testdata"
    assert exact <= lsh


def test_simhash_close_for_near_dups(spark):
    """Near-dup docs must land on nearby simhashes (hamming ≤ 8 of 32);
    random doc pairs must not be that close on average."""
    pairs = [(r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, SF).collect()]
    hashes = {r.doc_id: r.simhash for r in dedup_simhash(spark, SF).collect()}
    for a, b in pairs:
        ham = bin(hashes[a] ^ hashes[b]).count("1")
        assert ham <= 8, f"near-dup pair ({a},{b}) hamming={ham}"


def test_lsh_topk_is_subset_of_bruteforce_ranking(spark):
    """LSH results are a (bucket-restricted) subset of the exact scores:
    every LSH hit's cosine must equal the brute-force cosine."""
    brute = {r.vec_id: r.cosine for r in
             ann_cosine_topk(spark, SF).collect()}
    # brute only has top-10; recompute full scores for the check
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.similarity import _cosine
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    qid = emb.agg(F.min("vec_id").alias("qid"))
    q = emb.join(F.broadcast(qid), emb.vec_id == F.col("qid")).select(
        F.col("embedding").alias("qvec")
    )
    full = {
        r.vec_id: r.cosine
        for r in emb.crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(F.col("embedding"), F.col("qvec")).alias("cosine"))
        .collect()
    }
    for r in ann_lsh_topk(spark, SF).collect():
        assert full[r.vec_id] == pytest.approx(r.cosine, abs=1e-12)


def test_multimodal_stub_contract(spark):
    """decode_media must be a clearly-marked stub; the fake=False path
    must surface it through mapInPandas."""
    with pytest.raises(NotImplementedError):
        decode_media("png", b"\x89PNG")

    media = with_media_columns(
        spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    )
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(media, fake=False).collect()


def test_multimodal_features_deterministic(spark):
    a = {r.doc_id: r.f0 for r in multimodal_features(spark, SF).collect()}
    b = {r.doc_id: r.f0 for r in multimodal_features(spark, SF).collect()}
    assert a == b
    assert all(0.0 <= v < 1.0 for v in a.values())


def test_guarded_candidates_bound_hot_blocks(spark):
    """A hot block (many docs sharing a first shingle) must NOT produce
    a quadratic pair count; true near-dups inside it must still pair."""
    from pyspark.sql import functions as F

    from cdc_cascade_spark.llm.dedup import BLOCK_CAP, guarded_block_candidates
    from cdc_cascade_spark.llm.prep import first_shingle, shingle_hash_set, tokens

    n_hot = 4 * BLOCK_CAP
    rows = [
        # hot block: shared 3-token opening, distinct tails
        (i, "the quick fox " + " ".join(f"w{i}x{j}" for j in range(20)))
        for i in range(n_hot)
    ]
    # two true near-dups inside the hot block (identical text)
    rows.append((9001, rows[0][1]))
    # a small block: three docs sharing a different opening
    rows += [(9100 + i, f"tiny block opener tail{i}") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = tokens(F.col("text"))
    prepared = docs.select(
        "doc_id",
        shingle_hash_set(toks).alias("hset"),
        first_shingle(toks).alias("block"),
    )
    cand = guarded_block_candidates(prepared).collect()
    pairs = {(r.doc_a, r.doc_b) for r in cand}
    quadratic = n_hot * (n_hot + 1) // 2
    # hot block went through the band join: far fewer than all-pairs
    assert len(pairs) < quadratic / 4, f"{len(pairs)} pairs ~ quadratic"
    # the identical pair survives (same minhash signature -> same bands)
    assert (0, 9001) in pairs
    # the small block still self-joins exactly: all 3 pairs present
    assert {(9100, 9101), (9100, 9102), (9101, 9102)} <= pairs


def test_ivf_topk_probes_subset_with_exact_scores(spark):
    """IVF results come only from the probed centroid cells, and every
    hit's cosine equals the exact brute-force score for that vector."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.similarity import (
        IVF_NPROBE,
        _cosine,
        ann_ivf_topk,
    )
    from pyspark.sql import functions as F

    rows = ann_ivf_topk(spark, SF).collect()
    assert rows, "IVF probe returned nothing"
    assert len({r.centroid for r in rows}) <= IVF_NPROBE

    emb = load_table(spark, SF, "embeddings")
    qid = emb.agg(F.min("vec_id").alias("qid"))
    q = emb.join(F.broadcast(qid), emb.vec_id == F.col("qid")).select(
        F.col("embedding").alias("qvec")
    )
    full = {
        r.vec_id: r.cosine
        for r in emb.crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(F.col("embedding"), F.col("qvec")).alias("cosine"))
        .collect()
    }
    for r in rows:
        assert full[r.vec_id] == pytest.approx(r.cosine, abs=1e-12)


def test_kmv_estimate_accuracy(spark):
    """KMV with K=64 has ~12.6% relative standard error; at sf0.01 every
    event_type has 150 distinct users (> K, so the estimator path runs,
    not the exact-count fallback). Assert the estimate lands within a
    generous 3-sigma band of the truth."""
    from cdc_cascade_spark.operators.sketches import KMV_K, sketch_kmv_distinct

    sf = "/root/testdata/sf0.01"
    est = {r.event_type: (r.distinct_est, r.n_kept)
           for r in sketch_kmv_distinct(spark, sf).collect()}
    from cdc_cascade_spark.catalog import load_table
    from pyspark.sql import functions as F

    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        e, n_kept = est[et]
        assert n_kept == KMV_K, f"{et}: estimator path not exercised"
        assert abs(e - n) / n < 0.4, f"{et}: est {e} vs exact {n}"


def test_label_blocked_pairs_bound_hot_labels(spark):
    """A hot label (more vectors than LABEL_CAP) must NOT produce a
    quadratic pair count; near-identical vectors inside it must still
    pair (they share every hyperplane sign bit)."""
    import numpy as np
    from pyspark.sql import functions as F

    from cdc_cascade_spark.llm.similarity import (
        LABEL_CAP,
        _with_norm,
        label_blocked_pairs,
    )

    rng = np.random.RandomState(7)
    n_hot = 4 * LABEL_CAP
    rows = [
        (i, 1, [float(x) for x in rng.randn(64).astype(np.float32)])
        for i in range(n_hot)
    ]
    # a true near-dup inside the hot label: identical to vec 0
    rows.append((9001, 1, rows[0][2]))
    # a small label: three vectors, must pair exactly (all 3 pairs)
    rows += [
        (9100 + i, 2, [float(x) for x in rng.randn(64).astype(np.float32)])
        for i in range(3)
    ]
    emb = _with_norm(
        spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )
    )
    pairs = {
        (r.vec_a, r.vec_b)
        for r in label_blocked_pairs(emb).select("vec_a", "vec_b").collect()
    }
    quadratic = n_hot * (n_hot + 1) // 2
    assert len(pairs) < quadratic / 4, f"{len(pairs)} pairs ~ quadratic"
    # the identical pair survives the bucket sub-blocking
    assert (0, 9001) in pairs
    # the small label still self-joins exactly
    assert {(9100, 9101), (9100, 9102), (9101, 9102)} <= pairs


def test_kmv_excludes_null_values(spark):
    """NULL values must not enter the sketch (COUNT DISTINCT
    semantics); engines also order NULL hashes differently, so keeping
    them would let the kept sets diverge."""
    from cdc_cascade_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("b", None)],
        "g string, v string",
    )
    rows = {r.g: r for r in kmv_distinct(df, "g", "v").collect()}
    assert rows["a"].n_kept == 2 and rows["a"].distinct_est == 2.0
    # a group with only NULLs has nothing to sketch
    assert "b" not in rows


def test_simhash64_pairs_identical_docs_distance_zero(spark):
    """Identical documents must pair at Hamming 0 through the band
    join; unrelated documents must not appear."""
    from cdc_cascade_spark.llm.dedup import _simhash64_frame

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different content about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    sh = {r.doc_id: (r.sim_hi, r.sim_lo) for r in _simhash64_frame(docs).collect()}
    assert sh[1] == sh[2]
    assert sh[1] != sh[3]
    # halves stay within 32 unsigned bits (signed-safe in both engines)
    for hi, lo in sh.values():
        assert 0 <= hi < 2**32 and 0 <= lo < 2**32


def test_ivf_kmeans_scores_exact_and_probes_bounded(spark):
    """Trained-IVF results come only from probed cells, and every hit's
    cosine equals the exact brute-force score for that vector."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.similarity import (
        IVF_NPROBE,
        _cosine,
        ann_ivf_kmeans_topk,
    )
    from pyspark.sql import functions as F

    rows = ann_ivf_kmeans_topk(spark, SF).collect()
    assert rows, "trained IVF probe returned nothing"
    assert len({r.centroid for r in rows}) <= IVF_NPROBE

    emb = load_table(spark, SF, "embeddings")
    qid = emb.agg(F.min("vec_id").alias("qid"))
    q = emb.join(F.broadcast(qid), emb.vec_id == F.col("qid")).select(
        F.col("embedding").alias("qvec")
    )
    full = {
        r.vec_id: r.cosine
        for r in emb.crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(F.col("embedding"), F.col("qvec")).alias("cosine"))
        .collect()
    }
    for r in rows:
        assert full[r.vec_id] == pytest.approx(r.cosine, abs=1e-12)


def test_label_blocked_pairs_equal_exact_when_uncapped(spark):
    """With the cap above every label size the guard must be inert:
    the pair set equals the naive per-label all-pairs model exactly."""
    import numpy as np

    from cdc_cascade_spark.llm.similarity import _with_norm, label_blocked_pairs

    rng = np.random.RandomState(11)
    rows = [
        (i, int(lab), [float(x) for x in rng.randn(8).astype(np.float32)])
        for i, lab in enumerate(rng.randint(0, 4, size=40))
    ]
    emb = _with_norm(
        spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in label_blocked_pairs(emb, cap=10_000).select("vec_a", "vec_b").collect()
    }
    expect = {
        (a, b)
        for (a, la, _) in rows
        for (b, lb, _) in rows
        if la == lb and a < b
    }
    assert got == expect


def test_multiprobe_lsh_widens_single_probe(spark):
    """Multi-probe LSH must dominate single-probe: its probed set is a
    superset (own bucket plus flipped-bit neighbors), so its results
    contain every single-probe hit and its best cosine can only be
    ≥ the single-probe best. On this data the extra probes find
    strictly more and strictly better neighbors."""
    from cdc_cascade_spark.llm.similarity import ann_lsh_multiprobe_topk

    single = {r.vec_id: r.cosine for r in ann_lsh_topk(spark, SF).collect()}
    multi = {r.vec_id: r.cosine for r in ann_lsh_multiprobe_topk(spark, SF).collect()}
    assert set(single) <= set(multi)
    assert len(multi) > len(single)
    assert max(multi.values()) > max(single.values())
    # exactness within probed buckets: shared hits score identically
    for vid, cos in single.items():
        assert multi[vid] == pytest.approx(cos, abs=0.0)


def test_weighted_simhash_stopword_convergence(spark):
    """tf·idf-weighted SimHash must pull stopword-heavy near-dups
    together: two docs with identical salient content but very
    different stopword counts are far apart unweighted (stopword
    occurrences vote with full strength) and close weighted (df-based
    tier collapses stopword influence)."""
    from cdc_cascade_spark.llm.dedup import _simhash64_frame, simhash_weighted_frame

    stop = ["the", "of", "and", "a", "to"]
    content = [f"w{i}x" for i in range(30)]
    rows = [(0, " ".join(content + stop * 6)), (1, " ".join(content + stop))]
    for d in range(2, 10):
        rows.append((d, " ".join([f"u{d}w{i}" for i in range(20)] + stop)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    unw = {r.doc_id: r.sim_lo for r in _simhash64_frame(docs).collect()}
    wgt = {r.doc_id: r.simhash_w for r in simhash_weighted_frame(docs).collect()}
    ham_u = bin(unw[0] ^ unw[1]).count("1")
    ham_w = bin(wgt[0] ^ wgt[1]).count("1")
    assert ham_u >= 8, "unweighted fingerprints should diverge on stopword spam"
    assert ham_w <= ham_u // 2, f"weighting should at least halve the gap ({ham_w} vs {ham_u})"


@pytest.mark.parametrize("local_max_edges", [0, 1 << 20],
                         ids=["distributed", "driver-union-find"])
def test_connected_components_transitive_fixpoint(spark, local_max_edges):
    """Both CC paths must collapse transitive chains (A-B, B-C, C-D →
    one component labelled by the min node) and leave disjoint
    components separate — including a chain deep enough (32 nodes)
    that the distributed path needs several pointer-jumping rounds,
    proving it iterates to the true fixpoint, not one round."""
    from cdc_cascade_spark.llm.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 32)]
    edges = spark.createDataFrame(
        chain + [(100, 101), (200, 200)], ["src", "dst"]
    )
    comps = {
        r.node: r.comp
        for r in connected_components(edges, local_max_edges=local_max_edges).collect()
    }
    assert {comps[n] for n in range(1, 33)} == {1}
    assert comps[100] == comps[101] == 100
    assert comps[200] == 200


def test_cluster_representatives_cover_simhash_pairs(spark):
    """Every doc that appears in a SimHash near-dup pair must be
    assigned a representative, reps must be cluster minima, and both
    docs of each pair must land in the same cluster."""
    from cdc_cascade_spark.llm.dedup import (
        dedup_cluster_representatives,
        dedup_simhash_pairs,
    )

    pairs = dedup_simhash_pairs(spark, SF).collect()
    reps = {r.doc_id: r.rep_doc_id for r in dedup_cluster_representatives(spark, SF).collect()}
    assert pairs, "expected injected near-dup pairs in testdata"
    for p in pairs:
        assert reps[p.doc_a] == reps[p.doc_b]
    for doc, rep in reps.items():
        assert rep <= doc


def test_contamination_pairs_are_bench_to_train(spark):
    """Every contamination pair must cross the bench/train partition in
    the right direction, stay above the containment floor, and at least
    one injected near-dup pair with a benchmark member must surface."""
    from cdc_cascade_spark.llm.curation import (
        CONTAM_BENCH_MOD,
        CONTAM_MIN_CONTAINMENT,
        contamination_check,
    )

    rows = contamination_check(spark, SF).collect()
    assert rows, "expected contaminated pairs in testdata"
    for r in rows:
        assert r.bench_doc % CONTAM_BENCH_MOD == 0
        assert r.train_doc % CONTAM_BENCH_MOD != 0
        assert r.containment >= CONTAM_MIN_CONTAINMENT
        assert 0 < r.n_common


def test_stratified_sample_deterministic_and_bounded(spark):
    """The sample must be a subset of the corpus, byte-identical across
    runs, keep small strata whole, and thin every stratum larger than
    the target (Bernoulli, so bound loosely at 4× target)."""
    from cdc_cascade_spark.llm.curation import (
        SAMPLE_TARGET_PER_STRATUM,
        stratified_sample,
    )

    s1 = {r.doc_id for r in stratified_sample(spark, SF).collect()}
    s2 = {r.doc_id for r in stratified_sample(spark, SF).collect()}
    assert s1 == s2
    kept = stratified_sample(spark, SF).groupBy("lang", "source").count().collect()
    sizes = {(r.lang, r.source): r.n_stratum
             for r in stratified_sample(spark, SF)
             .select("lang", "source", "n_stratum").distinct().collect()}
    for r in kept:
        n = sizes[(r.lang, r.source)]
        if n <= SAMPLE_TARGET_PER_STRATUM:
            assert r["count"] == n, "small strata must be kept whole"
        else:
            assert r["count"] <= 4 * SAMPLE_TARGET_PER_STRATUM


def test_pack_sequences_contiguous_stream_per_shard(spark):
    """Within each shard the packed stream must be gapless: offsets
    ordered by doc_id tile exactly (prev.start + prev.n == next.start),
    chunk spans must match the offsets, and a straddling doc (first !=
    last chunk) must exist so the boundary case is exercised."""
    from cdc_cascade_spark.llm.packing import PACK_BUDGET, pack_sequences

    rows = pack_sequences(spark, SF).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 8
    straddlers = 0
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in shard_rows:
            assert r.start_offset == off, (r.doc_id, r.start_offset, off)
            assert r.first_chunk == r.start_offset // PACK_BUDGET
            assert r.last_chunk == (r.start_offset + r.n_tokens - 1) // PACK_BUDGET
            straddlers += r.first_chunk != r.last_chunk
            off += r.n_tokens
    assert straddlers > 0, "budget too large: no chunk boundary exercised"


def test_pii_redaction_clean_and_complete(spark):
    """Injected PII must be counted and fully redacted; untouched docs
    must pass through byte-identical to the source text."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.curation import pii_redaction

    original = {r.doc_id: r.text
                for r in load_table(spark, SF, "documents").collect()}
    rows = pii_redaction(spark, SF).collect()
    assert len(rows) == len(original)
    for r in rows:
        mod = r.doc_id % 10
        if mod == 0:
            assert r.n_emails == 1 and "<EMAIL>" in r.redacted
            assert "@" not in r.redacted
        elif mod == 5:
            assert r.n_phones == 1 and r.n_ips == 1
            assert "<PHONE>" in r.redacted and "<IP>" in r.redacted
            assert "192.168." not in r.redacted
        else:
            assert (r.n_emails, r.n_phones, r.n_ips) == (0, 0, 0)
            assert r.redacted == original[r.doc_id]


def test_quality_floor_drops_exactly_bottom_decile(spark):
    """The kept set must be the exact complement of the bottom-k under
    (quality_score, doc_id) order, computed against the full scored
    frame."""
    from cdc_cascade_spark.llm.curation import quality_floor_filter
    from cdc_cascade_spark.llm.text import text_stats

    scored = sorted(
        ((r.quality_score, r.doc_id) for r in text_stats(spark, SF).collect())
    )
    k = len(scored) // 10
    expected = {doc for _, doc in scored[k:]}
    kept = {r.doc_id for r in quality_floor_filter(spark, SF).collect()}
    assert kept == expected
    assert len(kept) == len(scored) - k


def test_quality_floor_threshold_is_distributed_topk(spark):
    """The threshold scan must compile to TakeOrderedAndProject (each
    task keeps a local top-k), never a global sort."""
    from cdc_cascade_spark.llm.curation import quality_floor_filter

    plan = quality_floor_filter(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [quality_score" not in plan


def test_repetition_ratio_bounds_and_detects_repeats(spark):
    """Ratio ∈ [0, 1); distinct-shingle count never exceeds the total
    shingle count."""
    from cdc_cascade_spark.llm.text import doc_repetition

    rows = doc_repetition(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.repetition_ratio < 1.0
        assert r.n_distinct_shingles <= r.n_shingles


def test_kmv_setops_close_to_exact(spark):
    """Union/intersection estimates must sit within the KMV error
    envelope (~1/sqrt(K) ≈ 12.5%, allow 3σ) of the exact counts."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.operators.sketches import sketch_kmv_setops

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events").select("event_type", "user_id").collect()
    users: dict[str, set] = {}
    for r in ev:
        if r.user_id is not None:
            users.setdefault(r.event_type, set()).add(r.user_id)
    rows = sketch_kmv_setops(spark, sf).collect()
    assert len(rows) == len(users) * (len(users) - 1) // 2
    for r in rows:
        u = len(users[r.type_a] | users[r.type_b])
        i = len(users[r.type_a] & users[r.type_b])
        assert abs(r.union_est - u) / u < 0.4, (r.type_a, r.type_b, r.union_est, u)
        # intersection estimates inherit union noise; bound loosely
        assert abs(r.inter_est - i) <= max(0.5 * u / 8, 0.5 * i), (
            r.type_a, r.type_b, r.inter_est, i,
        )


def test_doc_chunks_cover_and_overlap(spark):
    """Chunks must tile each doc: first starts at 0, last ends at n,
    consecutive chunks advance by exactly STRIDE (except the clipped
    last), every chunk is full-size unless the doc is shorter, and the
    chunk text matches the token span."""
    from cdc_cascade_spark.llm.packing import CHUNK_SIZE, CHUNK_STRIDE, doc_chunks
    from cdc_cascade_spark.catalog import load_table

    import re

    # mirror the engine's tokenizer: split on \s+ (''.split() drops
    # leading empties and would disagree on empty text)
    texts = {r.doc_id: re.split(r"\s+", r.text)
             for r in load_table(spark, SF, "documents").collect()}
    by_doc: dict[int, list] = {}
    for r in doc_chunks(spark, SF).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    multi = 0
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = len(texts[doc])
        assert chunks[0].start_tok == 0
        assert chunks[-1].end_tok == n
        multi += len(chunks) > 1
        for r in chunks:
            assert r.end_tok - r.start_tok == min(CHUNK_SIZE, n)
            assert r.chunk_text == " ".join(texts[doc][r.start_tok:r.end_tok])
            if r.chunk_id < len(chunks) - 1:
                assert r.start_tok == r.chunk_id * CHUNK_STRIDE
    assert multi > 0, "chunk size too large: no doc produced multiple chunks"


def test_stratified_exact_quota_and_determinism(spark):
    """Every stratum yields exactly min(n_stratum, TARGET) docs; two
    runs pick identical doc sets; the sample is a subset of the
    Bernoulli sample's universe (the corpus)."""
    from cdc_cascade_spark.llm.curation import (
        SAMPLE_TARGET_PER_STRATUM,
        stratified_sample_exact,
    )
    from cdc_cascade_spark.catalog import load_table

    sizes: dict[tuple, int] = {}
    for r in load_table(spark, SF, "documents").collect():
        sizes[(r.lang, r.source)] = sizes.get((r.lang, r.source), 0) + 1
    s1 = {(r.doc_id, r.lang, r.source) for r in stratified_sample_exact(spark, SF).collect()}
    s2 = {(r.doc_id, r.lang, r.source) for r in stratified_sample_exact(spark, SF).collect()}
    assert s1 == s2
    kept: dict[tuple, int] = {}
    for _, lang, source in s1:
        kept[(lang, source)] = kept.get((lang, source), 0) + 1
    for stratum, n in sizes.items():
        assert kept.get(stratum, 0) == min(n, SAMPLE_TARGET_PER_STRATUM), stratum


def test_bpe_pairs_counts_match_manual(spark):
    """Top merge-pair counts must equal a driver-side recount over the
    same pre-tokenization, and the frame must be K rows, ties broken
    by pair string."""
    import re
    from collections import Counter

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.text import BPE_PATTERN, BPE_TOP_PAIRS, bpe_merge_pairs

    counts: Counter = Counter()
    for r in load_table(spark, SF, "documents").collect():
        pre = re.findall(BPE_PATTERN, r.text)
        counts.update(f"{a} {b}" for a, b in zip(pre, pre[1:]))
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_PAIRS]
    rows = bpe_merge_pairs(spark, SF).collect()
    assert [(r.pair, r.n_occurrences) for r in rows] == expected


def test_bpe_merge_round_consumes_top_pair(spark):
    """After applying the top merge, the merged token must appear in
    the round-2 pair vocabulary, the merged pair itself must be gone,
    and counts must match a driver-side greedy replay."""
    import re
    from collections import Counter

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.text import (
        BPE_PATTERN,
        BPE_TOP_PAIRS,
        bpe_apply_top_merge,
        bpe_merge_pairs,
    )

    top = bpe_merge_pairs(spark, SF).limit(1).collect()[0].pair
    a, b = top.split(" ", 1)
    counts: Counter = Counter()
    for r in load_table(spark, SF, "documents").collect():
        pre = re.findall(BPE_PATTERN, r.text)
        merged, i = [], 0
        while i < len(pre):
            if i + 1 < len(pre) and pre[i] == a and pre[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(pre[i])
                i += 1
        counts.update(f"{x} {y}" for x, y in zip(merged, merged[1:]))
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_PAIRS]
    rows = bpe_apply_top_merge(spark, SF).collect()
    got = [(r.pair, r.n_occurrences) for r in rows]
    assert got == expected
    assert all(p != top for p, _ in got), "top pair must be consumed"


def test_lsh_recall_dial_monotone_and_pinned(spark):
    """The multi-probe width is THE recall dial (r4 verdict #6): probing
    the Hamming-<=H ball must recall monotonically more of the exact
    top-10 as H grows, and multi-probe must dominate single-probe.

    The testdata embeddings are weakly clustered (true top-10 cosines
    ~0.28-0.37), so single-bucket recall is legitimately ~0 at 8 planes
    x 500 vectors (~2 candidates/bucket); the dial is what makes the
    operator usable. Probe counts 1/9/37 cover Hamming <= 0/1/2; the
    floors pin this fixed dataset's measured recalls (0.0/0.2/0.5) —
    everything is deterministic, so these are exact, not flaky.
    """
    from cdc_cascade_spark.llm.similarity import ann_lsh_multiprobe_topk

    sf = "/root/testdata/sf0.01"
    truth = {r.vec_id for r in ann_cosine_topk(spark, sf).collect()}
    recall = {}
    for probes in (1, 3, 9, 37):
        got = {r.vec_id for r in ann_lsh_multiprobe_topk(spark, sf, probes=probes).collect()}
        recall[probes] = len(got & truth) / len(truth)
    # probes=1 is exactly single-probe LSH (own bucket only)
    single = {r.vec_id for r in ann_lsh_topk(spark, sf).collect()}
    one = {r.vec_id for r in ann_lsh_multiprobe_topk(spark, sf, probes=1).collect()}
    assert one == single
    # monotone in probe width; multi-probe >= single-probe
    assert recall[1] <= recall[3] <= recall[9] <= recall[37]
    # pinned measured values on this fixed dataset
    assert recall[9] >= 0.2
    assert recall[37] >= 0.5


def test_bpe_train_merge_ranks_stable_across_partitionings(spark):
    """The learned merge table must be invariant to physical layout:
    counts are exact integers and ties break on the pair string, so
    any repartitioning of the corpus yields the same merges in the
    same order (the distributed-trainer determinism claim)."""
    from unittest import mock

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm import bpe

    base = bpe.bpe_train_k_merges(spark, SF, k=4).collect()
    assert len(base) == 4

    real_load = load_table

    def skewed_load(s, d, name):
        df = real_load(s, d, name)
        return df.repartition(7) if name == "documents" else df

    with mock.patch.object(bpe, "load_table", side_effect=skewed_load):
        skewed = bpe.bpe_train_k_merges(spark, SF, k=4).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in skewed]
    # ranks are 1..k and a merged super-token re-merges downstream only
    # with all prior merges applied — pair strings never contain the
    # separator and counts are positive
    for r in base:
        assert r.n_occurrences > 0 and " " in r.pair and "\x1f" not in r.pair
    assert [r.merge_rank for r in base] == [1, 2, 3, 4]


def test_embedding_quantize_roundtrip_error_bounded(spark):
    """Dequantized values must sit within one quantization level of the
    original (floor quantization: q*scale <= x < (q+1)*scale for
    positive scale), and the all-zero guard must emit scale 0."""
    from cdc_cascade_spark.llm.vectorops import QUANT_LEVELS, embedding_quantize
    from cdc_cascade_spark.catalog import load_table

    rows = {r.vec_id: r for r in embedding_quantize(spark, SF).collect()}
    orig = {r.vec_id: r.embedding for r in load_table(spark, SF, "embeddings").collect()}
    assert rows.keys() == orig.keys()
    checked = 0
    for vid, r in rows.items():
        q = [int(v) for v in r.q_csv.split(",")]
        x = [float(v) for v in orig[vid]]
        assert len(q) == len(x)
        if r.scale == 0.0:
            assert all(v == 0 for v in q)
            continue
        assert max(abs(v) for v in q) == QUANT_LEVELS  # max element saturates
        for qi, xi in zip(q, x):
            assert qi * r.scale <= xi + 1e-9
            assert xi < (qi + 1) * r.scale + 1e-9
            checked += 1
    assert checked > 0


def test_knn_join_exactly_k_disjoint_neighbors(spark):
    from cdc_cascade_spark.llm.vectorops import KNN_K, N_QUERIES, knn_join_topk

    rows = knn_join_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for qid, rs in by_q.items():
        assert sorted(r.rnk for r in rs) == list(range(1, KNN_K + 1))
        assert all(r.neighbor_id >= N_QUERIES for r in rs)
        # ranks follow cosine DESC with neighbor_id tiebreak
        ordered = sorted(rs, key=lambda r: (-r.cosine, r.neighbor_id))
        assert [r.rnk for r in ordered] == list(range(1, KNN_K + 1))


def test_token_budget_selection_greedy_maximal(spark):
    """Per stratum: admitted prefix fits the budget AND the first
    rejected document would have crossed it (greedy maximality)."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.prep import tokens
    from cdc_cascade_spark.llm.selection import (
        STRATUM_TOKEN_BUDGET,
        token_budget_selection,
    )
    from pyspark.sql import functions as F

    sel = token_budget_selection(spark, SF).collect()
    by_lang: dict = {}
    for r in sel:
        by_lang.setdefault(r.lang, []).append(r)
    docs = (
        load_table(spark, SF, "documents")
        .select(
            "lang",
            "doc_id",
            F.size(tokens(F.col("text"))).alias("n_tokens"),
            F.expr(
                "(cast(size(array_distinct(split(text, '\\\\s+'))) as bigint)"
                " * 1000) div size(split(text, '\\\\s+'))"
            ).alias("quality"),
        )
        .collect()
    )
    all_by_lang: dict = {}
    for r in docs:
        all_by_lang.setdefault(r.lang, []).append(r)
    for lang, admitted in by_lang.items():
        assert max(r.cum_tokens for r in admitted) <= STRATUM_TOKEN_BUDGET
        ordered = sorted(all_by_lang[lang], key=lambda r: (-r.quality, r.doc_id))
        kept = {r.doc_id for r in admitted}
        run = 0
        for r in ordered:
            run += r.n_tokens
            if run <= STRATUM_TOKEN_BUDGET:
                assert r.doc_id in kept
            else:
                assert r.doc_id not in kept
                break  # first rejection ends the greedy prefix


def test_containment_dominates_jaccard_and_catches_asymmetry(spark):
    """containment >= jaccard on every pair; identical docs hit 1.0
    both ways."""
    from cdc_cascade_spark.llm.dedup import dedup_ngram_jaccard
    from cdc_cascade_spark.llm.selection import shingle_containment

    cont = {(r.doc_a, r.doc_b): r for r in shingle_containment(spark, SF).collect()}
    jac = {(r.doc_a, r.doc_b): r.jaccard for r in dedup_ngram_jaccard(spark, SF).collect()}
    assert cont, "no containment pairs found at sf0.001"
    for pair, r in cont.items():
        if pair in jac:
            assert r.containment_ab >= jac[pair] - 1e-12
            assert r.containment_ba >= jac[pair] - 1e-12
    # the operator's raison d'être: pairs fully contained in ONE
    # direction only (quote/excerpt shape) — symmetric Jaccard would
    # under-score these
    one_way = [r for r in cont.values()
               if max(r.containment_ab, r.containment_ba) == 1.0
               and min(r.containment_ab, r.containment_ba) < 1.0]
    assert one_way, "expected at least one asymmetric fully-contained pair"


def test_bigram_lift_formula_and_floor(spark):
    from cdc_cascade_spark.operators.collocations import MIN_COUNT, bigram_lift
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.prep import tokens
    from pyspark.sql import functions as F

    rows = bigram_lift(spark, SF).collect()
    assert rows
    n_total = (
        load_table(spark, SF, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("t"))
        .count()
    )
    for r in rows:
        assert r.n_pair >= MIN_COUNT
        expect = (r.n_pair * n_total) / (r.n_left * r.n_right)
        assert r.lift == pytest.approx(expect, rel=1e-12)
        assert r.n_left >= r.n_pair and r.n_right >= r.n_pair
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


@pytest.mark.parametrize("ann_sf_dir", [SF, "/root/testdata/sf0.01"])
def test_bucketed_ann_prunes_partitions_and_matches_inmemory(
    spark, tmp_path, ann_sf_dir
):
    """The 100 TB ANN layout claim, proven end-to-end: writing the
    embedding table partitioned by LSH bucket and probing it must
    (a) return exactly the in-memory multi-probe result, and
    (b) plan the probe as a partition filter that scans only the probed
        bucket directories — no full-table read.

    Parametrized over sf0.001 AND sf0.01 (r5 verdict #7): at sf0.01 the
    on-disk bucket count exceeds the session's shuffle/task parallelism,
    pinning that partition pruning is a property of the LAYOUT (probes /
    buckets-on-disk), not an artifact of a small file count — the
    probed-file fraction must scale with the probed-bucket fraction."""
    import numpy as np
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.similarity import (
        _query_probe_buckets,
        LSH_PLANES,
        ann_lsh_multiprobe_topk,
        ann_lsh_topk_bucketed,
        write_lsh_bucketed,
    )
    from cdc_cascade_spark.plans.explain import physical_plan

    idx = str(tmp_path / "emb_by_bucket")
    write_lsh_bucketed(spark, ann_sf_dir, idx)

    emb = load_table(spark, ann_sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").limit(1).select("vec_id", "embedding").collect()[0]
    qvec = np.asarray(qrow.embedding, dtype=np.float32).astype(np.float64)

    probes = 9  # Hamming-<=1 ball
    got = ann_lsh_topk_bucketed(spark, idx, qvec, int(qrow.vec_id), probes=probes)
    want = ann_lsh_multiprobe_topk(spark, ann_sf_dir, probes=probes)
    g = [(r.vec_id, r.label, r.bucket, r.cosine) for r in got.collect()]
    w = [(r.vec_id, r.label, r.bucket, r.cosine) for r in want.collect()]
    assert g == w

    plan = physical_plan(got)
    assert "PartitionFilters" in plan and "bucket" in plan, plan[:2000]
    # the pruned scan must read strictly fewer data files than the
    # layout holds: count parquet files inside probed bucket dirs vs
    # all bucket dirs (the physical quantity PartitionFilters prunes)
    import glob

    probed = set(_query_probe_buckets(qvec, LSH_PLANES, probes))
    n_total_files = len(glob.glob(f"{idx}/bucket=*/*.parquet"))
    n_probed_files = sum(
        len(glob.glob(f"{idx}/bucket={b}/*.parquet")) for b in probed
    )
    assert 0 < n_probed_files < n_total_files, (n_probed_files, n_total_files)

    # scaling pin: the probe never opens more bucket directories than
    # probes, and the read fraction tracks probes/buckets-on-disk (2×
    # slack absorbs per-bucket file-count variance)
    n_dirs_total = len(glob.glob(f"{idx}/bucket=*"))
    n_dirs_probed = sum(
        1 for b in probed if glob.glob(f"{idx}/bucket={b}")
    )
    assert n_dirs_probed <= probes
    assert n_probed_files <= max(probes, 2 * n_total_files * probes // n_dirs_total)
    if ann_sf_dir.endswith("sf0.01"):
        # the claim under test: pruning holds when buckets outnumber
        # the session's parallelism (bucket dirs ≫ tasks)
        assert n_dirs_total > spark.sparkContext.defaultParallelism, (
            n_dirs_total,
            spark.sparkContext.defaultParallelism,
        )


def test_incremental_index_append_equals_full_rebuild(spark, tmp_path):
    """Daily-ingest contract: building the bucketed ANN index from half
    the corpus and appending the other half must be indistinguishable
    from a full build — same bucket assignment per vector, same probe
    results."""
    import numpy as np
    from pyspark.sql import functions as F
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.similarity import (
        ann_lsh_topk_bucketed,
        append_lsh_bucketed,
        write_lsh_bucketed,
    )

    emb = load_table(spark, SF, "embeddings")
    mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).collect()[0][0]

    full = str(tmp_path / "full")
    write_lsh_bucketed(spark, SF, full)

    incr = str(tmp_path / "incr")
    # base = first half via a filtered temp view of the same table
    base_dir = str(tmp_path / "base_tbl")
    emb.filter(F.col("vec_id") <= mid).write.parquet(f"{base_dir}/embeddings.parquet")
    write_lsh_bucketed(spark, base_dir, incr)
    append_lsh_bucketed(emb.filter(F.col("vec_id") > mid), incr)

    a = spark.read.parquet(full).select("vec_id", "bucket")
    b = spark.read.parquet(incr).select("vec_id", "bucket")
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    qrow = emb.orderBy("vec_id").limit(1).select("vec_id", "embedding").collect()[0]
    qvec = np.asarray(qrow.embedding, dtype=np.float32).astype(np.float64)
    ra = [(r.vec_id, r.cosine) for r in
          ann_lsh_topk_bucketed(spark, full, qvec, int(qrow.vec_id), probes=9).collect()]
    rb = [(r.vec_id, r.cosine) for r in
          ann_lsh_topk_bucketed(spark, incr, qvec, int(qrow.vec_id), probes=9).collect()]
    assert ra == rb


def test_multitable_lsh_recall_vs_multiprobe(spark):
    """The two recall dials, head to head on the fixed sf0.01 corpus.
    4 tables x 4 planes scans ~4/16 of the data (per-table bucket
    fraction 1/16, L=4) — roughly the scan budget of multi-probe at 37
    of 256 buckets (14%). Multi-table must beat single-table LSH and
    reach a pinned recall floor at its scan budget; every returned
    cosine is exact."""
    from cdc_cascade_spark.llm.similarity import (
        ann_lsh_multiprobe_topk,
        ann_lsh_multitable_topk,
    )

    sf = "/root/testdata/sf0.01"
    truth = {r.vec_id for r in ann_cosine_topk(spark, sf).collect()}
    multi_table = ann_lsh_multitable_topk(spark, sf).collect()
    mt_ids = {r.vec_id for r in multi_table}
    recall_mt = len(mt_ids & truth) / len(truth)
    single = {r.vec_id for r in ann_lsh_topk(spark, sf).collect()}
    recall_single = len(single & truth) / len(truth)
    assert recall_mt > recall_single
    assert recall_mt >= 0.3, recall_mt  # pinned on this fixed dataset
    assert all(1 <= r.n_shared_tables <= 4 for r in multi_table)
    # comparable-scan multi-probe (37 buckets ~ 14%) for the curve note
    mp = {r.vec_id for r in ann_lsh_multiprobe_topk(spark, sf, probes=37).collect()}
    recall_mp = len(mp & truth) / len(truth)
    # both dials must land in the same recall regime at this budget
    assert abs(recall_mt - recall_mp) <= 0.4, (recall_mt, recall_mp)


def test_index_maintenance_lifecycle_append_compact_probe(spark, tmp_path):
    """The full index-maintenance story in one test: build → N small
    appends (the daily-ingest small-files tax) → per-bucket compaction
    → probe results unchanged and file count reduced."""
    import glob

    import numpy as np
    from pyspark.sql import functions as F
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.similarity import (
        ann_lsh_topk_bucketed,
        append_lsh_bucketed,
        write_lsh_bucketed,
    )
    from cdc_cascade_spark.sources.io import compact_table

    emb = load_table(spark, SF, "embeddings")
    mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).collect()[0][0]
    idx = str(tmp_path / "idx")
    base_dir = str(tmp_path / "base_tbl")
    emb.filter(F.col("vec_id") <= mid).write.parquet(f"{base_dir}/embeddings.parquet")
    write_lsh_bucketed(spark, base_dir, idx)
    # four small appends — each lands new files in bucket dirs
    rest = emb.filter(F.col("vec_id") > mid).withColumn(
        "g", (F.col("vec_id") % 4)
    )
    for g in range(4):
        append_lsh_bucketed(rest.filter(F.col("g") == g).drop("g"), idx)

    qrow = emb.orderBy("vec_id").limit(1).select("vec_id", "embedding").collect()[0]
    qvec = np.asarray(qrow.embedding, dtype=np.float32).astype(np.float64)
    before = [(r.vec_id, r.cosine) for r in
              ann_lsh_topk_bucketed(spark, idx, qvec, int(qrow.vec_id), probes=9).collect()]

    # per-bucket compaction (the 100 TB shape: each partition dir is an
    # independent compaction unit with its own atomic swap)
    n_files_before = len(glob.glob(f"{idx}/bucket=*/*.parquet"))
    for bdir in sorted(glob.glob(f"{idx}/bucket=*")):
        compact_table(spark, bdir)
    n_files_after = len(glob.glob(f"{idx}/bucket=*/*.parquet"))
    assert n_files_after < n_files_before

    after = [(r.vec_id, r.cosine) for r in
             ann_lsh_topk_bucketed(spark, idx, qvec, int(qrow.vec_id), probes=9).collect()]
    assert before == after


def test_bpe_separator_byte_in_text_cannot_corrupt_stream(spark, tmp_path):
    """A document containing the \\x1f unit-separator byte must not
    inject phantom tokens or splice merges: pre-tokenization strips it,
    so results equal the same corpus with the byte removed."""
    from cdc_cascade_spark.llm.bpe import bpe_train_k_merges
    from cdc_cascade_spark.llm.text import (
        _bpe_pretokens,
        bpe_apply_top_merge,
        bpe_merge_pairs,
    )
    from pyspark.sql import functions as F

    dirty = str(tmp_path / "dirty")
    clean = str(tmp_path / "clean")
    rows = [
        (1, "aa bb aa bb aa bb"),
        (2, "aa\x1fbb aa bb \x1f\x1f aa bb"),  # separator bytes injected
        (3, "cc aa bb cc"),
    ]
    for path, fix in ((dirty, False), (clean, True)):
        data = [
            (i, t.replace("\x1f", "") if fix else t, "en", "test", len(t))
            for i, t in rows
        ]
        spark.createDataFrame(
            data, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{path}/documents.parquet")

    # unit level: the pre-token array is separator-free and identical
    pt = spark.createDataFrame([("x\x1fy z",)], "text string").select(
        _bpe_pretokens(F.col("text")).alias("p")
    ).collect()[0].p
    assert pt == ["xy", "z"]

    d_pairs = [(r.pair, r.n_occurrences) for r in bpe_merge_pairs(spark, dirty).collect()]
    c_pairs = [(r.pair, r.n_occurrences) for r in bpe_merge_pairs(spark, clean).collect()]
    assert d_pairs == c_pairs
    assert not any("\x1f" in p for p, _ in d_pairs)

    d_merges = [tuple(r) for r in bpe_train_k_merges(spark, dirty, k=3).collect()]
    c_merges = [tuple(r) for r in bpe_train_k_merges(spark, clean, k=3).collect()]
    assert d_merges == c_merges

    d_apply = [(r.pair, r.n_occurrences) for r in bpe_apply_top_merge(spark, dirty).collect()]
    c_apply = [(r.pair, r.n_occurrences) for r in bpe_apply_top_merge(spark, clean).collect()]
    assert d_apply == c_apply
    assert not any("\x1f" in p for p, _ in d_apply)


def test_probe_bucket_order_matches_bruteforce_and_scales():
    """The shell-by-shell probe-mask generator must emit exactly the
    order of the old global (popcount, Σ|dot|, mask) sort — and stay
    sub-second at production plane counts where the global sort would
    materialize 2^nplanes masks."""
    import time

    import numpy as np

    from cdc_cascade_spark.llm.similarity import (
        _planes_matrix,
        _query_probe_buckets,
    )

    def brute(qvec, nplanes, probes):
        planes = _planes_matrix(nplanes, qvec.shape[0])
        dots = np.add.accumulate(planes * qvec[None, :], axis=1)[:, -1]
        bucket = int(sum((1 << p) for p in range(nplanes) if dots[p] > 0))
        masks = sorted(
            range(1, 1 << nplanes),
            key=lambda m: (
                bin(m).count("1"),
                sum(abs(dots[p]) for p in range(nplanes) if m >> p & 1),
                m,
            ),
        )
        return [bucket] + [bucket ^ m for m in masks[: probes - 1]]

    dim = 16
    for seed in range(4):
        q = np.sin(np.arange(dim, dtype=np.float64) * (seed + 1) + 0.7)
        for probes in (1, 2, 9, 37, 255, 256):
            assert _query_probe_buckets(q, 8, probes) == brute(q, 8, probes)

    q = np.sin(np.arange(dim, dtype=np.float64) * 3.1)
    t0 = time.time()
    out = _query_probe_buckets(q, 24, 50)
    assert len(out) == 50 and len(set(out)) == 50
    assert time.time() - t0 < 1.0


def _ref_bpe_train(texts: list[str], k: int):
    """Pure-Python greedy BPE trainer — the ground truth the Spark and
    DuckDB implementations must both reproduce exactly."""
    import re

    from cdc_cascade_spark.llm.text import BPE_PATTERN

    streams = [re.findall(BPE_PATTERN, t.replace("\x1f", "")) for t in texts]
    merges = []
    for rank in range(1, k + 1):
        counts: dict[str, int] = {}
        for toks in streams:
            for x, y in zip(toks, toks[1:]):
                counts[f"{x} {y}"] = counts.get(f"{x} {y}", 0) + 1
        if not counts:
            break
        top_n = max(counts.values())
        pair = min(p for p, c in counts.items() if c == top_n)
        merges.append((rank, pair, top_n))
        a, b = pair.split(" ", 1)
        new_streams = []
        for toks in streams:
            out, i = [], 0
            while i < len(toks):  # greedy left-to-right, non-overlapping
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_streams.append(out)
        streams = new_streams
    return merges, streams


def test_bpe_merge_is_tokenwise_no_boundary_bleed(spark, tmp_path):
    """A learned pair must merge only whole adjacent tokens — never a
    suffix of one token followed by a prefix of the next. Corpus is
    built so the round-1 winner is (the, cat) while 'lathe cats' docs
    offer the exact substring '...the␟cat...' across a token boundary:
    an unanchored stream replace would splice them into 'lathecats'
    (the r5 ADVICE defect); the anchored ␟a␟␟b␟ encoding must not.
    Also covers greedy run semantics ((a,a) over [a,a,a] → [aa,a]) and
    count/tie parity with a pure-Python reference trainer, for both
    the Spark implementation and the DuckDB oracle SQL."""
    import duckdb
    import pandas as pd
    from cdc_cascade_spark.llm import bpe
    from cdc_cascade_spark.llm.text import (
        ORACLE_BPE_APPLY,
        bpe_apply_top_merge,
    )
    from cdc_cascade_spark.testing.parity import compare

    texts = [
        "the cat the cat the cat the cat",  # winner: (the, cat) x4
        "lathe cats lathe cats",            # boundary-bleed bait
        "a a a",                            # greedy run case
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")

    # ---- full trainer vs the Python reference (k=4 exercises the
    # merged-supertoken re-merge, the lex tie-break, and the run case)
    ref_merges, ref_streams = _ref_bpe_train(texts, k=4)
    got = [tuple(r) for r in bpe.bpe_train_k_merges(spark, sf, k=4).collect()]
    assert got == ref_merges

    # ---- one-round apply: next-round pair counts vs reference. After
    # merging (the, cat) the bleed docs' streams must survive intact —
    # 'lathe'/'cats' stay standalone tokens (a later round may merge
    # them as WHOLE tokens, which is legitimate; splicing them in the
    # (the, cat) round is not).
    ref1, streams1 = _ref_bpe_train(texts, k=1)
    assert ref1 == [(1, "the cat", 4)]
    assert streams1[1] == ["lathe", "cats", "lathe", "cats"]
    counts: dict[str, int] = {}
    for toks in streams1:
        for x, y in zip(toks, toks[1:]):
            counts[f"{x} {y}"] = counts.get(f"{x} {y}", 0) + 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got1 = [(r.pair, r.n_occurrences) for r in bpe_apply_top_merge(spark, sf).collect()]
    assert got1 == expect
    assert ("lathe cats", 2) in got1  # the bleed would have destroyed this pair

    # ---- the DuckDB oracles replicate the same tokenwise semantics on
    # the collision corpus (the sf0.01 driver data has no collisions,
    # so this corpus is what actually pins the oracle's merge rule)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    o_apply = con.execute(ORACLE_BPE_APPLY).df()
    s_apply = pd.DataFrame(got1, columns=["pair", "n_occurrences"])
    res = compare("bpe_apply_top_merge", s_apply, o_apply)
    assert res.ok, str(res)
    o_train = con.execute(bpe._oracle_train_sql(k=4)).df()
    s_train = pd.DataFrame(
        got, columns=["merge_rank", "pair", "n_occurrences"]
    )
    res = compare("bpe_train_k_merges", s_train, o_train)
    assert res.ok, str(res)


def test_curate_corpus_invariant_to_partitioning_and_order(spark, tmp_path):
    """The curated corpus is a pure function of the document SET
    (r5 verdict #8): rewriting the same rows in a different file order
    and partition layout — i.e. permuting the duplicate-injection
    order — must yield the identical output. This holds because the
    union-find representative choice is min-doc_id (order-free), every
    filter threshold is an exact rank or integer expression, and the
    budget prefix is a total (quality, doc_id) order; the test proves
    the composition keeps it."""
    from pyspark.sql import functions as F

    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.pipeline import curate_corpus

    docs = load_table(spark, SF, "documents")
    layouts = {
        "fwd": docs.orderBy("doc_id").coalesce(1),
        # reversed order, many small partitions: near-dup cluster
        # members arrive in the opposite order across different files
        "rev": docs.orderBy(F.desc("doc_id")).repartition(13),
        # hash-scattered: cluster members land in arbitrary partitions
        "hash": docs.repartition(7, F.expr("hash(doc_id, 17)")),
    }
    results = {}
    for name, frame in layouts.items():
        d = str(tmp_path / name)
        frame.write.parquet(f"{d}/documents.parquet")
        results[name] = sorted(
            tuple(r) for r in curate_corpus(spark, d).collect()
        )
    assert results["fwd"] == results["rev"] == results["hash"]
    assert len(results["fwd"]) > 0


def test_curate_corpus_composition_invariants(spark):
    """The end-to-end curation chain must honor each component's
    contract: no near-dup loser, no below-floor doc, no contaminated
    doc survives; output text is the redacted form with matching
    flags; and each stratum's admitted tokens respect the budget
    GREEDILY over the surviving pool (not the raw corpus — dropped
    docs must not consume budget)."""
    from cdc_cascade_spark.llm.curation import (
        contamination_check,
        pii_redaction,
        quality_floor_filter,
    )
    from cdc_cascade_spark.llm.dedup import dedup_cluster_representatives
    from cdc_cascade_spark.llm.pipeline import curate_corpus
    from cdc_cascade_spark.llm.selection import STRATUM_TOKEN_BUDGET

    out = {r.doc_id: r for r in curate_corpus(spark, SF).collect()}
    assert out, "curation must keep a non-trivial corpus"

    losers = {
        r.doc_id
        for r in dedup_cluster_representatives(spark, SF).collect()
        if r.doc_id != r.rep_doc_id
    }
    kept_quality = {r.doc_id for r in quality_floor_filter(spark, SF).collect()}
    contaminated = {r.train_doc for r in contamination_check(spark, SF).collect()}
    red = {r.doc_id: r for r in pii_redaction(spark, SF).collect()}

    # per-component contracts
    assert not (set(out) & losers)
    assert set(out) <= kept_quality
    assert not (set(out) & contaminated)
    for doc_id, row in out.items():
        r = red[doc_id]
        assert row.text == r.redacted
        assert row.was_redacted == ((r.n_emails + r.n_phones + r.n_ips) > 0)
    assert any(r.was_redacted for r in out.values())

    # budget: per stratum, admitted tokens fit the budget, and the
    # budget is computed over the surviving pool — at least one
    # stratum must admit a doc that the RAW-corpus budget would have
    # rejected or vice versa is not required, but totals must respect
    # the cap
    by_lang: dict = {}
    for r in out.values():
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        assert sum(r.n_tokens for r in rows) <= STRATUM_TOKEN_BUDGET
        # greedy order consistency: within a stratum the admitted set
        # is a prefix of (quality DESC, doc_id ASC) over the admitted
        # pool itself
        ordered = sorted(rows, key=lambda r: (-r.quality, r.doc_id))
        cum = 0
        for r in ordered:
            cum += r.n_tokens
            assert cum <= STRATUM_TOKEN_BUDGET


def test_budget_filter_operates_on_the_given_pool(spark):
    """budget_filter must budget the frame it is GIVEN: removing a
    stratum's top-quality doc frees its tokens for the next docs —
    the property that makes pipeline-stage budgeting correct (a raw
    -corpus budget would let dropped docs consume stratum budget)."""
    from cdc_cascade_spark.llm.selection import (
        STRATUM_TOKEN_BUDGET,
        budget_filter,
    )

    # quality is the distinct-token ratio: doc 1 (all-distinct, huge)
    # nearly fills the budget; docs 2..9 fit only if doc 1 is absent
    big = " ".join(f"w{i}" for i in range(STRATUM_TOKEN_BUDGET - 40))
    small = [" ".join(f"s{j}x{i}" for i in range(200)) for j in range(8)]
    rows = [(1, "en", big)] + [(10 + j, "en", t) for j, t in enumerate(small)]
    full = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    adm_full = {r.doc_id for r in budget_filter(full).collect()}
    assert 1 in adm_full
    assert len(adm_full & {10 + j for j in range(8)}) <= 1  # budget eaten

    pool = full.filter("doc_id != 1")  # upstream stage dropped doc 1
    adm_pool = {r.doc_id for r in budget_filter(pool).collect()}
    # the freed budget admits several small docs that the raw-corpus
    # budget rejected
    assert len(adm_pool) > len(adm_full & {10 + j for j in range(8)})
    assert adm_pool <= {10 + j for j in range(8)}
    total = sum(r.n_tokens for r in budget_filter(pool).collect())
    assert total <= STRATUM_TOKEN_BUDGET


def test_dedup_embedding_cosine_matches_numpy_banded_model(spark):
    """Full semantic model-check of dedup_embedding_cosine against a
    pure-numpy reference: the result must be EXACTLY the pairs that
    (a) agree on every sign bit of at least one band and (b) have
    exact cosine >= the threshold — and the banded candidate space
    must be a strict subset of the all-pairs space (it's LSH, not a
    quadratic scan)."""
    import numpy as np

    from cdc_cascade_spark.llm.similarity import (
        DEDUP_BANDS,
        DEDUP_BAND_PLANES,
        DEDUP_COSINE_THRESHOLD,
        _planes_matrix,
        dedup_embedding_cosine,
    )

    rows = sorted(
        spark.read.parquet(SF + "/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    ids = [r.vec_id for r in rows]
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    n = len(ids)

    planes = _planes_matrix(DEDUP_BANDS * DEDUP_BAND_PLANES)
    # strict left-to-right fold, same as the Arrow kernel
    dots = np.add.accumulate(M[:, None, :] * planes[None, :, :], axis=2)[:, :, -1]
    bits = dots > 0
    w = 2 ** np.arange(DEDUP_BAND_PLANES)
    band_vals = np.stack(
        [
            bits[:, b * DEDUP_BAND_PLANES : (b + 1) * DEDUP_BAND_PLANES] @ w
            for b in range(DEDUP_BANDS)
        ],
        axis=1,
    )  # (n, B)

    # pairwise exact cosines via the same sequential fold (chunked)
    norms = np.sqrt(np.add.accumulate(M * M, axis=1)[:, -1])
    cos = np.empty((n, n))
    for lo in range(0, n, 64):
        hi = min(lo + 64, n)
        prod = M[lo:hi, None, :] * M[None, :, :]
        cos[lo:hi] = np.add.accumulate(prod, axis=2)[:, :, -1] / (
            norms[lo:hi, None] * norms[None, :]
        )

    shares_band = (band_vals[:, None, :] == band_vals[None, :, :]).any(axis=2)
    iu = np.triu_indices(n, k=1)
    n_candidates = int(shares_band[iu].sum())
    assert 0 < n_candidates < len(iu[0]), "banding must prune the pair space"

    # no pair near the threshold boundary, so round-mode differences
    # between the engines' ROUND and numpy cannot flip membership
    near = np.abs(cos[iu] - DEDUP_COSINE_THRESHOLD) < 1e-6
    assert not near.any()

    expected = {
        (ids[i], ids[j]): cos[i, j]
        for i, j in zip(*iu)
        if shares_band[i, j] and cos[i, j] >= DEDUP_COSINE_THRESHOLD
    }
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in dedup_embedding_cosine(spark, SF).collect()
    }
    assert got.keys() == expected.keys()
    assert expected, "threshold should catch injected-similarity pairs"
    for k, v in got.items():
        assert abs(v - expected[k]) < 1e-9, k


def test_minhash_index_probe_equals_batch_cross_pairs(spark, tmp_path):
    """Build the persistent MinHash index from a corpus split, probe it
    with the held-out batch, and require EXACTLY the cross-split subset
    of the registered (oracle-checked) dedup_minhash_lsh answer on the
    full table — same candidates, same verified Jaccard values."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.dedup import dedup_minhash_lsh
    from cdc_cascade_spark.llm.dedup_index import (
        dedup_against_index,
        write_minhash_index,
    )

    docs = load_table(spark, SF, "documents")
    corpus = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")
    idx = str(tmp_path / "mh_index")
    write_minhash_index(corpus, idx)

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_against_index(batch, spark, idx).collect()
    }

    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    expected = {}
    for r in dedup_minhash_lsh(spark, SF).collect():
        in_a, in_b = r.doc_a in batch_ids, r.doc_b in batch_ids
        if in_a != in_b:  # exactly one side is new
            corpus_id, batch_id = (r.doc_b, r.doc_a) if in_a else (r.doc_a, r.doc_b)
            expected[(corpus_id, batch_id)] = r.jaccard
    assert expected, "testdata must contain cross-split near-dup pairs"
    assert got == expected


def test_minhash_index_append_equals_rebuild(spark, tmp_path):
    """Daily-ingest invariant: append a second corpus slice to an
    existing index, and a probe must return byte-identical results to
    an index rebuilt from scratch over the union."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.dedup_index import (
        append_minhash_index,
        dedup_against_index,
        write_minhash_index,
    )

    docs = load_table(spark, SF, "documents")
    day1 = docs.filter("doc_id % 5 IN (1, 2)")
    day2 = docs.filter("doc_id % 5 IN (3, 4)")
    batch = docs.filter("doc_id % 5 = 0")

    inc = str(tmp_path / "incremental")
    write_minhash_index(day1, inc)
    append_minhash_index(day2, inc)

    full = str(tmp_path / "rebuilt")
    write_minhash_index(day1.unionByName(day2), full)

    probe = lambda p: {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_against_index(batch, spark, p).collect()
    }
    got_inc, got_full = probe(inc), probe(full)
    assert got_inc == got_full
    assert got_inc, "expected cross near-dup pairs in the probe"


def test_minhash_index_probe_never_shuffles_the_corpus(spark, tmp_path):
    """The probe's promise at 100 TB is that the corpus-side relations
    (index bands, index features) are only SCANNED and probed map-side:
    the batch broadcasts into both joins, so the plan must contain no
    sort-merge join and no shuffle of either index scan."""
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.dedup_index import (
        dedup_against_index,
        write_minhash_index,
    )

    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "planidx")
    write_minhash_index(docs.filter("doc_id % 5 != 0"), idx)
    result = dedup_against_index(docs.filter("doc_id % 5 = 0"), spark, idx)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_bpe_queries_survive_pretoken_less_documents(spark, tmp_path):
    """A document whose text yields ZERO pre-tokens (empty, whitespace,
    or only separator bytes) is a normal corpus state: the pair-zip
    slice must not crash on a negative length (regression: unguarded
    slice(pre, 1, n-1)), and results must equal the corpus without the
    degenerate docs (they contribute no pairs)."""
    from pyspark.sql import functions as F

    from cdc_cascade_spark.catalog import TABLES, load_table
    from cdc_cascade_spark.llm.text import bpe_apply_top_merge, bpe_merge_pairs
    from cdc_cascade_spark.llm.bpe import bpe_train_k_merges

    base = load_table(spark, SF, "documents")
    # build a temp sf_dir: documents = real docs + 3 pretoken-less docs
    deg_rows = [(100001, ""), (100002, "   "), (100003, "\x1f\x1f")]
    extra = spark.createDataFrame(deg_rows, "doc_id long, text string")
    docs_aug = base.unionByName(
        extra.select(
            "doc_id",
            *[
                F.lit(None).cast(dict(base.dtypes)[c]).alias(c)
                for c in base.columns
                if c not in ("doc_id", "text")
            ],
            "text",
        ).select(*base.columns)
    )
    aug_dir = str(tmp_path / "sf_aug")
    for t in TABLES:
        src = docs_aug if t == "documents" else load_table(spark, SF, t)
        src.write.mode("overwrite").parquet(f"{aug_dir}/{t}.parquet")

    want_pairs = [tuple(r) for r in bpe_merge_pairs(spark, SF).collect()]
    got_pairs = [tuple(r) for r in bpe_merge_pairs(spark, aug_dir).collect()]
    assert got_pairs == want_pairs

    want_next = [tuple(r) for r in bpe_apply_top_merge(spark, SF).collect()]
    got_next = [tuple(r) for r in bpe_apply_top_merge(spark, aug_dir).collect()]
    assert got_next == want_next

    want_merges = [tuple(r) for r in bpe_train_k_merges(spark, SF).collect()]
    got_merges = [tuple(r) for r in bpe_train_k_merges(spark, aug_dir).collect()]
    assert got_merges == want_merges


def test_embedding_dedup_banding_dial_monotone():
    """The OR-of-ANDs banding law on the real embeddings: for a fixed
    16 sign bits, splitting into more (shorter) bands must monotonically
    raise BOTH candidate-set size and recall of the τ-similar pairs —
    the dial a deployment turns to trade scan for recall. Pure numpy
    over the same hyperplanes the operator uses."""
    import numpy as np
    import pyarrow.parquet as pq

    from cdc_cascade_spark.llm.similarity import (
        DEDUP_COSINE_THRESHOLD,
        _planes_matrix,
    )

    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    M = np.stack(t.embedding.to_numpy()).astype(np.float64)
    n = len(M)
    planes = _planes_matrix(16)
    bits = (M @ planes.T) > 0
    norms = np.linalg.norm(M, axis=1)
    cos = (M @ M.T) / np.outer(norms, norms)
    iu = np.triu_indices(n, k=1)
    above = cos[iu] >= DEDUP_COSINE_THRESHOLD
    assert above.sum() > 0

    results = []
    for n_bands, band_planes in ((2, 8), (4, 4), (8, 2)):
        w = 2 ** np.arange(band_planes)
        bv = np.stack(
            [
                bits[:, b * band_planes : (b + 1) * band_planes] @ w
                for b in range(n_bands)
            ],
            axis=1,
        )
        shares = (bv[:, None, :] == bv[None, :, :]).any(axis=2)[iu]
        results.append(
            (int(shares.sum()), float((shares & above).sum() / above.sum()))
        )
    (c2, r2), (c4, r4), (c8, r8) = results
    assert c2 < c4 < c8, results
    assert r2 <= r4 <= r8, results
    assert r8 > r4, results  # the top of the dial must actually move
