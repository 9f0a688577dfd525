"""Stream-static enrichment: near-dup screening of incoming documents
against a static corpus index.

The production shape this models: a crawl/ingest stream of new
documents must be checked against the already-curated corpus ("have we
seen this, or something 0.8-Jaccard-close to it?") BEFORE being
admitted. Spark's stream-static join does this without any streaming
state: the static side is the persisted MinHash band index the batch
dedup family already maintains, the stream side is a map-only
featurization of each arriving document — so the whole screen is
stateless append-mode (no watermark, no state store), and every
micro-batch re-reads only the (persisted) static index.

Why a dedicated row-wise featurizer: the batch MinHash path
(llm/dedup.py) computes signatures as 16 ``min()`` aggregates over an
exploded hash relation — the right shape for a full-corpus pass
(partial aggregation, no per-row array churn). An aggregation on the
stream side would force update/complete output mode and a shuffle per
micro-batch; instead each signature is ``array_min(transform(hset,
...))`` per row. Higher-order array functions are CodegenFallback
(interpreted) — measured ~10× slower per row than the agg form at
full-corpus scale, which is why the BATCH path doesn't use them — but
a micro-batch touches only the increment, where per-row cost is noise
and statelessness is everything. ``tests/test_streaming.py`` pins the
two formulations to identical (doc, band, bkey) output.

Pair dedup without aggregation: a candidate pair sharing k > 1 bands
would emit k rows from the band join. The classic fix
(``groupBy(pair).min(band)``) is an aggregation — illegal here. Both
sides instead carry their full 4-entry band-key arrays, and a joined
row survives only if NO earlier band also matches (`zip_with` equality
over the key-array prefixes) — the "first shared band wins" rule as a
stateless per-row predicate (same trick as operators/ranges.py's
first-shared-bucket dedup).

Scale shape (100 TB corpus, unbounded stream): the static band index
is ~4 rows × (8-byte id + 32-byte key) per corpus doc — far too big to
broadcast at full scale, and that is fine: Spark executes the
stream-static join as a shuffled hash join per micro-batch with the
static side's scan pruned by the join keys. The stream side is
embarrassingly parallel featurization; nothing accumulates.

Reference scope note: the reference (tr1sm0s1n/cdc-cascade) has no
analog — this extends the LLM-pipeline surface (BASELINE.json
directive), reusing its CDC streaming machinery (queue/cdc.go:109-224
is the ingest-loop shape being mirrored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_cascade_spark.functions.hashing import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)
from cdc_cascade_spark.llm.dedup import JACCARD_THRESHOLD, _lsh_band_structs
from cdc_cascade_spark.llm.prep import jaccard, shingle_hash_set, tokens


def featurize_rowwise(docs: DataFrame) -> DataFrame:
    """Map-only MinHash featurization: (doc_id, hset, keys, band, bkey).

    ``keys`` is the ordered 4-entry band-key array; one output row per
    (doc, band) via posexplode. Works identically on batch and
    streaming frames — no aggregation anywhere.
    """
    def _perm(a: int, b: int):
        # closure factory: a default-arg lambda would change the lambda's
        # arity and PySpark infers HOF lambda shape from parameter count
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P

    sigs = [
        F.array_min(F.transform(F.col("hset"), _perm(a, b))).alias(f"s{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    with_sigs = docs.select(
        "doc_id",
        shingle_hash_set(tokens(F.col("text"))).alias("hset"),
    ).select("doc_id", "hset", *sigs)
    keys = F.array(*[s["bkey"] for s in _lsh_band_structs()])
    with_keys = with_sigs.select("doc_id", "hset", keys.alias("keys"))
    return with_keys.select(
        "doc_id",
        "hset",
        "keys",
        F.posexplode("keys").alias("band", "bkey"),
    )


def _as_index(static_docs: DataFrame) -> DataFrame:
    return featurize_rowwise(static_docs).select(
        F.col("doc_id").alias("static_doc"),
        F.col("hset").alias("static_hset"),
        F.col("keys").alias("static_keys"),
        "band",
        "bkey",
    )


def build_static_index(static_docs: DataFrame) -> DataFrame:
    """Featurize the static corpus once and persist the result.

    A stream-static join re-executes the static side's plan every
    micro-batch; over an unpersisted corpus that means re-hashing every
    static document per batch. Callers with a long-lived query build
    this index once and pass it to ``near_dup_matches`` /
    ``start_admission_stream``; at 100 TB the same frame is what you
    would write out as the corpus's band-index table. Caller owns the
    persist (unpersist when the query stops).

    The persist is materialized EAGERLY here (one count action), in
    the calling batch context, not lazily by the first consumer: a
    lazily-persisted index whose first materialization happens inside
    a streaming micro-batch (AQE is disabled there) is cached with the
    streaming run's partitioning, and a later BATCH query whose plan
    cache-hits the same index can then fail its sort-merge zip with
    "Can't zip RDDs with unequal numbers of partitions" under AQE —
    observed in the composed-ingest e2e test. Eager batch-side
    materialization also keeps the index build cost out of the first
    micro-batch's latency.
    """
    index = _as_index(static_docs).persist()
    index.count()
    return index


def near_dup_matches(
    incoming: DataFrame,
    static_docs: DataFrame,
    static_index: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, static_doc, jaccard) for every incoming doc within
    ``JACCARD_THRESHOLD`` of a static-corpus doc.

    ``incoming`` may be a streaming frame (the intended use) or a batch
    frame (tests pin batch ≡ stream); ``static_docs`` must be batch.
    Pass ``static_index`` (from ``build_static_index``) to avoid
    re-featurizing the corpus per micro-batch. Exactly one row per
    matched pair (first-shared-band rule). Self matches (same doc_id)
    are excluded so an already-admitted corpus can screen its own
    re-deliveries.
    """
    stream_side = featurize_rowwise(incoming)
    static_side = static_index if static_index is not None else _as_index(static_docs)
    joined = stream_side.join(static_side, ["band", "bkey"]).filter(
        F.col("doc_id") != F.col("static_doc")
    )
    # first-shared-band rule: drop the row if any EARLIER band key also
    # matches (that row emits the pair instead) — stateless pair dedup.
    earlier_match = F.exists(
        F.zip_with(
            F.slice(F.col("keys"), 1, F.col("band")),
            F.slice(F.col("static_keys"), 1, F.col("band")),
            lambda a, b: a == b,
        ),
        lambda x: x,
    )
    return (
        joined.filter(~earlier_match)
        .withColumn("jaccard", jaccard(F.col("hset"), F.col("static_hset")))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_id", "static_doc", "jaccard")
    )


def admit_new_docs(
    incoming: DataFrame,
    static_docs: DataFrame,
    static_index: DataFrame | None = None,
) -> DataFrame:
    """The screening filter: incoming docs with NO near-dup in the
    static corpus (left-anti against the matches).

    BATCH frames only: with a streaming ``incoming`` this left-anti
    would be a stream-stream join on a derived stream (illegal in
    append mode without watermarks). Streaming ingest goes through
    ``start_admission_stream``, which runs this same function on each
    micro-batch inside ``foreachBatch`` — the standard Structured
    Streaming shape for per-batch batch-semantics filtering.
    """
    matches = near_dup_matches(incoming, static_docs, static_index)
    # The anti-join's right side derives from ``incoming`` itself (a
    # self-referential plan). Under AQE, when ``incoming`` is a UNION,
    # Spark 4.1's exchange reuse across the two occurrences can zip a
    # reused 8-partition exchange against the 24-partition pre-shuffle
    # union and fail with "Can't zip RDDs with unequal numbers of
    # partitions" (reproduced in tests/test_ingest_e2e.py's composed
    # pipeline). Snapshotting the matched-id set — a near-dup id list,
    # bounded by the incoming batch — breaks the shared subtree; the
    # matches plan still executes exactly once.
    matched_ids = matches.select("doc_id").localCheckpoint(eager=False)
    return incoming.join(matched_ids, "doc_id", "left_anti")


def start_admission_stream(
    stream_docs: DataFrame,
    static_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Screen a document stream against the static corpus and append
    the admitted docs to a parquet table. Returns the StreamingQuery.

    foreachBatch gives each micro-batch full batch semantics (the
    left-anti join) while the checkpoint preserves at-least-once
    delivery; the parquet append is idempotent-enough for a dedup sink
    because re-admitted duplicates are, by construction, docs the
    static index does not consider near-dups.

    The static band index is built and persisted ONCE here — without
    it, every micro-batch would re-hash the whole static corpus when
    the stream-static join re-executes the static side's plan.
    """
    index = build_static_index(static_docs)

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        admitted = admit_new_docs(batch_df, static_docs, index)
        admitted.write.mode("append").parquet(out_dir)

    return (
        stream_docs.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def curate_batch(
    incoming: DataFrame,
    static_docs: DataFrame,
    static_index: DataFrame | None = None,
) -> DataFrame:
    """Batch-semantics curation screen: quality rule gate THEN near-dup
    screen — the streaming face of ``curate_corpus``'s first two
    stages, built from the SAME rule evaluator
    (llm/quality_rules.py::quality_rule_flags) and the same band index
    as the batch pipeline, so stream and batch admission can never
    drift.

    Rule gate first: it is a map-only projection, so every document it
    drops never reaches the (comparatively expensive) near-dup band
    join — the cheap-filter-first ordering curate_corpus uses.
    """
    from cdc_cascade_spark.llm.quality_rules import quality_rule_flags

    kept_ids = quality_rule_flags(incoming).filter(F.col("keep")).select("doc_id")
    passed = incoming.join(kept_ids, "doc_id", "left_semi")
    return admit_new_docs(passed, static_docs, static_index)


def start_curation_admission_stream(
    stream_docs: DataFrame,
    static_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Quality-gated near-dup admission for a document stream: each
    micro-batch is rule-gated and screened against the static corpus
    index, admitted docs append to parquet. Same foreachBatch /
    persisted-index shape as ``start_admission_stream``."""
    index = build_static_index(static_docs)

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        admitted = curate_batch(batch_df, static_docs, index)
        admitted.write.mode("append").parquet(out_dir)

    return (
        stream_docs.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
