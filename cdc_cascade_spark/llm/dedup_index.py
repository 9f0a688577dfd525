"""Persistent MinHash near-dup index: build → append → probe.

The production near-dup workload at 100 TB is rarely "dedup a static
corpus once"; it is *daily ingest*: a new batch of documents arrives
and must be checked against the existing corpus — WITHOUT recomputing
the corpus's signatures, and without shuffling the corpus. This module
is the MinHash analog of the bucketed-ANN index lifecycle in
``llm/similarity.py`` (``write_lsh_bucketed`` / ``append_lsh_bucketed``):

- ``write_minhash_index``: one pass over the documents table
  materializes the index — the (doc_id, band, bkey) LSH band relation
  (partitioned by band on disk) plus the (doc_id, hset) shingle-set
  feature relation needed for exact-Jaccard verification. This is the
  standard "materialize the feature set" step; the payload is ~4 band
  rows (8-byte id + 32-byte key) + ~50 longs per document, orders of
  magnitude smaller than the text it summarizes.
- ``append_minhash_index``: computes the SAME signatures for a new
  batch and appends its band/feature rows — incremental daily ingest;
  the existing index files are never rewritten (parquet append), and
  a test pins append-then-probe ≡ rebuild-then-probe.
- ``dedup_against_index``: the probe. New-batch band keys are tiny
  relative to the corpus, so BOTH corpus-side joins broadcast the
  batch side: the index band scan is probed map-side (BroadcastHashJoin
  — the corpus NEVER shuffles), candidate corpus ids prune the feature
  scan the same way, and exact Jaccard verifies only the candidates.
  Total corpus-side cost: two column-pruned scans + map-side hash
  probes; state and shuffles are O(batch + candidates), independent of
  corpus size. Within-batch duplicates are deliberately out of scope —
  run ``dedup_minhash_lsh`` over the batch alone for those; this
  operator answers "is any of today's docs already in the corpus?".

Maintenance protocol (r16 — the bm25_index protocol, shared code):
rebuilds write ``features.compact``/``bands.compact`` and swap both
under the fsynced ``_REBUILD_SWAP`` commit record inside the
claim/sentinel two-flag exclusion (``bm25_index._run_rebuild``), so a
FAILED rebuild leaves the old index serving and a CRASHED swap rolls
forward under :func:`recover_minhash_index`; appends hold a writer
claim (refused while maintenance runs, excluded from a starting
rebuild); probes refuse under a held sentinel and run the promote-only
read repair first. Replay semantics: an at-least-once re-append of the
same batch lands byte-duplicate rows on disk (parquet append keeps
O(batch) cost — no read-modify-write); probes are IMMUNE — candidate
pairs are ``distinct`` and the verification side dedups per corpus doc
at candidate scope — and a rebuild (this index's compaction) squashes
the disk duplicates away. Crash order: an append writes features THEN
bands, so a mid-append crash leaves a featurized doc with no band rows
— invisible to candidacy (never a wrong answer); the batch's replay
re-appends both relations.

See docs/index_maintenance_protocol.md for the operator runbook.

Oracle-gate exclusion: like the bucketed-ANN lifecycle, the semantics
here are a path-dependent physical layout (parquet index directory,
incremental appends), which a single ANSI statement over the raw tables
cannot mirror. The correctness gate is equivalence-to-batch: tests pin
that build+probe reproduces exactly the cross-batch subset of the
registered (oracle-checked) ``dedup_minhash_lsh`` answer on the unioned
corpus, and that append ≡ rebuild.

Reference scope note: the reference engine (tr1sm0s1n/cdc-cascade) has
no near-dup surface at all — this is part of the beyond-reference
LLM-pipeline extension inventoried in SURVEY.md §2 / COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.llm.bm25_index import (
    _append_guard,
    _check_not_compacting,
    _repair_for_read,
    _run_rebuild,
    recover_compaction,
)
from cdc_cascade_spark.llm.dedup import (
    JACCARD_THRESHOLD,
    _lsh_band_structs,
    _minhash_sig_aggs,
)
from cdc_cascade_spark.llm.prep import jaccard, shingle_hash_set, tokens

# the layout's full artifact pair — swapped together under one commit
# record, exactly like bm25's (postings, stats)
_PAIR = ("features", "bands")


def _batch_features(docs: DataFrame) -> DataFrame:
    """(doc_id, hset) shingle-hash feature rows for a documents frame
    (same featurization as ``dedup._docs_prepared``, minus the blocking
    key the index does not need)."""
    return docs.select(
        "doc_id", shingle_hash_set(tokens(F.col("text"))).alias("hset")
    )


def _batch_bands(features: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) MinHash LSH band rows from feature rows —
    the same 16 codegen'd signature minima + 4 band keys as the
    registered ``dedup_minhash_lsh`` (shared expression helpers), so
    index rows and in-flight batch rows can never disagree."""
    sigs = (
        features.select("doc_id", F.explode("hset").alias("h"))
        .groupBy("doc_id")
        .agg(*_minhash_sig_aggs())
    )
    return sigs.select(
        "doc_id", F.explode(F.array(*_lsh_band_structs())).alias("b")
    ).select("doc_id", "b.band", "b.bkey")


def write_minhash_index(docs: DataFrame, out_path: str) -> None:
    """Build (or REBUILD — this index's compaction) the on-disk index
    from a (doc_id, text, ...) corpus frame: band relation under
    ``out_path/bands`` (partitioned by band) and feature relation under
    ``out_path/features``. For the standard tables, pass
    ``load_table(spark, sf_dir, "documents")``.

    Crash-safe and writer-excluded via the shared bm25_index protocol
    (``_run_rebuild`` with this layout's artifact pair): fresh
    ``features.compact``/``bands.compact`` are fully written before
    anything live is touched, then swapped under the fsynced commit
    record — the pre-r16 form was two bare ``mode("overwrite")``
    writes, so a crash between (or inside) them served a silently
    mixed or partial index. A rebuild over the unioned corpus also
    squashes replayed appends' duplicate rows away."""

    def write_compact() -> None:
        feats = _batch_features(docs)
        feats.write.mode("overwrite").parquet(f"{out_path}/features.compact")
        # derive bands from the persisted features so the expensive
        # shingle featurization runs once, not once per relation
        persisted = docs.sparkSession.read.parquet(
            f"{out_path}/features.compact"
        )
        _batch_bands(persisted).write.mode("overwrite").partitionBy(
            "band"
        ).parquet(f"{out_path}/bands.compact")

    _run_rebuild(out_path, write_compact, names=_PAIR)


def append_minhash_index(docs_batch: DataFrame, out_path: str) -> None:
    """Incrementally add a (doc_id, text) batch to an existing index.

    Parquet append only — existing files are untouched, so the append
    cost is O(batch). Caller owns doc_id uniqueness vs the corpus (the
    same contract as ``append_lsh_bucketed``); an at-least-once REPLAY
    of a batch is safe (probe-immune, squashed by the next rebuild —
    module docstring). Holds a writer claim for the append's duration:
    refused while a rebuild runs, and a rebuild cannot start mid-append
    (the two-flag protocol). Features are written BEFORE bands so a
    mid-append crash leaves only candidacy-invisible feature rows."""
    with _append_guard(out_path):
        # eager localCheckpoint: the feature frame feeds two write
        # actions (features, bands); snapshotting it runs the shingle
        # featurization once instead of once per action
        feats = _batch_features(docs_batch).localCheckpoint(eager=True)
        feats.write.mode("append").parquet(f"{out_path}/features")
        _batch_bands(feats).write.mode("append").partitionBy("band").parquet(
            f"{out_path}/bands"
        )


def recover_minhash_index(out_path: str, force: bool = False) -> None:
    """Operator crash repair for this layout — the shared
    :func:`bm25_index.recover_compaction` decision table gated on THIS
    layout's artifact pair (a committed swap rolls forward only when
    both ``features`` and ``bands`` are processed together)."""
    recover_compaction(
        out_path, names=_PAIR, force=force, artifact_pair=_PAIR
    )


def dedup_against_index(
    docs_batch: DataFrame, spark: SparkSession, index_path: str
) -> DataFrame:
    """Near-dup pairs (batch_doc, corpus_doc, jaccard ≥ threshold)
    between a new batch and the indexed corpus.

    The batch side is broadcast into both corpus scans (bands, then
    features), so the corpus never shuffles; only candidates are
    verified. Returns (doc_a=corpus id, doc_b=batch id, jaccard).

    Refuses while maintenance holds the lock sentinel, runs the
    promote-only read repair first (the bm25_index probe discipline),
    and is immune to replayed-append duplicates: candidate pairs are
    ``distinct`` and the corpus verification side dedups per doc at
    CANDIDATE scope (bounded by the batch's matches — the corpus-sized
    relations still never shuffle; replay duplicates are byte-identical
    hsets, so any survivor verifies identically).
    """
    _check_not_compacting(index_path)
    _repair_for_read(index_path, names=_PAIR)
    # lazy localCheckpoint: the batch feature subtree appears on BOTH
    # sides of the plan (band candidacy + verification); truncating its
    # lineage materializes the featurization once on first action and
    # reuses it, instead of re-shingling the batch per consumer
    feats = _batch_features(docs_batch).localCheckpoint(eager=False)
    bands = _batch_bands(feats)
    idx_bands = spark.read.parquet(f"{index_path}/bands")
    cand = (
        idx_bands.join(
            F.broadcast(
                bands.select(
                    F.col("doc_id").alias("doc_b"), "band", "bkey"
                )
            ),
            ["band", "bkey"],
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    idx_feats = spark.read.parquet(f"{index_path}/features")
    corpus_side = (
        idx_feats.join(
            F.broadcast(cand.select("doc_a").distinct()),
            idx_feats["doc_id"] == F.col("doc_a"),
            "left_semi",
        )
        .select(F.col("doc_id").alias("doc_a"), F.col("hset").alias("sh_a"))
        # replay immunity: a re-appended batch duplicates feature rows
        # byte-identically; dedup AFTER the candidate prune so the
        # exchange is candidate-bounded, never corpus-sized
        .dropDuplicates(["doc_a"])
    )
    batch_side = feats.select(
        F.col("doc_id").alias("doc_b"), F.col("hset").alias("sh_b")
    )
    verified = cand.join(corpus_side, "doc_a").join(
        F.broadcast(batch_side), "doc_b"
    )
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return verified.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
