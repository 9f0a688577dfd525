"""Deterministic corpus ordering for training: global shuffle, shard
writing, and weighted multi-source mixing.

The step between curation and the trainer. Training wants (a) a
pseudorandom *global* document order (adjacent-document correlation
biases gradient estimates), (b) that order split into size-balanced
shards a data loader can stream, and (c) when several corpora feed one
run, a deterministic weighted mix. All three must be REPRODUCIBLE —
same seed, same corpus → byte-identical order — because training-run
provenance depends on it; none of Spark's ``rand()``-based utilities
give that under retries.

Scale shapes:

- ``shuffle_corpus``: order by ``xxhash64(seed, doc_id)`` — a seeded
  hash is a fixed pseudorandom permutation, and sorting by it is
  Spark's native range-partitioned total sort (sample → range
  exchange → per-partition sort). One shuffle, no driver state, no
  ``rand()`` nondeterminism. This is how petabyte corpora are
  shuffled in practice: hash-sort, not Fisher-Yates.
- ``write_training_shards``: shard id = ``pmod(hash, n_shards)`` —
  every shard gets a statistically equal slice regardless of input
  order or skew; ``partitionBy(shard)`` writes one directory per
  shard and rows within a shard land hash-ordered (the data loader
  streams shards independently — exactly the layout distributed
  training readers expect).
- ``mix_corpora``: per-source deterministic Bernoulli admission
  (``hash(seed, source, doc_id) < rate``) is map-only (no shuffle to
  sample), then one global hash-sort interleaves the sources. The
  admission hash is salted with the source name so the same doc_id
  appearing in two sources draws independently.

Oracle-gate exclusion: ordering and file layout are physical-execution
properties a row-set-hashing oracle cannot see (the driver's compare
is deliberately order-insensitive), so these surfaces are test-pinned
instead: determinism across partitionings, seed sensitivity, shard
balance, and exact admission-rate reproduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Admission-rate granularity for mix_corpora: rates are quantized to
# 1/RATE_DENOM so the threshold compare is exact integer arithmetic in
# every engine and on every retry.
RATE_DENOM = 1_000_000


def _order_hash(seed: int, *cols) -> F.Column:
    """Seeded 64-bit order key. xxhash64 is a fixed public function of
    its inputs — the permutation is the same on every executor, every
    retry, every Spark version."""
    return F.xxhash64(F.lit(seed), *cols)


def shuffle_corpus(docs: DataFrame, seed: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic pseudorandom global order over the corpus.

    Returns the input columns plus ``shuffle_key`` (the seeded hash the
    order is defined by), globally sorted by it. Ties are impossible in
    practice (64-bit key) but ``id_col`` breaks them deterministically
    anyway.
    """
    return docs.withColumn(
        "shuffle_key", _order_hash(seed, F.col(id_col))
    ).orderBy("shuffle_key", id_col)


def write_training_shards(
    docs: DataFrame,
    out_path: str,
    n_shards: int,
    seed: int,
    id_col: str = "doc_id",
) -> None:
    """Write the shuffled corpus as ``out_path/shard=<k>/`` parquet
    directories: shard assignment AND within-shard order both derive
    from the seeded hash, so the full layout is a pure function of
    (corpus, seed, n_shards).
    """
    keyed = docs.withColumn("shuffle_key", _order_hash(seed, F.col(id_col)))
    sharded = keyed.withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    )
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_path)
    )


def prepare_training_run(
    spark,
    sf_dir: str,
    out_path: str,
    n_shards: int = 8,
    seed: int = 0,
) -> dict:
    """The full data path, raw table → trainer input: run the curation
    pipeline (``llm/pipeline.py::curate_corpus`` — near-dup collapse,
    quality floor, decontamination, PII redaction, token budget; every
    stage oracle-verified) and write the surviving corpus as
    deterministic, size-balanced training shards.

    Returns a small provenance manifest (counts per shard + the seed),
    because a training run's data must be auditable: re-running with
    the same (tables, seed, n_shards) reproduces the byte-identical
    layout.
    """
    from cdc_cascade_spark.llm.pipeline import curate_corpus

    curated = curate_corpus(spark, sf_dir)
    write_training_shards(curated, out_path, n_shards, seed)
    shards = spark.read.parquet(out_path)
    sizes = {
        int(r.shard): int(r.n)
        for r in shards.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "seed": seed,
        "n_shards": n_shards,
        "rows": sum(sizes.values()),
        "shard_rows": sizes,
    }


def mix_corpora(
    sources: list[tuple[str, DataFrame, float]],
    seed: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted mix of several corpora.

    ``sources`` is ``[(name, frame, rate), ...]`` with each ``rate`` in
    [0, 1]: the fraction of that source to admit (a deterministic
    Bernoulli over ``hash(seed, name, id)``, so admission is exact,
    reproducible, and independent across sources). Output rows carry
    ``source_name`` and the global ``shuffle_key`` that interleaves the
    sources; schemas are unioned by name, and a column missing from
    some source is null-filled in that source's rows (heterogeneous
    corpora — a ``repo`` column only the code corpus has — are the
    normal case for a mix).
    """
    mixed = None
    for name, frame, rate in sources:
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1], got {rate}")
        threshold = int(round(rate * RATE_DENOM))
        admit = (
            F.pmod(_order_hash(seed, F.lit(name), F.col(id_col)), F.lit(RATE_DENOM))
            < threshold
        )
        part = (
            frame.filter(admit)
            .withColumn("source_name", F.lit(name))
            .withColumn(
                "shuffle_key", _order_hash(seed, F.lit(name), F.col(id_col))
            )
        )
        mixed = (
            part
            if mixed is None
            else mixed.unionByName(part, allowMissingColumns=True)
        )
    if mixed is None:
        raise ValueError("mix_corpora needs at least one source")
    return mixed.orderBy("shuffle_key", "source_name", id_col)
