"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / frame-sampling run as
Arrow-batched Pandas functions over ``mapInPandas``. The image/audio
decode libraries are NOT in this container, so the real decode step is
a clearly-marked stub (``decode_media`` raises ``NotImplementedError``)
— everything around it (schema, batching, partitioning, UDF signature,
deterministic fake feature extraction) is real and tested.

Scale: ``mapInPandas`` streams Arrow batches through Python — per-batch
overhead is amortized, payload bytes never hit the driver, and the
operation is map-only (no shuffle). On a real cluster, partition sizing
(``spark.sql.files.maxPartitionBytes``) bounds the per-task byte volume.

The testdata has no binary tables, so blobs are synthesized
deterministically from ``documents.text`` (UTF-8 bytes) — the point is
the Spark-side machinery, not the codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

MEDIA_FORMATS = ["png", "jpeg", "webp"]
FRAME_BYTES = 64  # fake "video": one frame per 64-byte chunk
FRAME_SAMPLE_EVERY = 4
N_FEATURES = 4


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload + typed metadata struct.

    The metadata mirrors what a real ingest would carry (format, dims,
    byte size); the payload is the UTF-8 text bytes standing in for
    encoded media.
    """
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in MEDIA_FORMATS]),
        (F.col("doc_id") % len(MEDIA_FORMATS) + 1).cast("int"),
    )
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        blob.alias("payload"),
        F.struct(
            fmt.alias("format"),
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            F.length(blob).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_media(fmt: str, payload: bytes) -> object:
    """Decode an encoded media payload to pixels/samples.

    STUB: real decoding needs PIL/ffmpeg/soundfile, none of which are
    in this container. The Spark-side plumbing calls this only behind
    ``fake=False``.
    """
    raise NotImplementedError(
        f"media decode for format={fmt!r} requires codec libraries "
        "(PIL/ffmpeg) not present in this environment"
    )


def _fake_feature(payload: bytes, j: int) -> float:
    """Deterministic stand-in for a learned feature: md5-derived in [0,1).

    Uses UPPERCASE hex to match DuckDB's hex() casing in the oracle.
    """
    h = hashlib.md5(payload.hex().upper().encode() + b":" + str(j).encode()).hexdigest()
    return (int(h[:15], 16) % 1000) / 1000.0


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    The real path would decode and run a vision model per batch; the
    fake path computes the md5-derived features so the full
    mapInPandas machinery (schema contract, batch iteration, binary
    transport through Arrow) is exercised and oracle-checkable.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["decoded"] = [
                    decode_media(m["format"], p)
                    for m, p in zip(pdf["media_meta"], pdf["payload"])
                ]
            out = pd.DataFrame({"doc_id": pdf["doc_id"]})
            for j in range(N_FEATURES):
                out[f"f{j}"] = [
                    _fake_feature(bytes(p), j) for p in pdf["payload"]
                ]
            yield out

    schema = "doc_id long, " + ", ".join(f"f{j} double" for j in range(N_FEATURES))
    return media.mapInPandas(extract, schema=schema)


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata + payload digest per media row (pure built-ins)."""
    media = with_media_columns(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.ceil(F.col("media_meta.n_bytes") / FRAME_BYTES).alias("n_frames"),
    )


ORACLE_METADATA = f"""
SELECT doc_id,
       ['png', 'jpeg', 'webp'][(doc_id % 3 + 1)::INTEGER] AS format,
       (doc_id % 640 + 16)::INTEGER AS width,
       (doc_id % 480 + 16)::INTEGER AS height,
       octet_length(encode(text))::INTEGER AS n_bytes,
       md5(text) AS payload_md5,  -- text is the blob's UTF-8 source
       CAST(ceil(octet_length(encode(text))::DOUBLE / {FRAME_BYTES}) AS BIGINT) AS n_frames
FROM documents
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (the Pandas-UDF slow path, made
    deterministic so the oracle can verify the full Arrow round-trip)."""
    media = with_media_columns(load_table(spark, sf_dir, "documents"))
    return extract_features(media, fake=True)


def _features_oracle() -> str:
    cols = ", ".join(
        "CAST('0x' || substr(md5(hex(encode(text)) || ':' || "
        f"'{j}'), 1, 15) AS BIGINT) % 1000 / 1000.0 AS f{j}"
        for j in range(N_FEATURES)
    )
    return f"SELECT doc_id, {cols} FROM documents"


ORACLE_FEATURES = _features_oracle()


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for "video" payloads: every 4th 64-byte frame.

    Built-in array ops only: chunk the transcript, sample frames,
    aggregate per document — the Spark shape of a video-frame sampler
    (decode stubbed; chunk/sample/aggregate real).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / FRAME_BYTES).cast("int")
    frame_idx = F.sequence(F.lit(0), n_frames - 1)
    sampled = F.filter(frame_idx, lambda i: i % FRAME_SAMPLE_EVERY == 0)
    # ascii of each sampled frame's first character
    first_chars = F.transform(
        sampled, lambda i: F.ascii(F.substring(F.col("text"), i * FRAME_BYTES + 1, 1))
    )
    return docs.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.size(sampled).alias("n_sampled"),
        F.aggregate(first_chars, F.lit(0), lambda a, x: a + x).alias(
            "sampled_checksum"
        ),
    )


ORACLE_FRAME_SAMPLE = f"""
WITH f AS (
  SELECT doc_id, text,
         CAST(ceil(length(text)::DOUBLE / {FRAME_BYTES}) AS INTEGER) AS n_frames
  FROM documents
)
SELECT doc_id, n_frames,
       len(list_filter(range(0, n_frames), i -> i % {FRAME_SAMPLE_EVERY} = 0))::INTEGER AS n_sampled,
       CAST(list_sum(list_transform(
         list_filter(range(0, n_frames), i -> i % {FRAME_SAMPLE_EVERY} = 0),
         i -> ascii(substr(text, (i * {FRAME_BYTES} + 1)::INTEGER, 1)))) AS INTEGER) AS sampled_checksum
FROM f
"""


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content digest — the first pass every
    multimodal training pipeline runs (identical encoded payloads are
    rampant in web crawls: re-hosted images, mirrored files).

    Groups payloads by (md5(bytes), byte length); duplicate groups
    report the kept representative (min doc_id) and the bytes a
    dedup pass reclaims: (content_key, n_bytes, n_copies, keep_doc_id,
    bytes_reclaimed). Near-dup (perceptual-hash) media dedup needs the
    stubbed decode step (``decode_media``) — content-digest dedup is
    the codec-free subset that works on any opaque blob.

    Scale: one shuffle carrying (32-byte digest, 8-byte id) per blob —
    payload bytes never shuffle; the digest projection is map-side
    JVM md5 over the binary column.

    Oracle note: DuckDB's ``md5`` accepts VARCHAR only; the synthetic
    payload IS the UTF-8 encoding of ``text`` (``with_media_columns``),
    and md5 over a VARCHAR hashes its UTF-8 bytes, so ``md5(text)``
    reproduces Spark's ``md5(payload)`` digest exactly.

    Registered in r8 (built in r7 after that round's driver window was
    committed); tests/test_multimodal_dedup.py pins the duplicate-group
    semantics alongside the oracle row.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # The synthetic corpus has no byte-identical payloads at sf<=0.01,
    # so — the pii_redaction precedent — every 20th document's payload
    # is deterministically replaced by one of three shared blobs so the
    # duplicate-group path is really exercised at every SF (the
    # remaining docs keep their real payloads and any genuine dups
    # among them are still found, e.g. 8 groups at sf0.1).
    injected = F.when(
        F.col("doc_id") % 20 == 0,
        F.concat(F.lit("shared-blob-"), (F.col("doc_id") % 3).cast("string")),
    ).otherwise(F.col("text"))
    media = with_media_columns(docs.select("doc_id", injected.alias("text")))
    return (
        media.select(
            "doc_id",
            F.md5(F.col("payload")).alias("content_key"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("content_key", "n_bytes")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "content_key",
            "n_bytes",
            "n_copies",
            "keep_doc_id",
            ((F.col("n_copies") - 1) * F.col("n_bytes")).alias("bytes_reclaimed"),
        )
    )


ORACLE_MULTIMODAL_DEDUP = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 20 = 0
              THEN 'shared-blob-' || CAST(doc_id % 3 AS VARCHAR)
              ELSE text END AS blob_text
  FROM documents
), keyed AS (
  SELECT doc_id,
         md5(blob_text) AS content_key,
         CAST(octet_length(encode(blob_text)) AS BIGINT) AS n_bytes
  FROM m
)
SELECT content_key, n_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(doc_id) AS keep_doc_id,
       CAST((COUNT(*) - 1) * n_bytes AS BIGINT) AS bytes_reclaimed
FROM keyed
GROUP BY content_key, n_bytes
HAVING COUNT(*) > 1
"""


QUERIES: dict[str, tuple] = {
    "multimodal_metadata": (multimodal_metadata, ORACLE_METADATA),
    "multimodal_features": (multimodal_features, ORACLE_FEATURES),
    "multimodal_frame_sample": (multimodal_frame_sample, ORACLE_FRAME_SAMPLE),
    "multimodal_dedup": (multimodal_dedup, ORACLE_MULTIMODAL_DEDUP),
}
