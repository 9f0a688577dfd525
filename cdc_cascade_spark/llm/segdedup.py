"""Duplicated-segment removal (the C4 "three-sentence span" rule,
token-segment form).

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): C4
(Raffel et al. 2020) discards any three-sentence span that occurs more
than once in the corpus, keeping one copy — the classic boilerplate
killer (cookie banners, licence footers, navigation chrome). The
synthetic corpus has no sentence boundaries, so the unit here is a
fixed ``SEGMENT_K``-token non-overlapping segment: each segment's
occurrences are counted corpus-wide, every occurrence except the
GLOBALLY FIRST (min ``(doc_id, position)``) of a duplicated segment is
dropped, and documents are reassembled from their surviving segments.

Determinism contract: segment identity is the md5-based ``token_hash``
(both engines bit-equal); the first-occurrence rule is a total order
(doc_id, then position), so output text is unique. All counts are
exact integers.

Scale shape (100 TB): one explode to the segment relation (corpus
linear, ~1/K rows per token), one groupBy on ``seg_hash`` with
map-side partial aggregation (count + min-struct both combine), one
broadcast-free shuffle back on ``doc_id`` to reassemble. Hot
boilerplate segments are hot KEYS of the count aggregate — partial
aggregation absorbs them map-side, so there is no skewed join
anywhere. The reassembly ``collect_list`` is per-document bounded (a
document's own segments), never corpus-bounded.

Registered in round 8 (built in round 7 after that round's 50-slot
driver window was already committed — see registry.py's r7 window
note). Correctness is pinned by the pure-Python model check and
both-engine agreement tests in tests/test_segdedup.py alongside the
oracle row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash, token_hash_sql
from cdc_cascade_spark.llm.prep import TOKENS_SQL, tokens

SEGMENT_K = 15


def _segments(toks):
    """Non-overlapping SEGMENT_K-token segments (last may be short).

    Guarded for empty token arrays: Spark's ``sequence(0, -1)`` would
    count DOWN (step defaults to -1), not produce an empty range.
    """
    n = F.size(toks)
    n_seg = F.ceil(n / F.lit(SEGMENT_K)).cast("int")
    return F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * SEGMENT_K + 1, SEGMENT_K)),
    )).otherwise(F.array().cast("array<string>"))


def segment_dedup_frame(docs: DataFrame) -> DataFrame:
    """Frame-level duplicated-segment removal over any (doc_id, text)
    frame — the registered query below and the hypothesis property
    tests both call this, so the two surfaces cannot drift."""
    toks = F.filter(tokens(F.col("text")), lambda t: t != "")
    segs = docs.select(
        "doc_id", F.posexplode(_segments(toks)).alias("pos", "seg")
    ).filter(F.col("seg") != "")
    segs = segs.select(
        "doc_id", "pos", "seg", token_hash(F.col("seg")).alias("seg_hash")
    )
    # The segment relation feeds TWO consumers (the occurrence count
    # and the join-back); without a snapshot each consumer re-runs the
    # explode + per-segment md5 — measured 1.57 → 0.95 s warm at
    # sf0.1. The snapshot is corpus-sized, so on a real cluster this
    # is the point to persist(MEMORY_AND_DISK_SER) or checkpoint to
    # storage instead; either way the hashing pass runs once.
    segs = segs.localCheckpoint(eager=False)
    occ = segs.groupBy("seg_hash").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct("doc_id", "pos")).alias("first_occ"),
    )
    marked = segs.join(occ, "seg_hash").select(
        "doc_id",
        "pos",
        "seg",
        (
            (F.col("n_occ") == 1)
            | (
                (F.col("first_occ.doc_id") == F.col("doc_id"))
                & (F.col("first_occ.pos") == F.col("pos"))
            )
        ).alias("kept"),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum((~F.col("kept")).cast("bigint")).alias("n_dropped"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("pos", "seg"))
                        )
                    ),
                    lambda s: s["seg"],
                ),
            ).alias("cleaned_text"),
        )
    )


def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-segment removal: (doc_id, n_segments,
    n_dropped, cleaned_text), where ``cleaned_text`` keeps only
    segments that are unique corpus-wide or are the global first
    occurrence of their duplicate class."""
    return segment_dedup_frame(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


def segdedup_sql(src: str) -> str:
    """The segment-dedup oracle over any relation exposing
    ``(doc_id, text)`` — ``src`` may be a table name or an in-scope CTE
    name. ``ORACLE_SEGMENT_DEDUP`` instantiates it over ``documents``;
    the composed curation oracle (llm/pipeline.py) instantiates it over
    the survivors CTE so the stage SQL is embedded VERBATIM and cannot
    drift from the stand-alone query."""
    return f"""
WITH d AS (
  SELECT doc_id,
         list_filter({TOKENS_SQL.format(x='text')}, t -> t <> '') AS toks
  FROM {src}
), segs0 AS (
  -- per-row ranges can't drive a lateral generate_series in DuckDB;
  -- build the segment list per doc and unnest it instead
  SELECT doc_id,
         unnest(list_transform(
           range(1, CAST(ceil(len(toks) / {SEGMENT_K}.0) AS BIGINT) + 1),
           i -> struct_pack(
             pos := CAST(i - 1 AS INT),
             seg := array_to_string(
               list_slice(toks, (i - 1) * {SEGMENT_K} + 1, i * {SEGMENT_K}),
               ' ')))) AS s
  FROM d
), segs AS (
  SELECT doc_id, s.pos AS pos, s.seg AS seg FROM segs0
), hashed AS (
  SELECT doc_id, pos, seg, {token_hash_sql('seg')} AS seg_hash
  FROM segs WHERE seg <> ''
), occ AS (
  SELECT seg_hash, COUNT(*) AS n_occ,
         MIN(ROW(doc_id, pos)) AS first_occ
  FROM hashed GROUP BY seg_hash
), marked AS (
  SELECT h.doc_id, h.pos, h.seg,
         (o.n_occ = 1 OR (o.first_occ = ROW(h.doc_id, h.pos))) AS kept
  FROM hashed h JOIN occ o USING (seg_hash)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       COALESCE(
         array_to_string(list(seg ORDER BY pos) FILTER (WHERE kept), ' '),
         '') AS cleaned_text
FROM marked
GROUP BY doc_id
"""


ORACLE_SEGMENT_DEDUP = segdedup_sql("documents")


QUERIES: dict[str, tuple] = {
    "segment_dedup": (segment_dedup, ORACLE_SEGMENT_DEDUP),
}
