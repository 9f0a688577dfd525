"""Chunked-retrieval evaluation: does retrieving over overlapping
token-window CHUNKS recover the same documents as retrieving over
whole documents?

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension), the
eval face of the retrieval family: RAG stacks index chunks (bounded
context windows), not documents, and the standing design question is
what that costs in document-level recall. This operator answers it
with the repo's own verified pieces: the whole-document ground truth
is the registered ``bm25_topk`` list; the chunked side indexes the
``doc_chunks`` windows (same ``CHUNK_SIZE``/``CHUNK_STRIDE``
arithmetic from llm/packing.py) as BM25 units, scores each chunk
with the SAME weight expression (:func:`~cdc_cascade_spark.llm.bm25.
term_weight_ppb` — one shared tree, so the scorers provably cannot
drift), rolls chunks up to documents by best-chunk score (the
standard max-pooling retrieval convention), and reports per-query
overlap@k:

    (qid, n_whole, n_chunked, n_hits, recall_ppm)

``recall_ppm = n_hits · 1e6 div n_whole`` — the ann_recall_report
idiom, exact integers end to end.

Chunk-side BM25 semantics (documented choices):

- Index units are chunks: df counts CHUNKS containing the term,
  dl is the chunk length, and the corpus scalars are (n_units,
  Σ chunk length) — the natural statistics of a chunk index.
- Chunks are built over the FILTERED token stream (non-empty tokens,
  the llm/prep.py discipline) so both sides tokenize identically;
  llm/packing.doc_chunks keeps raw positions instead because its
  output is a layout, not a scorer input.
- A query's own document is excluded chunk-and-all (doc-level
  self-exclusion, matching the whole-doc side).
- Doc score = MAX over its chunk scores (exact BIGINT max —
  order-free); the top-k cut orders by (best_ppb DESC, doc_id ASC).

Determinism: the per-(term, chunk) weight is the shared fixed IEEE
expression tree over exact integers with constants interpolated from
the same Python floats into both engines; per-chunk scores are sums
of ppb BIGINTs; max/top-k cuts run on integer total orders. No floats
cross rows anywhere.

Scale shape (100 TB): the same broadcast inverted-index probe as
bm25_topk with one extra map-side explode — the token stream grows by
~CHUNK_SIZE/CHUNK_STRIDE (1.33x here) before the broadcast query-term
filter drops it to postings, so nothing corpus-sized ever shuffles;
chunk tf/df aggregate over postings only, and the rollup/top-k run
over ≤ |postings| rows. A standing deployment persists the chunk
postings bucketed by term (the llm/bm25_index.py layout with
(doc_id, chunk_id) unit keys); this is its ad-hoc variant. The eval
itself is O(n·Q) with the fixed Q_CAP workload — the fixed-Q lesson
from the r9 verdict, applied from birth.

Registered in r10, same round as built (the registration-pipeline
discipline). tests/test_chunkeval.py pins oracle parity at two SFs, a
pure-Python chunked-BM25 model on a crafted corpus, and the broadcast
probe plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.bm25 import (
    _TOKS,
    Q_CAP,
    QUERY_MOD,
    QUERY_TERMS,
    TOPK,
    ORACLE_BM25,
    bm25_topk,
    eval_query_terms,
    term_weight_ppb,
    tokenized_base,
    weight_sql,
)
from cdc_cascade_spark.llm.packing import CHUNK_SIZE, CHUNK_STRIDE

PPM = 1_000_000


def chunk_units_frame(base: DataFrame) -> DataFrame:
    """``(doc_id, chunk_id, ctoks, cdl)`` overlapping token windows of
    a ``(doc_id, toks, dl)`` frame — the doc_chunks window arithmetic
    (llm/packing.py) over the filtered token stream."""
    n = F.col("dl")
    n_chunks = F.when(n <= CHUNK_SIZE, F.lit(1)).otherwise(
        F.expr(f"(dl - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE}")
        + 1
    )
    ch = base.select(
        "doc_id",
        "toks",
        "dl",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.least(
        F.col("chunk_id") * CHUNK_STRIDE,
        F.greatest(F.col("dl") - CHUNK_SIZE, F.lit(0)),
    )
    end = F.least(start + CHUNK_SIZE, F.col("dl"))
    return ch.select(
        "doc_id",
        "chunk_id",
        F.slice("toks", start + 1, end - start).alias("ctoks"),
        (end - start).cast("bigint").alias("cdl"),
    )


def chunk_topk_from_postings(
    tf: DataFrame, qterms: DataFrame, stats: DataFrame
) -> DataFrame:
    """The shared chunk-level scorer: rank ``TOPK`` DOCUMENTS per
    query from a chunk postings relation — the
    :func:`~cdc_cascade_spark.llm.bm25.topk_from_postings` analogue
    with (doc, chunk) index units and best-chunk max-pooling.

    ``tf`` must hold one row per (chunk, query term) the chunk
    contains — ``(doc_id, chunk_id, dl, term, tf)`` with ``dl`` the
    CHUNK length — covering every corpus chunk with the term (df is
    the per-term row count); ``stats`` is the 1-row
    ``(n_docs, sum_dl)`` frame over chunks. Both the ad-hoc face
    (:func:`chunked_topk_frame`) and the persistent-index probe
    (llm/chunk_index.py) feed this one function, which is what makes
    probe ≡ direct provable row-for-row.

    Plan shape (r17-opt, guide §2.4 — the topk_from_postings
    rationale): df is a COUNT window over ``tf`` (one pass; the former
    groupBy+broadcast-rejoin re-ran the pruned-scan subtree on the
    probe path), computed BEFORE the qterms join so a term shared by
    several queries is not double-counted; one explicit qid
    repartition is the single exchange the per-chunk sum, the per-doc
    max AND the rank window all ride (hash partitioning on qid
    satisfies every downstream clustering). Postings are
    query-workload-sized, never corpus-sized."""
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("term")))
        .join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .crossJoin(F.broadcast(stats))
        .select("qid", "doc_id", "chunk_id", term_weight_ppb().alias("term_ppb"))
    )
    per_chunk = (
        scored.repartition("qid")
        .groupBy("qid", "doc_id", "chunk_id")
        .agg(F.sum("term_ppb").alias("score_ppb"))
    )
    per_doc = per_chunk.groupBy("qid", "doc_id").agg(
        F.max("score_ppb").alias("best_ppb")
    )
    w = W.partitionBy("qid").orderBy(F.desc("best_ppb"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("qid", "doc_id", "best_ppb", "rank")
    )


def chunked_topk_frame(docs: DataFrame) -> DataFrame:
    """Chunk-indexed BM25 document top-k: score chunks as index units,
    max-pool to documents — ``(qid, doc_id, best_ppb, rank)``."""
    base = tokenized_base(docs)
    qterms = eval_query_terms(base)
    qterm_set = qterms.select("term").distinct()

    units = chunk_units_frame(base)
    stats = units.agg(
        F.count(F.lit(1)).alias("n_docs"),  # index units (chunks)
        F.sum("cdl").alias("sum_dl"),
    )
    tok = units.select(
        "doc_id", "chunk_id", F.col("cdl").alias("dl"),
        F.explode("ctoks").alias("term"),
    )
    postings = tok.join(F.broadcast(qterm_set), "term")
    # Since r17-opt chunk_topk_from_postings consumes tf exactly ONCE
    # (df is a count window, not a rejoin), so the former lineage
    # snapshot is gone; the explicit term repartition is the single
    # exchange the tf aggregation AND the scorer's df window both
    # ride. Postings are query-workload-sized — bounded by the corpus
    # tokens matching the ≤ Q_CAP·QUERY_TERMS query terms, never the
    # corpus — the same relation the persistent index materializes.
    tf = (
        postings.repartition("term")
        .groupBy("doc_id", "chunk_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return chunk_topk_from_postings(tf, qterms, stats)


def chunk_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query overlap@k of chunk-indexed BM25 vs whole-document
    BM25: ``(qid, n_whole, n_chunked, n_hits, recall_ppm)``."""
    docs = load_table(spark, sf_dir, "documents")
    # The two retrievals are independent corpus passes that previously
    # planned and ran inside one serial action (8-vs-32-core scaling
    # ratio 1.01 — fixed cost, not compute). Materialize them from a
    # thread pool (r18-opt, guide §2.6) so the two jobs and their
    # Catalyst analysis overlap. (r17 measured an UN-pooled checkpoint
    # variant slower — the materialization barriers serialized the two
    # retrievals; the pool is what removes that serialization.)
    from cdc_cascade_spark.functions.concurrent import run_concurrently

    def _mk_whole() -> DataFrame:
        return (
            bm25_topk(spark, sf_dir)
            .select("qid", "doc_id")
            .localCheckpoint(eager=True)
        )

    def _mk_chunked() -> DataFrame:
        return (
            chunked_topk_frame(docs)
            .select("qid", "doc_id")
            .localCheckpoint(eager=True)
        )

    whole, chunked = run_concurrently(_mk_whole, _mk_chunked)

    # Overlap rollup as ONE pass over the tagged union (r17-opt, guide
    # §2.4): the former tn/an/hits triple consumed each list twice, so
    # BOTH full retrieval subtrees (corpus tokenize + postings + score
    # + rank) were re-planned and re-executed per consumer — the
    # baseline plan carried 50 Exchanges / 8 window passes. Each
    # (qid, doc_id) appears at most once per list, so per-pair sums of
    # the side tags recover membership exactly: n_whole = Σ w_tag,
    # n_chunked = Σ c_tag, n_hits = |pairs on both sides| — identical
    # to the old left-join arithmetic (qids restricted to the
    # whole-side driver, missing counts 0). One exchange, each
    # retrieval consumed once.
    tagged = whole.select(
        "qid", "doc_id", F.lit(1).alias("w"), F.lit(0).alias("c")
    ).unionByName(
        chunked.select(
            "qid", "doc_id", F.lit(0).alias("w"), F.lit(1).alias("c")
        )
    )
    per_pair = (
        tagged.repartition("qid")
        .groupBy("qid", "doc_id")
        .agg(F.max("w").alias("in_w"), F.max("c").alias("in_c"))
    )
    return (
        per_pair.groupBy("qid")
        .agg(
            F.sum("in_w").cast("bigint").alias("n_whole"),
            F.sum("in_c").cast("bigint").alias("n_chunked"),
            F.sum(F.col("in_w") * F.col("in_c")).cast("bigint").alias("n_hits"),
        )
        .filter(F.col("n_whole") > 0)
        .select(
            "qid",
            "n_whole",
            "n_chunked",
            "n_hits",
            F.expr(f"(n_hits * {PPM}) div n_whole")
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


# Standalone chunked top-k document list — ``(qid, doc_id, rank)`` —
# the oracle twin of :func:`chunked_topk_frame`, exposed separately so
# composing oracles (llm/retrieval_summary.py) state the SAME chunked
# list this eval was verified against.
CHUNKED_LIST_SQL = f"""
WITH cbase AS (
  SELECT doc_id, {_TOKS} AS toks, len({_TOKS})::BIGINT AS dl
  FROM documents
),
cq AS (
  SELECT DISTINCT doc_id AS qid,
         unnest(list_slice(toks, 1, {QUERY_TERMS})) AS term
  FROM cbase
  WHERE doc_id % {QUERY_MOD} = 0 AND doc_id < {QUERY_MOD * Q_CAP}
),
units AS (
  SELECT doc_id, toks, dl, unnest(range(
           CASE WHEN dl <= {CHUNK_SIZE} THEN 1
                ELSE (dl - {CHUNK_SIZE} + {CHUNK_STRIDE} - 1)
                     // {CHUNK_STRIDE} + 1 END)) AS chunk_id
  FROM cbase
),
usp AS (
  SELECT doc_id, chunk_id,
         toks[least(chunk_id * {CHUNK_STRIDE},
                    greatest(dl - {CHUNK_SIZE}, 0)) + 1
              : least(least(chunk_id * {CHUNK_STRIDE},
                            greatest(dl - {CHUNK_SIZE}, 0))
                      + {CHUNK_SIZE}, dl)] AS ctoks,
         (least(least(chunk_id * {CHUNK_STRIDE},
                      greatest(dl - {CHUNK_SIZE}, 0))
                + {CHUNK_SIZE}, dl)
          - least(chunk_id * {CHUNK_STRIDE},
                  greatest(dl - {CHUNK_SIZE}, 0)))::BIGINT AS cdl
  FROM units
),
cstats AS (
  SELECT COUNT(*)::BIGINT AS n_units, SUM(cdl)::BIGINT AS sum_cdl
  FROM usp
),
ctok AS (
  SELECT doc_id, chunk_id, cdl, unnest(ctoks) AS term FROM usp
  WHERE len(ctoks) > 0
),
ctf AS (
  SELECT doc_id, chunk_id, cdl, term, COUNT(*)::BIGINT AS tf
  FROM ctok
  WHERE term IN (SELECT term FROM cq)
  GROUP BY 1, 2, 3, 4
),
cdf AS (SELECT term, COUNT(*)::BIGINT AS df FROM ctf GROUP BY 1),
cscored AS (
  SELECT cq.qid, ctf.doc_id, ctf.chunk_id,
         {weight_sql("s.n_units", "cdf.df", "ctf.tf", "ctf.cdl", "s.sum_cdl")}
           AS term_ppb
  FROM ctf
  JOIN cq ON ctf.term = cq.term AND ctf.doc_id <> cq.qid
  JOIN cdf ON cdf.term = ctf.term
  CROSS JOIN cstats s
),
cchunk AS (
  SELECT qid, doc_id, chunk_id, SUM(term_ppb)::BIGINT AS score_ppb
  FROM cscored GROUP BY 1, 2, 3
),
cdoc AS (
  SELECT qid, doc_id, MAX(score_ppb)::BIGINT AS best_ppb
  FROM cchunk GROUP BY 1, 2
)
SELECT qid, doc_id, CAST(rnk AS INTEGER) AS rank FROM (
  SELECT qid, doc_id, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY best_ppb DESC, doc_id ASC) AS rnk
  FROM cdoc
) WHERE rnk <= {TOPK}
"""


ORACLE_CHUNK_EVAL = f"""
WITH whole_full AS (
  {ORACLE_BM25}
),
whole AS (
  SELECT qid, doc_id FROM whole_full
),
chunked AS (
  SELECT qid, doc_id FROM ({CHUNKED_LIST_SQL})
),
tn AS (SELECT qid, COUNT(*)::BIGINT AS n_whole FROM whole GROUP BY qid),
an AS (SELECT qid, COUNT(*)::BIGINT AS n_chunked FROM chunked GROUP BY qid),
hits AS (
  SELECT w.qid, COUNT(*)::BIGINT AS n_hits
  FROM whole w JOIN chunked c ON w.qid = c.qid AND w.doc_id = c.doc_id
  GROUP BY w.qid
)
SELECT tn.qid, tn.n_whole,
       COALESCE(an.n_chunked, 0)::BIGINT AS n_chunked,
       COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
       ((COALESCE(h.n_hits, 0) * {PPM}) // tn.n_whole)::BIGINT AS recall_ppm
FROM tn
LEFT JOIN an ON an.qid = tn.qid
LEFT JOIN hits h ON h.qid = tn.qid
"""


QUERIES: dict[str, tuple] = {
    "chunk_retrieval_eval": (chunk_retrieval_eval, ORACLE_CHUNK_EVAL),
}
