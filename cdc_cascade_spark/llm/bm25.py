"""BM25 lexical retrieval over the ``documents`` corpus.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): the
similarity-search family so far is all *dense* (ann_cosine_topk /
LSH / IVF over the embedding column). Real retrieval stacks pair that
with a *sparse* lexical scorer — BM25 is the standard — for keyword
recall, hybrid ranking, and decontamination lookups (find the training
documents that lexically match an eval query). This module adds that
face: top-k documents per query under the Okapi BM25 weighting, with
the classic inverted-index execution shape re-expressed as DataFrame
joins.

Query workload: the same deterministic eval-sample idiom as
``ann_recall_report`` (llm/recall.py) — every ``QUERY_MOD``-th doc_id,
capped at ``Q_CAP`` queries by a pure-pushdown id bound; each query is
the DISTINCT set of the document's first ``QUERY_TERMS`` tokens, and
the query document itself is excluded from its result list.

Scoring — Okapi BM25 with one deliberate, documented deviation:

    idf_r(t)   = (N - df + 0.5) / (df + 0.5)          [rational idf]
    w(t, d)    = idf_r · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    score(q,d) = Σ_{t ∈ q} round(w(t,d) · 1e9)        [exact ppb sum]

The textbook idf is ``ln(idf_r)``; transcendentals are banned in
registered queries (libm rounding differs across engines — see
operators/relational.py docstring), so the scorer uses the rational
argument directly, the same log-free substitution the engine already
uses for salience (``text_salient_terms``) and PMI→lift
(``bigram_lift``). Ranking quality note: per-term weights stay
positive and monotone in the same df/tf/dl directions as true BM25,
but very rare terms weigh relatively heavier than under the log.

Determinism: every per-term weight is a fixed expression tree over
exact integers (tf, df, dl, N, Σdl) and shared double constants
(k1, b — interpolated from the SAME Python floats into both engines),
evaluated once per (term, doc) — IEEE basic ops are exactly specified,
so both engines produce bit-identical doubles. The only cross-row
reduction is the per-(query, doc) SUM, taken over ppb-scaled BIGINTs
(order-free exact; mirrors recall_ppm in llm/recall.py). The top-k cut
orders by ``(score_ppb DESC, doc_id ASC)`` — integer total order, no
float-ordering hazard at the boundary. int64 headroom: max per-term
ppb weight ≈ 4.4·N·1e9 — safe through N ≈ 1e8 docs per corpus; a
100 TB deployment sums DECIMAL(38,0) instead (same plan shape).

Scale shape (100 TB): this is inverted-index retrieval without
materializing the index — the query term set (≤ Q_CAP·QUERY_TERMS
rows) broadcasts into the exploded token stream, so the corpus-sized
relation is filtered map-side to query-term postings BEFORE any
shuffle; tf/df aggregate over postings only (tiny), and the final
score/topk runs over ≤ |postings| rows. Corpus-wide work is one scan
for the two global scalars (N, Σdl) and one scan for the postings
filter; nothing corpus-sized ever shuffles. A standing query workload
would persist the (term → doc, tf, dl) postings relation bucketed by
term — the plan here is the ad-hoc variant of exactly that layout.

Registered in r10, same round as built (the registration-pipeline
discipline from the r8/r9 verdicts). tests/test_bm25.py pins oracle
agreement at two SFs, a pure-Python BM25 model, the self-exclusion
and rank invariants, and the broadcast plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.prep import TOKENS_SQL, tokens

# Okapi parameters (the standard defaults). Derived constants are
# computed HERE in Python and interpolated into both engines (F.lit on
# the Spark side, repr() into the oracle SQL) so both evaluate the
# exact same doubles — never re-derived independently per engine.
K1 = 1.2
B = 0.75
K1_PLUS_1 = K1 + 1.0
ONE_MINUS_B = 1.0 - B

# Deterministic query workload: every QUERY_MOD-th doc_id, capped at
# Q_CAP queries via the id bound (a pushdown predicate — no ordering
# shuffle, no action); each query = the doc's first QUERY_TERMS
# distinct tokens. 8 queries at every shipped SF (doc_id < 400 exists
# from sf0.001 up).
QUERY_MOD = 50
Q_CAP = 8
QUERY_TERMS = 6

TOPK = 10

# ppb scale for the order-free integer score sum.
PPB = 1_000_000_000.0


def tokenized_base(docs: DataFrame) -> DataFrame:
    """``(doc_id, toks, dl)`` over any ``(doc_id, text)`` frame.

    Non-empty tokens only: a raw \\s+ split of '' is [''] (size 1),
    which would give empty docs dl=1 — the llm/prep.py discipline.
    """
    toks = F.filter(tokens(F.col("text")), lambda t: t != F.lit(""))
    return docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("dl"))


def corpus_stats_frame(base: DataFrame) -> DataFrame:
    """The two corpus scalars ``(n_docs, sum_dl)`` as a 1-row frame —
    the only corpus-wide reduction BM25 needs."""
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )


def eval_query_terms(base: DataFrame) -> DataFrame:
    """The deterministic eval workload: ``(qid, term)`` — each query
    doc's first ``QUERY_TERMS`` distinct tokens, id-bounded so the
    scan is pure pushdown; ≤ Q_CAP·QUERY_TERMS rows."""
    return (
        base.filter(
            (F.col("doc_id") % QUERY_MOD == 0)
            & (F.col("doc_id") < QUERY_MOD * Q_CAP)
        )
        .select(
            F.col("doc_id").alias("qid"),
            F.explode(F.slice("toks", 1, QUERY_TERMS)).alias("term"),
        )
        .distinct()
    )


def term_weight_ppb() -> F.Column:
    """The per-(term, unit) BM25 weight as an exact ppb BIGINT —
    reads columns ``n_docs, df, tf, dl, sum_dl`` of the enclosing
    frame. ONE expression tree shared by every consumer (the ad-hoc
    face, the index probe via :func:`topk_from_postings`, and the
    chunk-retrieval eval in llm/chunkeval.py, whose index units are
    chunks), so the scorers provably cannot drift."""
    n_d = F.col("n_docs").cast("double")
    df_d = F.col("df").cast("double")
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_d
    idf = ((n_d - df_d) + F.lit(0.5)) / (df_d + F.lit(0.5))
    tf_part = (tf_d * F.lit(K1_PLUS_1)) / (
        tf_d
        + F.lit(K1) * (F.lit(ONE_MINUS_B) + (F.lit(B) * dl_d) / avgdl)
    )
    return F.round((idf * tf_part) * F.lit(PPB), 0).cast("long")


def topk_from_postings(
    tf: DataFrame, qterms: DataFrame, stats: DataFrame
) -> DataFrame:
    """The shared BM25 scorer: rank ``TOPK`` docs per query from a
    query-term postings relation.

    ``tf`` must hold one row per (doc, query term) the doc contains —
    ``(doc_id, dl, term, tf)`` — covering EVERY corpus doc with the
    term (df is derived as the per-term row count, so a filtered
    postings set would understate it). Both the ad-hoc face
    (``bm25_topk``) and the persistent-index probe
    (llm/bm25_index.py) feed this one function, which is what makes
    probe ≡ direct provable row-for-row.

    Plan shape (r17-opt, guide §2.4): df is a COUNT window over the
    postings relation instead of the former groupBy+broadcast-rejoin,
    which consumed ``tf`` twice — on the index-probe path that re-ran
    the whole pruned parquet scan subtree for one integer per term.
    The window must run BEFORE the qterms join (the join would inflate
    the count for a term shared by several queries) — same value as
    the old per-term row count. The explicit repartition by ``qid``
    ahead of the (qid, doc_id) aggregate is the single exchange the
    score aggregation AND the rank window both ride (hash partitioning
    on qid satisfies both clusterings); postings here are
    query-workload-sized, never corpus-sized, so the qid shuffle moves
    the same rows the old (qid, doc_id) exchange did.
    """
    term_ppb = term_weight_ppb()

    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("term")))
        .join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .crossJoin(F.broadcast(stats))
        .select("qid", "doc_id", term_ppb.alias("term_ppb"))
    )
    agg = (
        scored.repartition("qid")
        .groupBy("qid", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("term_ppb").alias("score_ppb"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("score_ppb"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("qid", "doc_id", "n_terms", "score_ppb", "rank")
    )


def bm25_topk_frame(docs: DataFrame) -> DataFrame:
    """Frame-level face over any ``(doc_id, text)`` corpus — reused by
    the property tests and any non-catalog caller."""
    base = tokenized_base(docs)
    stats = corpus_stats_frame(base)
    qterms = eval_query_terms(base)
    qterm_set = qterms.select("term").distinct()

    # Postings for query terms only: broadcast the tiny term set into
    # the exploded token stream so the corpus is filtered map-side
    # BEFORE the tf aggregation — the inverted-index probe shape.
    tok = base.select("doc_id", "dl", F.explode("toks").alias("term"))
    postings = tok.join(F.broadcast(qterm_set), "term")
    # Since r17-opt topk_from_postings consumes tf exactly ONCE (df is
    # a count window, not a rejoin), so the former lineage snapshot is
    # gone; instead the explicit term repartition is the single
    # exchange the tf aggregation AND the scorer's df window both ride
    # (hash partitioning on term satisfies both clusterings). Postings
    # are query-workload-sized (the relation the persistent index
    # materializes to parquet), never corpus-sized.
    tf = (
        postings.repartition("term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return topk_from_postings(tf, qterms, stats)


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOPK`` documents per eval query under log-free Okapi BM25:
    ``(qid, doc_id, n_terms, score_ppb, rank)``."""
    return bm25_topk_frame(load_table(spark, sf_dir, "documents"))


_TOKS = "list_filter(" + TOKENS_SQL.format(x="text") + ", t -> t <> '')"


def weight_sql(n_docs: str, df: str, tf: str, dl: str, sum_dl: str) -> str:
    """The oracle-side twin of :func:`term_weight_ppb` — the same
    constants interpolated from the same Python floats, parameterized
    over the unit relation's column references so the chunk-eval
    oracle (llm/chunkeval.py) reuses it verbatim."""
    return f"""CAST(ROUND(
           ((((CAST({n_docs} AS DOUBLE) - CAST({df} AS DOUBLE)) + 0.5)
             / (CAST({df} AS DOUBLE) + 0.5))
            * ((CAST({tf} AS DOUBLE) * {K1_PLUS_1!r})
               / (CAST({tf} AS DOUBLE)
                  + {K1!r} * ({ONE_MINUS_B!r}
                              + ({B!r} * CAST({dl} AS DOUBLE))
                                / (CAST({sum_dl} AS DOUBLE)
                                   / CAST({n_docs} AS DOUBLE))))))
           * {PPB!r}, 0) AS BIGINT)"""


ORACLE_BM25 = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks, len({_TOKS})::BIGINT AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS sum_dl FROM base
),
q AS (
  SELECT DISTINCT doc_id AS qid,
         unnest(list_slice(toks, 1, {QUERY_TERMS})) AS term
  FROM base
  WHERE doc_id % {QUERY_MOD} = 0 AND doc_id < {QUERY_MOD * Q_CAP}
),
tok AS (
  SELECT doc_id, dl, unnest(toks) AS term FROM base
  WHERE len(toks) > 0
),
tf AS (
  SELECT doc_id, dl, term, COUNT(*)::BIGINT AS tf
  FROM tok
  WHERE term IN (SELECT term FROM q)
  GROUP BY 1, 2, 3
),
dfr AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.qid, tf.doc_id,
         {weight_sql("s.n_docs", "dfr.df", "tf.tf", "tf.dl", "s.sum_dl")}
           AS term_ppb
  FROM tf
  JOIN q ON tf.term = q.term AND tf.doc_id <> q.qid
  JOIN dfr ON dfr.term = tf.term
  CROSS JOIN stats s
),
agg AS (
  SELECT qid, doc_id,
         COUNT(*)::BIGINT AS n_terms,
         SUM(term_ppb)::BIGINT AS score_ppb
  FROM scored GROUP BY 1, 2
)
SELECT qid, doc_id, n_terms, score_ppb, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY qid ORDER BY score_ppb DESC, doc_id ASC) AS rank
  FROM agg
) WHERE rank <= {TOPK}
"""


QUERIES: dict[str, tuple] = {
    "bm25_topk": (bm25_topk, ORACLE_BM25),
}
