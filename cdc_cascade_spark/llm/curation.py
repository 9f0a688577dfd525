"""Corpus-curation operators: benchmark contamination detection and
deterministic stratified sampling.

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension): these
are the two curation steps a 100 TB training-data pipeline runs after
dedup — "is any eval data inside the training set?" and "rebalance the
corpus across (lang, source) strata" — expressed Spark-first with
DuckDB oracle SQL authored in parallel.

Contamination = n-gram *containment*, the decontamination measure used
by large open-corpus efforts: for a benchmark doc B and a training doc
T, ``|shingles(B) ∩ shingles(T)| / |shingles(B)|``. Unlike Jaccard it
is asymmetric — a short eval question fully embedded in a long training
document scores 1.0 where Jaccard would be near 0 — which is exactly
the leak being hunted.

Scale shape (100 TB):

- The shingle inverted index reuses the session-cached
  ``(doc_id, hset)`` relation the dedup family already materializes;
  the explode carries (8-byte hash, id) rows only, never text.
- Ultra-common shingles (document frequency > ``_df_cap``) are
  removed via a **broadcast anti-join** before the index join: they
  carry no identifying signal (stopword trigrams) and are the entire
  join-skew risk. After the cap, per-shingle join fan-out is bounded
  by cap² — no hot key can quadratically blow up the pair space.
- The bench side models the (small, fixed) benchmark suite as a
  deterministic id slice; in production it is an external table and
  the same plan broadcast-joins it.

Stratified sampling is the map-only form: per-stratum counts are a
partial-aggregated stats frame (broadcast back), and the keep/drop
decision is a deterministic md5-threshold test per row — no window
ranking, because ``ROW_NUMBER() OVER (PARTITION BY stratum)`` funnels
a dominant stratum through one reducer at corpus scale. Expected kept
size per stratum is ``min(n_stratum, SAMPLE_TARGET_PER_STRATUM)``
(Bernoulli, so ±√target variance — the price of the shuffle-free
plan; exact-N would need the per-stratum sort this deliberately
avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.hashing import token_hash, token_hash_sql
from cdc_cascade_spark.llm.prep import DOCS_CTE, TOKENS_SQL

# Benchmark-suite model: every doc_id ≡ 0 (mod 7) is "eval data".
CONTAM_BENCH_MOD = 7
# Shingles present in more than max(5, min(1000, n_docs // 20))
# documents are dropped before the index join (non-discriminative +
# the skew risk). 1/20 is exact in binary; the integer arithmetic is
# engine-identical.
CONTAM_DF_CAP_MIN = 5
CONTAM_DF_CAP_MAX = 1000
CONTAM_MIN_CONTAINMENT = 0.5

# Stratified sampling: equalize (lang, source) strata at ~this many
# docs each; smaller strata are kept whole. Small here so the
# downsampling branch is exercised even at test scales (sf0.01 strata
# have 1-16 docs); production would set thousands.
SAMPLE_TARGET_PER_STRATUM = 5
_SAMPLE_DENOM = 1 << 20
_SAMPLE_SALT = "smp:"


def _df_cap(n_docs: int) -> int:
    return max(CONTAM_DF_CAP_MIN, min(CONTAM_DF_CAP_MAX, n_docs // 20))


def contamination_frame(prepared: DataFrame) -> DataFrame:
    """Benchmark→training shingle-containment pairs ≥ 0.5 over any
    ``(doc_id, hset)`` shingle-set frame — the frame-level face of
    :func:`contamination_check`, reused by the incremental curation
    engine (llm/incremental.py). The bench/train split and the df cap
    are properties of the frame passed in.

    Output: (bench_doc, train_doc, n_common, containment), one row per
    contaminated (benchmark doc, training doc) pair. The containment
    denominator counts the bench doc's shingles *after* the df-cap
    filter, so a bench doc whose every shingle is ultra-common simply
    produces no rows (no division by zero, no spurious 1.0 scores
    from stopword overlap).

    The ``prepared.count()`` is a bounded action (same contract as the
    dedup guards' probe) — it freezes the df cap into the plan; pass a
    persisted/session-cached frame so the count is not a second scan.
    """
    cap = _df_cap(prepared.count())
    exploded = prepared.select("doc_id", F.explode("hset").alias("h"))
    # Hot-set derivation via a partial-aggregated groupBy + broadcast
    # anti-join (r18-opt, guide §2.5 — fixes the r17 skew hazard): the
    # r17 shape derived the df cap as a COUNT window over
    # W.partitionBy("h"), which forced EVERY occurrence of a hot
    # shingle onto one task BEFORE the cap filter dropped it — a
    # single-task straggler at 100 TB (hot shingles by definition
    # exceed the cap). groupBy("h") partially aggregates map-side, so
    # the hot-set shuffle carries ≤ one row per (shingle, map
    # partition) no matter how hot the key; the hot set itself is
    # bounded (≤ total occurrences / cap rows) and broadcasts. The
    # anti-join then drops hot occurrences MAP-SIDE, before the single
    # explicit ``repartition("h")`` that the bench/train split AND the
    # containment self-join below all ride (the two join branches share
    # an identical exchange subtree, which Spark deduplicates via
    # ReusedExchange — the surviving shingles shuffle exactly once).
    # Broadcast-size trade, stated: the hot set is bounded by
    # (total shingle occurrences / cap), which is corpus-linear only in
    # an adversarial all-boilerplate corpus — in the df-cap design's
    # own premise hot shingles are the stopword-grade tail (tens of
    # rows here). If a deployment's hot set ever outgrows a broadcast,
    # drop the hint and let AQE pick the join from runtime sizes; the
    # partial-agg derivation above stays skew-safe either way.
    # ``anti-join df > cap hot set`` ≡ ``keep df <= cap``, value for
    # value; the explode runs twice (hot derivation + survivors), both
    # map-side over the session-cached shingle-set relation.
    hot = (
        exploded.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > F.lit(int(cap)))
        .select("h")
    )
    rare = exploded.join(F.broadcast(hot), "h", "left_anti").repartition("h")
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == 0
    bench = rare.filter(is_bench)
    train = rare.filter(~is_bench)
    bsz = bench.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        bench.select(F.col("doc_id").alias("bench_doc"), "h")
        .join(train.select(F.col("doc_id").alias("train_doc"), "h"), "h")
        .groupBy("bench_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    contained = (
        pairs.join(bsz.withColumnRenamed("doc_id", "bench_doc"), "bench_doc")
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.col("sz").cast("double"),
        )
        .filter(F.col("containment") >= CONTAM_MIN_CONTAINMENT)
    )
    return contained.select("bench_doc", "train_doc", "n_common", "containment")


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`contamination_frame` over the session-cached shingle-set
    relation of the ``documents`` table (the registered query; cache
    home is the leaf module llm/prepared.py)."""
    from cdc_cascade_spark.llm.prepared import docs_prepared_cached

    return contamination_frame(
        docs_prepared_cached(spark, sf_dir).select("doc_id", "hset")
    )


ORACLE_CONTAMINATION = (
    DOCS_CTE
    + f"""
, cap AS (
  SELECT greatest({CONTAM_DF_CAP_MIN},
                  least({CONTAM_DF_CAP_MAX}, COUNT(*) // 20)) AS v
  FROM docs
)
, expl AS (SELECT doc_id, unnest(shingles) AS h FROM sh)
, hot AS (
  SELECT h FROM expl GROUP BY h HAVING COUNT(*) > (SELECT v FROM cap)
)
, rare AS (SELECT e.* FROM expl e ANTI JOIN hot USING (h))
, bench AS (SELECT * FROM rare WHERE doc_id % {CONTAM_BENCH_MOD} = 0)
, train AS (SELECT * FROM rare WHERE doc_id % {CONTAM_BENCH_MOD} <> 0)
, bsz AS (SELECT doc_id AS bench_doc, COUNT(*) AS sz FROM bench GROUP BY 1)
, m AS (
  SELECT b.doc_id AS bench_doc, t.doc_id AS train_doc, COUNT(*) AS n_common
  FROM bench b JOIN train t USING (h)
  GROUP BY 1, 2
)
SELECT m.bench_doc, m.train_doc, m.n_common,
       m.n_common::DOUBLE / bsz.sz::DOUBLE AS containment
FROM m JOIN bsz USING (bench_doc)
WHERE m.n_common::DOUBLE / bsz.sz::DOUBLE >= {CONTAM_MIN_CONTAINMENT}
"""
)


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced downsample over (lang, source) strata.

    Output: (doc_id, lang, source, n_stratum) — the kept rows. A row
    survives iff ``md5('smp:'||doc_id) % 2^20`` falls under its
    stratum's threshold ``(2^20 · target) // n_stratum`` (capped at
    2^20, i.e. keep-all for small strata). Pure integer arithmetic →
    identical keep set in both engines, reproducible across runs,
    cluster layouts, and partitionings.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    strata = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_stratum")
    )
    # `div` = exact integer division (matches DuckDB `//`); a double
    # division + cast could misround near-integer quotients
    thresh = F.least(
        F.lit(_SAMPLE_DENOM).cast("bigint"),
        F.expr(f"{_SAMPLE_DENOM * SAMPLE_TARGET_PER_STRATUM} div n_stratum"),
    )
    slot = (
        token_hash(F.concat(F.lit(_SAMPLE_SALT), F.col("doc_id").cast("string")))
        % _SAMPLE_DENOM
    )
    return (
        docs.join(F.broadcast(strata), ["lang", "source"])
        .filter(slot < thresh)
        .select("doc_id", "lang", "source", "n_stratum")
    )


_SLOT_SQL = (
    token_hash_sql(f"'{_SAMPLE_SALT}' || doc_id") + f" % {_SAMPLE_DENOM}"
)

ORACLE_STRATIFIED_SAMPLE = f"""
WITH d AS (SELECT doc_id, lang, source FROM documents)
, s AS (SELECT lang, source, COUNT(*) AS n_stratum FROM d GROUP BY 1, 2)
SELECT d.doc_id, d.lang, d.source, s.n_stratum
FROM d JOIN s USING (lang, source)
WHERE {_SLOT_SQL}
      < least({_SAMPLE_DENOM},
              ({_SAMPLE_DENOM * SAMPLE_TARGET_PER_STRATUM}) // s.n_stratum)
"""


# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------
# Patterns restricted to the RE2 ∩ java.util.regex common subset
# (character classes, bounded repetition, \b ASCII word boundary — no
# lookaround, no backreferences) so Spark and DuckDB match identically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_frame(docs: DataFrame) -> DataFrame:
    """Detect and redact emails / phone numbers / IPv4 addresses over
    any ``(doc_id, text)`` frame — the frame-level face of
    :func:`pii_redaction`, reused by the incremental curation engine
    (llm/incremental.py) so changed-batch redaction cannot drift from
    the registered per-corpus query.

    The synthetic corpus contains no PII (verified: zero matches for
    any pattern at sf0.01/sf0.1), so the operator injects a
    deterministic PII suffix first — every doc_id ≡ 0 (mod 10) gains
    an email, every doc_id ≡ 5 (mod 10) a phone + IP — and both
    engines apply the identical injection, making the redaction path
    genuinely exercised AND oracle-checked. Untouched docs pass
    through byte-identical (the no-PII fast path is part of the
    contract).

    Redaction order matters and is fixed: emails first (their
    local/domain parts contain dots and digits that the IP pattern
    could otherwise chew on), then phones, then IPs.

    Scale shape: pure scan → project; three JVM regexp passes per row,
    no Python, no shuffle. At 100 TB this is the shape of every
    PII-scrub pass — embarrassingly parallel, bounded by scan I/O.
    """
    mod10 = F.col("doc_id") % 10
    aug = F.concat(
        F.col("text"),
        F.when(
            mod10 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.org today"),
            ),
        )
        .when(
            mod10 == 5,
            F.concat(
                F.lit(" call 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" from 192.168."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 now"),
            ),
        )
        .otherwise(F.lit("")),
    )
    d = docs.select("doc_id", aug.alias("aug"))
    n_emails = F.size(F.regexp_extract_all(F.col("aug"), F.lit(PII_EMAIL), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(F.col("aug"), F.lit(PII_PHONE), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all(F.col("aug"), F.lit(PII_IP), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IP,
        "<IP>",
    )
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        redacted.alias("redacted"),
    )


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`pii_frame` over the ``documents`` table (the registered
    query)."""
    return pii_frame(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


ORACLE_PII = f"""
WITH aug AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 10 = 0 THEN
             ' contact user' || doc_id || '@example.org today'
           WHEN doc_id % 10 = 5 THEN
             ' call 555-010-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             || ' from 192.168.' || (doc_id % 256) || '.7 now'
           ELSE ''
         END AS aug
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(aug, '{PII_EMAIL}'))::INTEGER AS n_emails,
       len(regexp_extract_all(aug, '{PII_PHONE}'))::INTEGER AS n_phones,
       len(regexp_extract_all(aug, '{PII_IP}'))::INTEGER AS n_ips,
       regexp_replace(
         regexp_replace(
           regexp_replace(aug, '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g'),
         '{PII_IP}', '<IP>', 'g') AS redacted
FROM aug
"""


# --------------------------------------------------------------------------
# Quality-floor filter (drop the bottom decile)
# --------------------------------------------------------------------------
QUALITY_DROP_NUM = 1
QUALITY_DROP_DEN = 10


def quality_floor_keep_frame(scored: DataFrame) -> DataFrame:
    """Drop the lowest-quality 10% of any ``(doc_id, lang,
    quality_score)`` frame by exact rank — the frame-level face of
    :func:`quality_floor_filter`, reused by the incremental curation
    engine (llm/incremental.py); the election reruns over the
    maintained per-document stats whenever corpus membership changes
    (the decile threshold is a global property of the corpus).

    The cut is the bottom ``n // 10`` documents under the total order
    ``(quality_score, doc_id)`` — doc_id breaks score ties so the kept
    set is unambiguous in both engines.

    Scale shape: the threshold document is found with
    ``orderBy(...).limit(k)`` — Spark compiles this to
    TakeOrderedAndProject (each task keeps its local top-k, the driver
    merges k·partitions rows), NOT a global sort — then broadcast back
    as a 1-row frame; the keep-filter is a second scan-project. Two
    scans, zero wide shuffles. The oracle uses the equivalent (but
    single-reducer) ROW_NUMBER form — fine for DuckDB, wrong for
    Spark at scale, which is exactly why the Spark plan differs.
    ``scored.count()`` is a bounded action (same contract as the dedup
    guards' probe).
    """
    k = scored.count() * QUALITY_DROP_NUM // QUALITY_DROP_DEN
    if k == 0:
        return scored
    thr = (
        scored.orderBy("quality_score", "doc_id")
        .limit(k)
        .agg(F.max(F.struct("quality_score", "doc_id")).alias("t"))
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(
            (F.col("quality_score") > F.col("t.quality_score"))
            | (
                (F.col("quality_score") == F.col("t.quality_score"))
                & (F.col("doc_id") > F.col("t.doc_id"))
            )
        )
        .select("doc_id", "lang", "quality_score")
    )


def quality_floor_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`quality_floor_keep_frame` over the ``documents`` table's
    text stats (the registered query)."""
    from cdc_cascade_spark.llm.text import text_stats

    return quality_floor_keep_frame(
        text_stats(spark, sf_dir).select("doc_id", "lang", "quality_score")
    )


ORACLE_QUALITY_FLOOR = (
    DOCS_CTE
    + f"""
, scored AS (
  SELECT doc_id, lang,
         least(1.0, len(toks)::DOUBLE / 100.0)
           * (len(list_distinct(toks))::DOUBLE / len(toks)) AS quality_score
  FROM sh
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY quality_score, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM scored
)
SELECT doc_id, lang, quality_score
FROM ranked
WHERE rn > n * {QUALITY_DROP_NUM} // {QUALITY_DROP_DEN}
"""
)


def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N stratified sample: the ``min(n_stratum, TARGET)`` docs
    with the smallest salted hash per (lang, source) stratum.

    The exact-size counterpart to the Bernoulli ``stratified_sample``:
    deterministic (hash order, doc_id tie-break), and each stratum
    yields exactly its quota. The price is a per-stratum ranking — but
    it compiles to WindowGroupLimit (rank pushdown: each map task
    keeps only TARGET rows per stratum before the shuffle), so the
    shuffle carries ≤ TARGET·partitions rows per stratum, not the
    stratum. A dominant stratum therefore does NOT funnel through one
    reducer at full volume — the residual skew (TARGET rows × number
    of map partitions for one hot stratum key) is the bounded kind.
    Plan shape pinned in tests/test_plans.py.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    slot = token_hash(
        F.concat(F.lit(_SAMPLE_SALT), F.col("doc_id").cast("string"))
    )
    w = W.partitionBy("lang", "source").orderBy(slot.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_TARGET_PER_STRATUM)
        .select("doc_id", "lang", "source", F.col("rk").alias("sample_rank"))
    )


ORACLE_STRATIFIED_EXACT = f"""
SELECT doc_id, lang, source, CAST(rk AS INTEGER) AS sample_rank
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY {token_hash_sql(f"'{_SAMPLE_SALT}' || doc_id")}, doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= {SAMPLE_TARGET_PER_STRATUM}
"""


def label_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-quality audit per embedding cluster label: join
    ``documents`` × ``embeddings`` on id and profile each label.

    The pipeline step after clustering: "which embedding clusters are
    full of junk?". Output per label: doc count, total tokens, a
    corpus-level type-token ratio, and the dominant language (count
    mode, ties broken alphabetically).

    Determinism: all aggregates are INTEGER sums; the two doubles are
    single divisions of those sums (never accumulated floats — a mean
    of per-doc double scores would be summation-order-dependent and
    break the cross-engine hash).

    Scale shape: one id-equi-join (both sides hash-partition on the
    id — co-partitioned shuffle), then a label rollup whose output is
    |labels| rows; the lang-mode window partitions by label over the
    tiny (label, lang) count frame.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    from cdc_cascade_spark.llm.prep import tokens

    toks = tokens(F.col("text"))
    joined = docs.join(emb, "doc_id").select(
        "doc_id",
        "label",
        "lang",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_dist"),
    )
    # ONE corpus aggregation at (label, lang) granularity (r17-opt,
    # guide §2.3 — aggregate before you shuffle / §2.4): the former
    # prof + lang_counts pair consumed ``joined`` twice, re-running the
    # tokenize + id-join subtree per consumer; both downstream frames
    # derive from this tiny rollup instead (sums are associative, the
    # lang mode is unchanged), and the corpus crosses one map-side
    # partially-aggregated exchange exactly once.
    lang_counts = joined.groupBy("label", "lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_toks").alias("sum_toks"),
        F.sum("n_dist").alias("sum_dist"),
    )
    prof = lang_counts.groupBy("label").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum("sum_toks").alias("sum_tokens"),
        F.sum("sum_dist").alias("sum_distinct"),
    )
    lw = W.partitionBy("label").orderBy(F.desc("cnt"), F.asc("lang"))
    dominant = (
        lang_counts.withColumn("rn", F.row_number().over(lw))
        .filter(F.col("rn") == 1)
        .select("label", F.col("lang").alias("dominant_lang"))
    )
    # one row per label on both sides (label set is bounded at any
    # corpus size), derived through an agg/window with no size stats —
    # broadcast so the per-label join cannot plan a SortMergeJoin
    return prof.join(F.broadcast(dominant), "label").select(
        "label",
        "n_docs",
        "sum_tokens",
        (F.col("sum_distinct").cast("double") / F.col("sum_tokens").cast("double"))
        .alias("corpus_ttr"),
        (F.col("sum_tokens").cast("double") / F.col("n_docs").cast("double"))
        .alias("avg_tokens"),
        "dominant_lang",
    )


ORACLE_LABEL_PROFILE = f"""
WITH joined AS (
  SELECT d.doc_id, e.label, d.lang,
         len({TOKENS_SQL.format(x='d.text')}) AS n_toks,
         len(list_distinct({TOKENS_SQL.format(x='d.text')})) AS n_dist
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
), prof AS (
  SELECT label, COUNT(*) AS n_docs, SUM(n_toks) AS sum_tokens,
         SUM(n_dist) AS sum_distinct
  FROM joined GROUP BY label
), lc AS (
  SELECT label, lang, COUNT(*) AS cnt FROM joined GROUP BY 1, 2
), dom AS (
  SELECT label, lang AS dominant_lang
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY cnt DESC, lang ASC) AS rn
        FROM lc)
  WHERE rn = 1
)
SELECT p.label, p.n_docs, CAST(p.sum_tokens AS BIGINT) AS sum_tokens,
       p.sum_distinct::DOUBLE / p.sum_tokens::DOUBLE AS corpus_ttr,
       p.sum_tokens::DOUBLE / p.n_docs::DOUBLE AS avg_tokens,
       dom.dominant_lang
FROM prof p JOIN dom USING (label)
"""


QUERIES: dict[str, tuple] = {
    "contamination_check": (contamination_check, ORACLE_CONTAMINATION),
    "label_quality_profile": (label_quality_profile, ORACLE_LABEL_PROFILE),
    "stratified_sample": (stratified_sample, ORACLE_STRATIFIED_SAMPLE),
    "stratified_sample_exact": (stratified_sample_exact, ORACLE_STRATIFIED_EXACT),
    "pii_redaction": (pii_redaction, ORACLE_PII),
    "quality_floor_filter": (quality_floor_filter, ORACLE_QUALITY_FLOOR),
}
