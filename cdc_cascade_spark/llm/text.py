"""Text-analysis operators for training-data pipelines.

Quality scoring, language ID, token counting, and document
fingerprinting over the ``documents`` table — the per-document filters
and features an LLM data pipeline computes before dedup/sampling.

Scale: every operator here is a pure projection (JVM built-ins over
arrays), so the 100 TB plan is scan → map → (small) aggregate; no
Python, no explode-induced row blowup except where noted.

Determinism: derived doubles come from integer counts via single
divisions (deterministic in IEEE-754), never from accumulated float
sums; transcendental functions are avoided entirely (libm results can
differ across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.llm.prep import (
    DOCS_CTE,
    SHINGLE_K,
    shingle_hash_set,
    tokens,
)

# Stopword marker sets for the five labeled languages. Tiny on purpose:
# this is the classic n-gram/marker heuristic, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that"],
    "es": ["el", "la", "los", "que", "es", "un", "una", "y"],
    "fr": ["le", "la", "les", "est", "et", "un", "une", "dans"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"],
}

EN_STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbol.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Unit separator for the token-stream encoding of the merge step.
# Pre-tokens can never contain a SPACE (the pattern excludes it), but
# the pattern's symbol branch CAN match the separator byte itself, so
# every BPE entry point strips \x1f from raw text before
# pre-tokenization — otherwise a document containing the
# unit-separator byte (not rare in scraped web text) would corrupt the
# joined stream and the merge replace could splice across real token
# boundaries.
_BPE_SEP = "\x1f"
_BPE_SEP2 = _BPE_SEP * 2


def _bpe_pretokens(text_col: "F.Column") -> "F.Column":
    """Sanitized BPE pre-token array (separator-free by construction)."""
    clean = F.replace(text_col, F.lit(_BPE_SEP), F.lit(""))
    return F.regexp_extract_all(clean, F.lit(BPE_PATTERN), F.lit(0))


# DuckDB mirror of _bpe_pretokens
_BPE_PRETOKENS_SQL = (
    "regexp_extract_all(replace({x}, chr(31), ''), '" + BPE_PATTERN + "')"
)


def _bpe_encode_stream(pretokens_col: "F.Column") -> "F.Column":
    """Anchored stream encoding: ``␟tok₁␟␟tok₂␟␟…␟␟tokₙ␟`` — sentinel
    separator at both ends, DOUBLED separator between tokens.

    With this encoding the merge of pair ``(a, b)`` is the literal
    string replace ``␟a␟␟b␟ → ␟ab␟`` and that replace is EXACTLY the
    greedy left-to-right non-overlapping BPE merge rule:

    - tokens are separator-free, so the pattern's anchoring ``␟`` on
      each side forces ``a``/``b`` to match *whole* tokens — a suffix
      of one token followed by a prefix of the next (``lathe␟␟cats``
      vs pair ``the cat``) can never match, which was the boundary-bleed
      defect of the unanchored single-separator encoding;
    - each match consumes ONE separator of the doubled boundary on each
      flank, so replace-all's "continue after the replacement" scan
      still sees a leading ``␟`` for the very next token pair —
      ``[a,b,a,b]`` with pair ``(a,b)`` merges to ``[ab,ab]``, while
      runs stay greedy: ``[a,a,a]`` with pair ``(a,a)`` merges to
      ``[aa,a]``, never ``[a,aa]``;
    - the replacement ``␟ab␟`` restores the invariant (single ``␟``
      flanks re-form the doubled boundary with the neighbours' own
      separators), so merge steps compose across training rounds.

    Both Spark's ``replace`` and DuckDB's ``replace`` are leftmost,
    non-overlapping, continue-after-replacement scans, so the two
    engines apply identical merge semantics.
    """
    return F.concat(
        F.lit(_BPE_SEP), F.concat_ws(_BPE_SEP2, pretokens_col), F.lit(_BPE_SEP)
    )


def _bpe_merge_stream(stream_col: "F.Column", a: str, b: str) -> "F.Column":
    """Apply one learned merge ``(a, b)`` tokenwise (see _bpe_encode_stream)."""
    return F.replace(
        stream_col,
        F.lit(_BPE_SEP + a + _BPE_SEP2 + b + _BPE_SEP),
        F.lit(_BPE_SEP + a + b + _BPE_SEP),
    )


def _bpe_decode_tokens(stream_col: "F.Column") -> "F.Column":
    """Token array back out of an encoded stream (tokens are never
    empty and never contain the separator, so splitting on the single
    separator and dropping the empties is exact)."""
    return F.filter(F.split(stream_col, _BPE_SEP), lambda t: t != "")


# DuckDB mirrors of the encode/merge/decode trio. ``{p}`` is a list
# expression, ``{s}`` a stream expression, ``{pair}`` a scalar
# 'a b' pair expression (tokens are space-free, so the single space is
# an unambiguous pair separator).
_BPE_ENCODE_SQL = "chr(31) || array_to_string({p}, chr(31) || chr(31)) || chr(31)"
_BPE_MERGE_SQL = (
    "replace({s}, chr(31) || replace({pair}, ' ', chr(31) || chr(31)) || chr(31),"
    " chr(31) || replace({pair}, ' ', '') || chr(31))"
)
_BPE_DECODE_SQL = "list_filter(string_split({s}, chr(31)), t -> t <> '')"



def text_stats_frame(docs: DataFrame) -> DataFrame:
    """Per-document quality features over any ``(doc_id, lang, text)``
    frame — the frame-level face of :func:`text_stats`, reused by the
    incremental curation engine (llm/incremental.py) so changed-batch
    scoring cannot drift from the registered per-corpus stats."""
    toks = tokens(F.col("text"))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    )
    # sanitized so the stat agrees with what the BPE entry points will
    # actually tokenize (a \x1f byte is stream syntax, never a token)
    bpe_count = F.size(_bpe_pretokens(F.col("text")))
    return docs.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        bpe_count.alias("n_bpe_tokens"),
        (sum_len.cast("double") / n).alias("avg_token_len"),
        (stop_hits.cast("double") / n).alias("stopword_ratio"),
        (n_distinct.cast("double") / n).alias("ttr"),
        (
            F.least(F.lit(1.0), n.cast("double") / 100.0)
            * (n_distinct.cast("double") / n)
        ).alias("quality_score"),
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token counts, lengths, ratios."""
    return text_stats_frame(load_table(spark, sf_dir, "documents"))


ORACLE_TEXT_STATS = (
    DOCS_CTE
    + f"""
SELECT doc_id, lang,
       len(toks)::INTEGER AS n_tokens,
       len(list_distinct(toks))::INTEGER AS n_distinct_tokens,
       len({_BPE_PRETOKENS_SQL.format(x='text')})::INTEGER AS n_bpe_tokens,
       list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks) AS avg_token_len,
       len(list_filter(toks, t -> list_contains({EN_STOPWORDS!r}, t)))::DOUBLE / len(toks) AS stopword_ratio,
       len(list_distinct(toks))::DOUBLE / len(toks) AS ttr,
       least(1.0, len(toks)::DOUBLE / 100.0) * (len(list_distinct(toks))::DOUBLE / len(toks)) AS quality_score
FROM sh
"""
)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID, evaluated against the labeled lang.

    Prediction = language with the most (distinct) marker hits;
    ties break alphabetically — deterministic in both engines via an
    explicit CASE chain on ``greatest``.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens(F.col("text")))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*hits.values())
    pred = F.lit(None).cast("string")
    expr = None
    for lang in sorted(LANG_MARKERS):  # alphabetical priority on ties
        cond = hits[lang] == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    pred = expr
    scored = docs.select("doc_id", "lang", pred.alias("predicted_lang"))
    return scored.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def _lang_id_oracle() -> str:
    hit_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        hit_exprs.append(
            f"len(list_intersect(list_distinct(toks), {lst})) AS h_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"h_{la}" for la in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN h_{la} = {best} THEN '{la}'" for la in langs
    ) + " END"
    return (
        DOCS_CTE
        + ", hits AS (SELECT doc_id, lang, "
        + ", ".join(hit_exprs)
        + " FROM sh)\n"
        + f"SELECT lang, {case} AS predicted_lang, COUNT(*) AS n_docs\n"
        + "FROM hits GROUP BY 1, 2"
    )


ORACLE_LANG_ID = _lang_id_oracle()


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite).

    Fingerprint = min shingle-hash over the document's distinct 3-token
    shingle set (llm/prep.py) — the representative hash used for fast
    first-pass clustering of near-identical docs.

    Rides the session-shared prepared relation (llm/prepared.py — the
    leaf home; same recipe the dedup family shares): the shingle
    hashing is the dominant cost and is computed once per
    (session, sf_dir); this query is then a projection over the cached
    ``hset`` column (array_min + size) — same values as hashing in
    place, by construction.
    """
    from cdc_cascade_spark.llm.prepared import docs_prepared_cached

    prepared = docs_prepared_cached(spark, sf_dir)
    return prepared.select(
        "doc_id",
        F.array_min("hset").alias("fingerprint"),
        F.size("hset").alias("n_shingles"),
    )


ORACLE_FINGERPRINT = (
    DOCS_CTE
    + """
SELECT doc_id,
       list_min(shingles) AS fingerprint,
       len(shingles)::INTEGER AS n_shingles
FROM sh
"""
)


def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-100 tokens by document frequency.

    The explode → two-level aggregate shape: per-(token, doc) dedup,
    then per-token document frequency + total term frequency. At 100 TB
    this is the standard vocab/BPE-corpus-stats job — both aggregates
    partial map-side, shuffle keyed by token.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    per_doc = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").alias("term_freq"),
        )
        .orderBy(F.desc("doc_freq"), F.desc("term_freq"), F.asc("token"))
        .limit(100)
    )


ORACLE_VOCABULARY = (
    DOCS_CTE
    + """
, tok AS (SELECT doc_id, unnest(toks) AS token FROM docs)
, per_doc AS (SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2)
SELECT token, COUNT(*) AS doc_freq, CAST(SUM(tf) AS BIGINT) AS term_freq
FROM per_doc GROUP BY token
ORDER BY doc_freq DESC, term_freq DESC, token ASC
LIMIT 100
"""
)


def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 token bigrams by corpus frequency (n-gram statistics)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = docs.select(F.explode(bigrams).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("bigram"))
        .limit(50)
    )


ORACLE_BIGRAMS = (
    DOCS_CTE
    + """
, bg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM docs WHERE len(toks) >= 2
)
SELECT bigram, COUNT(*) AS n_occurrences
FROM bg GROUP BY bigram
ORDER BY n_occurrences DESC, bigram ASC
LIMIT 50
"""
)


def text_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style salient terms: top-3 tokens per document by
    ``tf × N / df`` (a rational IDF — no log(), whose libm rounding
    differs across engines and would break the oracle hash).

    Shape: explode → (token, doc) tf agg → token df agg (broadcast
    back) → per-doc window top-k. The df relation is tiny (vocabulary-
    sized) so it broadcasts at any corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_rel = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_rel), "token").select(
        "doc_id",
        "token",
        ((F.col("tf").cast("double") * n_docs) / F.col("df")).alias("salience"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("salience"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "salience", "rank")
    )


ORACLE_SALIENT = (
    DOCS_CTE
    + """
, tok AS (SELECT doc_id, unnest(toks) AS token FROM docs)
, tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2)
, dfr AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1)
, scored AS (
  SELECT tf.doc_id, tf.token,
         (CAST(tf.tf AS DOUBLE) * (SELECT COUNT(*) FROM documents)) / dfr.df AS salience
  FROM tf JOIN dfr ON tf.token = dfr.token
)
SELECT doc_id, token, salience, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY salience DESC, token ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""
)


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: how much of the doc is itself again.

    The boilerplate/loop-generation filter every pretraining pipeline
    runs: ``repetition_ratio = 1 − distinct_shingles / total_shingles``
    (0 = no 3-gram repeats, → 1 = the same phrase over and over).
    Docs shorter than one shingle are repetition-free by definition.

    Scale shape: map-only projection — the shingle set is computed
    per-row with JVM array expressions (llm/prep.py), nothing shuffles,
    nothing explodes. The 100 TB plan is scan → project → (optional)
    filter pushed to the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    total = F.greatest(n - (SHINGLE_K - 1), F.lit(1))
    distinct_sh = F.size(shingle_hash_set(toks))
    ratio = F.lit(1.0) - distinct_sh.cast("double") / total.cast("double")
    return docs.select(
        "doc_id",
        "lang",
        total.alias("n_shingles"),
        distinct_sh.alias("n_distinct_shingles"),
        ratio.alias("repetition_ratio"),
    )


ORACLE_REPETITION = (
    DOCS_CTE
    + f"""
SELECT doc_id, lang,
       greatest(len(toks) - {SHINGLE_K - 1}, 1)::INTEGER AS n_shingles,
       len(shingles)::INTEGER AS n_distinct_shingles,
       1.0 - len(shingles)::DOUBLE
           / greatest(len(toks) - {SHINGLE_K - 1}, 1)::DOUBLE
         AS repetition_ratio
FROM sh
"""
)


BPE_TOP_PAIRS = 20
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first round of BPE training: the corpus's most frequent
    adjacent pre-token pairs (the merge candidates).

    Pre-tokens come from the same BPE_PATTERN as ``text_stats``;
    adjacent pairs are built by zipping the pre-token array against
    its own 1-shifted slice (map-side, no window), then one explode →
    count → top-K. A full BPE trainer iterates this: merge the top
    pair, re-tokenize, repeat — each round is exactly this query over
    the updated vocabulary, so the single round IS the distributed
    building block.

    Scale shape: explode → map-side partial count → one shuffle on the
    pair key (vocabulary², but Zipf-concentrated); top-K is
    TakeOrderedAndProject, never a global sort. Ties break on the pair
    string so K is deterministic in both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    pre = _bpe_pretokens(F.col("text"))
    # greatest(n-1, 0): a pretoken-less doc (empty/whitespace text)
    # yields an empty array and slice rejects negative lengths
    n = F.greatest(F.size(pre) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(pre, 1, n),
        F.slice(pre, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(BPE_TOP_PAIRS)
    )


ORACLE_BPE_PAIRS = f"""
WITH pre AS (
  SELECT doc_id, {_BPE_PRETOKENS_SQL.format(x='text')} AS p
  FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, len(p)),
                               i -> p[i] || ' ' || p[i+1])) AS pair
  FROM pre
)
SELECT pair, COUNT(*) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT {BPE_TOP_PAIRS}
"""


def bpe_apply_top_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full BPE training iteration: pick the top merge pair, apply
    it corpus-wide, and return the NEXT round's top pair counts.

    The greedy left-to-right non-overlapping merge every BPE trainer
    uses is expressed as a tokenwise-anchored string ``replace`` over
    the sentinel/doubled-separator encoded pre-token stream
    (``␟a␟␟b␟`` → ``␟ab␟``; see ``_bpe_encode_stream`` for the proof
    that replace-all over this encoding IS the greedy merge rule and
    cannot splice across token boundaries). The winning pair comes
    from a bounded 1-row collect (deterministic tie-break), mirrored
    in the oracle as scalar subqueries.

    Scale shape: two passes of the bpe_merge_pairs plan plus one
    map-only replace between them — the exact shape a distributed BPE
    trainer loops; per-round cost is explode + partial-agg + top-K,
    never corpus² anything.
    """
    docs = load_table(spark, sf_dir, "documents")
    top = bpe_merge_pairs(spark, sf_dir).limit(1).collect()
    if not top:
        # exhausted corpus (empty, or every doc a single pre-token):
        # no merge exists, and the next round's pair table is empty —
        # a normal pipeline state, not an error (mirrors the trainer's
        # `if not top: break` and the oracle's empty result)
        return spark.createDataFrame([], "pair string, n_occurrences bigint")
    a, b = top[0].pair.split(" ", 1)
    pre = _bpe_pretokens(F.col("text"))
    stream = _bpe_encode_stream(pre)
    merged = _bpe_decode_tokens(_bpe_merge_stream(stream, a, b))
    # greatest(n-1, 0): a pretoken-less doc decodes to [] and slice
    # rejects negative lengths
    m = F.greatest(F.size(merged) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(merged, 1, m),
        F.slice(merged, 2, m),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .filter(F.col("pair") != "")  # 1-token docs produce no pairs
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(BPE_TOP_PAIRS)
    )


ORACLE_BPE_APPLY = f"""
WITH pre AS (
  SELECT doc_id, {_BPE_PRETOKENS_SQL.format(x='text')} AS p
  FROM documents
), pairs0 AS (
  SELECT unnest(list_transform(range(1, len(p)),
                               i -> p[i] || ' ' || p[i+1])) AS pair
  FROM pre
), top AS (
  SELECT pair, COUNT(*) AS n
  FROM pairs0 GROUP BY pair
  ORDER BY n DESC, pair ASC LIMIT 1
), merged AS (
  SELECT doc_id,
         {_BPE_DECODE_SQL.format(
             s=_BPE_MERGE_SQL.format(
                 s=_BPE_ENCODE_SQL.format(p='p'),
                 pair='(SELECT pair FROM top)',
             )
         )} AS m
  FROM pre
), pairs1 AS (
  SELECT unnest(list_transform(range(1, len(m)),
                               i -> m[i] || ' ' || m[i+1])) AS pair
  FROM merged
)
SELECT pair, COUNT(*) AS n_occurrences
FROM pairs1
WHERE pair <> ''
GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT {BPE_TOP_PAIRS}
"""


QUERIES: dict[str, tuple] = {
    "text_stats": (text_stats, ORACLE_TEXT_STATS),
    "doc_repetition": (doc_repetition, ORACLE_REPETITION),
    "bpe_merge_pairs": (bpe_merge_pairs, ORACLE_BPE_PAIRS),
    "bpe_apply_top_merge": (bpe_apply_top_merge, ORACLE_BPE_APPLY),
    "text_salient_terms": (text_salient_terms, ORACLE_SALIENT),
    "lang_id": (lang_id, ORACLE_LANG_ID),
    "doc_fingerprint": (doc_fingerprint, ORACLE_FINGERPRINT),
    "text_vocabulary": (text_vocabulary, ORACLE_VOCABULARY),
    "text_bigrams": (text_bigrams, ORACLE_BIGRAMS),
}
