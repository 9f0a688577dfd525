"""Label-skew report: per-stratum label concentration for a labeled
corpus — the dataset-card question "is any language or source
dominated by one label?".

Beyond-reference LLM-pipeline surface (SURVEY.md §2 extension), the
profile-family companion to ``label_quality_profile`` (llm/curation.py)
and ``corpus_profile`` (llm/profile.py): where those profile quality
per label and size per stratum, this one measures how *concentrated*
the label distribution is WITHIN each stratum. A fine-tuning mix whose
'fr' slice is 90 % one label trains a language-conditional label prior;
this report is the tripwire. Labels come from the ``embeddings`` table
(vec_id = doc_id, the established join of label_quality_profile);
strata are the corpus's two curation dimensions, lang and source.

Metrics per stratum — all entropy-free (no transcendentals in
registered queries — libm differs across engines; the same
substitution as lift-for-PMI and L1-for-JS):

- ``top_label`` / ``top_share_ppm``: the modal label and its exact
  integer share ``top_cnt·1e6 div n`` (ties broken by label asc —
  a total order, so both engines pick the same mode).
- ``hhi_ppm``: the Herfindahl–Hirschman concentration index
  ``Σ cnt_i² · 1e6 div n²`` — 1e6/|labels| for a uniform stratum,
  1e6 for a single-label one. Exact integer arithmetic end to end:
  an entropy-free concentration measure that is also the collision
  probability of two draws (with replacement) sharing a label.
- ``n_labels``: distinct labels present.

Determinism: every output is an integer produced by integer sums and
integer floor-division — no floats anywhere, so the cross-engine hash
cannot drift. int64 headroom: Σ cnt² ≤ n², safe through n ≈ 3·10⁹ docs
per stratum; past that a deployment casts the square sum to
decimal(38,0) (Spark) / relies on HUGEINT (DuckDB) — same plan.

Scale shape (100 TB): ONE corpus-sized shuffle — the id-equi-join
(both sides hash-partition on doc_id) feeds a single
``(lang, source, label)`` cube aggregation with map-side partials;
everything after runs over the cube (|langs|·|sources|·|labels| rows —
hundreds at any corpus size): both stratum margins are second-level
aggregations of the cube, and the mode window partitions the tiny
count frame per stratum. Nothing corpus-sized is ever windowed or
joined twice.

Registered in r10, same round as built (the registration-pipeline
discipline). tests/test_labelskew.py pins oracle agreement at two SFs,
a pure-Python model on a crafted corpus, and the plan shape (single
corpus aggregation, no corpus-sized window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table

# ppm scale for the exact integer shares.
PPM = 1_000_000


def label_cube_frame(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """``(lang, source, label, cnt)`` — the one corpus-sized
    aggregation every downstream margin derives from. ``docs`` is
    ``(doc_id, lang, source)``; ``labels`` is ``(doc_id, label)``."""
    return (
        docs.join(labels, "doc_id")
        .groupBy("lang", "source", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _stratum_skew(counts: DataFrame, dim: str) -> DataFrame:
    """Roll a ``(stratum, label, cnt)`` frame up to one skew row per
    stratum; ``dim`` tags which dimension the stratum came from."""
    per = counts.groupBy("stratum", "label").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    totals = per.groupBy("stratum").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("int").alias("n_labels"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sum_sq"),
    )
    w = W.partitionBy("stratum").orderBy(F.desc("cnt"), F.asc("label"))
    top = (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("stratum", F.col("label").alias("top_label"), F.col("cnt").alias("top_cnt"))
    )
    # top is one row per stratum (strata = distinct lang/source values,
    # bounded at any corpus size) but derived through a window, so
    # Catalyst has no size estimate and planned a SortMergeJoin for
    # this per-stratum join — broadcast it explicitly (r17-opt, §3.1).
    return totals.join(F.broadcast(top), "stratum").select(
        F.lit(dim).alias("dim"),
        "stratum",
        "n_docs",
        "n_labels",
        "top_label",
        F.expr(f"(top_cnt * {PPM}) div n_docs").cast("bigint").alias(
            "top_share_ppm"
        ),
        F.expr(f"(sum_sq * {PPM}) div (n_docs * n_docs)")
        .cast("bigint")
        .alias("hhi_ppm"),
    )


def label_skew_frame(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """Frame-level face over any ``(doc_id, lang, source)`` ×
    ``(doc_id, label)`` pair — reused by the model tests.

    The cube is snapshotted before fan-out: it feeds four consumers
    (two margins × (totals + mode window)), and without the snapshot
    Spark re-plans the corpus join + aggregation per consumer —
    measured 4 documents scans / 4 SortMergeJoins at sf0.001, the
    multi-consumer trap the curation/CMS family already solved. The
    snapshot is |langs|·|sources|·|labels| rows (hundreds at any
    corpus size), so the materialization barrier is effectively free
    while the saved subtree is the only corpus-sized work."""
    cube = label_cube_frame(docs, labels).localCheckpoint(eager=False)
    lang_side = _stratum_skew(
        cube.select(F.col("lang").alias("stratum"), "label", "cnt"), "lang"
    )
    src_side = _stratum_skew(
        cube.select(F.col("source").alias("stratum"), "label", "cnt"),
        "source",
    )
    return lang_side.unionByName(src_side)


def label_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum label concentration over documents × embeddings:
    ``(dim, stratum, n_docs, n_labels, top_label, top_share_ppm,
    hhi_ppm)`` with one row per lang value and one per source value."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    labels = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    return label_skew_frame(docs, labels)


def _skew_side_sql(dim: str) -> str:
    return f"""
  SELECT '{dim}' AS dim, stratum, n_docs, n_labels, top_label,
         ((top_cnt * {PPM}) // n_docs)::BIGINT AS top_share_ppm,
         ((sum_sq * {PPM}) // (n_docs * n_docs))::BIGINT AS hhi_ppm
  FROM (
    SELECT stratum,
           SUM(cnt)::BIGINT AS n_docs,
           COUNT(*)::INTEGER AS n_labels,
           SUM(cnt * cnt)::BIGINT AS sum_sq
    FROM {dim}_per GROUP BY stratum
  ) t
  JOIN (
    SELECT stratum, label AS top_label, cnt AS top_cnt
    FROM (
      SELECT stratum, label, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY stratum ORDER BY cnt DESC, label ASC) AS rn
      FROM {dim}_per
    ) WHERE rn = 1
  ) USING (stratum)"""


ORACLE_LABEL_SKEW = f"""
WITH cube3 AS MATERIALIZED (
  SELECT d.lang, d.source, e.label, COUNT(*)::BIGINT AS cnt
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  GROUP BY 1, 2, 3
),
lang_per AS (
  SELECT lang AS stratum, label, SUM(cnt)::BIGINT AS cnt
  FROM cube3 GROUP BY 1, 2
),
source_per AS (
  SELECT source AS stratum, label, SUM(cnt)::BIGINT AS cnt
  FROM cube3 GROUP BY 1, 2
)
{_skew_side_sql("lang")}
UNION ALL
{_skew_side_sql("source")}
"""


QUERIES: dict[str, tuple] = {
    "label_skew_report": (label_skew_report, ORACLE_LABEL_SKEW),
}
