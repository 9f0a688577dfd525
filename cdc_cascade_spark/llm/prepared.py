"""Session-shared prepared-documents relation — a LEAF module.

``(doc_id, hset, block)`` over the ``documents`` table: the distinct
3-token shingle-hash set (llm/prep.py) plus the first-shingle blocking
key, built once per (session, sf_dir) and reused by every consumer —
the per-token md5 hashing is the dominant cost of the whole text/dedup
surface and must never run once per query.

This module exists for DEPENDENCY HYGIENE, not new behavior: the
relation's original home is ``llm/dedup.py``, whose import made every
text/curation/BPE/pipeline query's registry fingerprint transitively
depend on the entire dedup module — a one-line dedup edit would have
re-fingerprinted 40 registered queries (r10 blast-radius audit in
BUILD_NOTES.md) and made the planned dedup refactor impossible to fit
in any check window. Consumers that need ONLY the prepared relation
(text.py, curation.py) import it from here; consumers that genuinely
use dedup machinery (pipeline's cluster collapse, selection's guarded
candidates, novelty/leakage/mirrors' band joins) keep importing
dedup. dedup.py still holds its own cache instance this round — it is
fingerprint-frozen for r10's CHECK_NEXT re-evidence slots and cannot
be edited; the r11 refactor (which edits it anyway) should switch it
to this module, un-doubling the one-time per-session build.

The relation is identical by construction on both paths (same
``_prepared_frame`` recipe over the same table), so cache unification
changes no values — pinned by tests/test_prepared.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_cascade_spark.catalog import load_table
from cdc_cascade_spark.functions.caching import BoundedDFCache
from cdc_cascade_spark.llm.prep import first_shingle, shingle_hash_set, tokens


def _prepared_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + distinct shingle-hash set + blocking key (the
    llm/dedup.py ``_docs_prepared`` recipe, verbatim)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        shingle_hash_set(toks).alias("hset"),
        first_shingle(toks).alias("block"),
    )


_PREPARED_CACHE = BoundedDFCache()


def docs_prepared_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _PREPARED_CACHE.get_or_build(
        spark, sf_dir, lambda: _prepared_frame(spark, sf_dir)
    )
