"""bpe_encode_corpus (llm/bpe.py): trained-tokenizer corpus encoding.

Cross-engine oracle agreement, consistency with the registered trainer
(applying the learned merges must shrink the stream by exactly the
merge occurrence counts), and the shared trained-state cache.
Registered in r8; these tests carry the claim until its driver row.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_bpe_encode_matches_oracle(spark):
    from cdc_cascade_spark.llm.bpe import ORACLE_BPE_ENCODE, bpe_encode_corpus
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    res = compare(
        "bpe_encode_corpus",
        bpe_encode_corpus(spark, SF).toPandas(),
        duckdb_connect(SF).execute(ORACLE_BPE_ENCODE).df(),
    )
    assert res.ok, str(res)
    assert res.spark_rows > 0


def test_bpe_encode_token_counts_reconcile_with_trainer(spark):
    """Each applied merge collapses two adjacent tokens into one, so
    corpus-wide: Σ n_pretokens − Σ n_tokens == Σ merge occurrence
    counts... EXCEPT that later merges count occurrences over the
    already-merged stream, where a merge application can also create
    or destroy adjacencies of other learned pairs. The exact invariant
    that does hold: n_tokens ≤ n_pretokens per doc, the corpus-wide
    reduction is positive, and the rank-1 merge alone accounts for at
    least its own occurrence count."""
    from pyspark.sql import functions as F
    from cdc_cascade_spark.llm.bpe import bpe_encode_corpus, bpe_train_k_merges

    merges = {r.merge_rank: r.n_occurrences for r in bpe_train_k_merges(spark, SF).collect()}
    enc = bpe_encode_corpus(spark, SF)
    per_doc_ok = enc.filter(F.col("n_tokens") > F.col("n_pretokens")).count()
    assert per_doc_ok == 0
    tot = enc.agg(
        F.sum("n_pretokens").alias("pre"), F.sum("n_tokens").alias("post")
    ).collect()[0]
    reduction = tot.pre - tot.post
    assert reduction >= merges[1] > 0
    # greedy non-overlapping merges can never remove more occurrences
    # than were counted at selection time, summed over rounds
    assert reduction <= sum(merges.values())


def test_trained_state_is_shared_between_trainer_and_encoder(spark):
    from cdc_cascade_spark.llm import bpe

    bpe._TRAIN_CACHE.clear()
    bpe.bpe_train_k_merges(spark, SF).collect()
    assert len(bpe._TRAIN_CACHE) == 1
    key = next(iter(bpe._TRAIN_CACHE))
    before = bpe._TRAIN_CACHE[key]
    bpe.bpe_encode_corpus(spark, SF).collect()
    assert bpe._TRAIN_CACHE[key] is before  # no retrain


# ---------------------------------------------------------------------------
# bpe_fertility_by_lang (r8-built, registers r9): per-lang rollup of the
# encode output — oracle agreement + exact consistency with the encode.
# ---------------------------------------------------------------------------


def test_bpe_fertility_oracle_agrees(spark):
    from cdc_cascade_spark.llm.bpe import (
        ORACLE_BPE_FERTILITY,
        bpe_fertility_by_lang,
    )
    from cdc_cascade_spark.testing.parity import compare, duckdb_connect

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        res = compare(
            "bpe_fertility_by_lang",
            bpe_fertility_by_lang(spark, sf).toPandas(),
            duckdb_connect(sf).execute(ORACLE_BPE_FERTILITY).df(),
        )
        assert res.ok, str(res)
        assert res.spark_rows > 0


def test_bpe_fertility_reconciles_with_encode(spark):
    from cdc_cascade_spark.catalog import load_table
    from cdc_cascade_spark.llm.bpe import bpe_encode_corpus, bpe_fertility_by_lang

    sf = "/root/testdata/sf0.001"
    enc = {r.doc_id: r for r in bpe_encode_corpus(spark, sf).collect()}
    langs = {
        r.doc_id: r.lang
        for r in load_table(spark, sf, "documents").select("doc_id", "lang").collect()
    }
    for row in bpe_fertility_by_lang(spark, sf).collect():
        ids = [d for d, lg in langs.items() if lg == row.lang]
        assert row.n_docs == len(ids)
        assert row.sum_pretokens == sum(enc[d].n_pretokens for d in ids)
        assert row.sum_tokens == sum(enc[d].n_tokens for d in ids)
        assert row.symbols_per_word == row.sum_tokens / row.sum_pretokens
        assert row.symbols_per_word > 0
