"""Scaling A/B for VERDICT r17 #6: run the heavy LLM-family slots on a
10x-replicated sf0.1 corpus (documents/embeddings id-offset x10 ->
/root/sfbig, ~sf1 volume for those tables) at $SPARK_GRAFT_CPUS cores,
bench methodology (1 cold + 3 warm, median of warm, noop sink).

Usage: SPARK_GRAFT_CPUS=32 python plans/r18/scaling_ab.py <label>
Appends one JSON line to plans/r18/scaling_log.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

NAMES = [
    "bm25_topk",
    "contamination_check",
    "dedup_embedding_cosine",
    "ann_lsh_multitable_topk",
    "embedding_top_pairs",
    "chunk_retrieval_eval",
    "retrieval_mrr_indexed",
    "retrieval_mrr_summary",
    "curate_corpus_incremental",
]


def main() -> None:
    label = sys.argv[1]
    sf_dir = "/root/sfbig"

    from cdc_cascade_spark.registry import queries
    from cdc_cascade_spark.session import get_spark
    from cdc_cascade_spark.catalog import load_table

    spark = get_spark(app_name=f"scaling-{label}")
    for t in ("documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    from pyspark.sql import functions as F  # noqa: N812
    from cdc_cascade_spark.llm.similarity import _norm_pd

    load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    ).select(_norm_pd(F.col("embedding")).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()

    from cdc_cascade_spark.llm.dedup import warm_shared_frames

    warm_shared_frames(spark, sf_dir)

    reg = queries()
    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in NAMES:
        fn = reg[name]
        runs: list[float] = []
        for _pass in range(4):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        cold[name] = runs[0]
        warm[name] = sorted(runs[1:])[1]

    out = {
        "label": label,
        "cpus": spark.sparkContext.defaultParallelism,
        "queries": warm,
        "queries_cold": cold,
    }
    line = json.dumps(out)
    print(line)
    with open(Path(__file__).parent / "scaling_log.jsonl", "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
