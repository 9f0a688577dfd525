"""Same-session A/B measurement for a subset of registered queries,
using bench.py's exact methodology (warmup of tables/python workers/
shared frames, then per query: 1 cold pass + 3 warm passes, noop sink,
median of warm). Usage:

    python plans/r18/measure.py <label> <query> [<query> ...]

Prints one JSON line {"label": ..., "queries": {name: warm_med},
"queries_cold": {...}} and appends it to plans/r18/ab_log.jsonl.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"

    from cdc_cascade_spark.registry import queries
    from cdc_cascade_spark.session import get_spark
    from cdc_cascade_spark.catalog import TABLES, load_table

    spark = get_spark(app_name=f"ab-{label}")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    _warm = pandas_udf(lambda x: x, LongType())
    spark.range(100).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    from pyspark.sql import functions as F  # noqa: N812
    from cdc_cascade_spark.llm.similarity import _norm_pd

    load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    ).select(_norm_pd(F.col("embedding")).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()

    from cdc_cascade_spark.cdc.queries import envelopes_from_events

    envelopes_from_events(spark, sf_dir).count()

    from cdc_cascade_spark.llm.dedup import warm_shared_frames

    warm_shared_frames(spark, sf_dir)

    reg = queries()
    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:
        fn = reg[name]
        runs: list[float] = []
        for _pass in range(4):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        cold[name] = runs[0]
        warm[name] = sorted(runs[1:])[1]

    out = {"label": label, "queries": warm, "queries_cold": cold}
    line = json.dumps(out)
    print(line)
    with open(Path(__file__).parent / "ab_log.jsonl", "a") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
