"""Capture .explain("formatted") for every registered query into
plans/r18/<out_subdir>/<name>.txt, plus a one-line plan-shape summary
(Exchange count / join nodes / Python-eval nodes) per query.

Usage: python plans/r18/capture_plans.py <out_subdir> [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

OUT = Path("/root/repo/plans/r18") / (sys.argv[1] if len(sys.argv) > 1 else "baseline")
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    from cdc_cascade_spark.registry import queries
    from cdc_cascade_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    OUT.mkdir(parents=True, exist_ok=True)
    summary = []
    for name, fn in sorted(queries().items()):
        try:
            df = fn(spark, SF)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001
            txt = f"ERROR: {ex!r}"
        (OUT / f"{name}.txt").write_text(txt)
        n_ex = len(re.findall(r"\bExchange\b", txt))
        joins = sorted(set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", txt)))
        pyev = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", txt)))
        wins = len(re.findall(r"\bWindow\b", txt))
        summary.append(f"{name}\texch={n_ex}\twin={wins}\tjoins={','.join(joins) or '-'}\tpy={','.join(pyev) or '-'}")
    (OUT / "_summary.tsv").write_text("\n".join(summary) + "\n")
    print(f"wrote {len(summary)} plans to {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
