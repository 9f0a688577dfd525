"""Streaming corpus monitoring: per-micro-batch drift reports.

Wires ``llm/drift.py::corpus_drift`` into the ingest path: every
micro-batch of incoming documents is compared against a static
reference slice, and the four-metric drift report is appended (keyed
by batch_id) to a parquet monitoring table. A scraper regression or a
source going dark shows up as a report row in the SAME pipeline run
that ingested the bad batch — before the data reaches curation or the
trainer.

foreachBatch gives each micro-batch full batch semantics, so the exact
batch operator runs unchanged (no duplicated streaming variant to keep
in sync). The reference frame is lineage-snapshotted ONCE at monitor
start; its distribution aggregates still re-execute per batch — cheap
against the snapshot at monitoring cadence. At production scale,
precompute the reference's unigram/lang/stat frames to storage and
join those instead (the drift module's internals are factored so the
frames are the interface).

Oracle-gate exclusion: streaming + two-frame operator (see
llm/drift.py and streaming/joins.py docstrings for the standing
reasons); the gate is the end-to-end test driving a clean batch and a
boilerplate-flooded batch through the monitor and pinning that only
the flooded batch trips the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cdc_cascade_spark.llm.drift import corpus_drift


def start_drift_monitor(
    stream_docs: DataFrame,
    ref_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Write one (batch_id, metric, value) row per drift metric per
    micro-batch to ``out_dir/batch_id=N``. Returns the StreamingQuery.

    foreachBatch is at-least-once, so the write must be replay-
    idempotent: each batch OVERWRITES its own ``batch_id=N`` partition
    (the same idiom as the dead-letter quarantine in
    ``streaming/pipeline.py``) — a batch replayed after a crash between
    write and checkpoint commit replaces its rows instead of
    duplicating them, and consumers aggregating the monitoring table
    never double-count."""
    ref = ref_docs.localCheckpoint(eager=True)

    def _report(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            corpus_drift(ref, batch_df)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(_report)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
