"""Exactly-once streaming Delta sink (foreachBatch + `txn` idempotence).

The reference engine is batch-only (SURVEY.md §2.7); this completes the
streaming extension's output side: a Structured Streaming query lands
micro-batches in a native Delta table (sources/delta_native.py) with
exactly-once semantics across restarts.

How exactly-once works (the same recipe as the Delta Spark connector's
streaming sink): every micro-batch commit carries a spec ``txn`` action
``(appId, version=batch_id)``. On restart, Structured Streaming replays
the last unacknowledged batch from its checkpoint; the sink first reads
the table's latest committed version for this ``appId`` from the
transaction log and SKIPS any batch whose id is already committed — the
replay becomes a no-op instead of a duplicate append.

Scale: the dedupe check is one driver-side fold of the KB-scale log (the
same fold every Delta reader does); batch data lands via the distributed
parquet writer. State store ∝ the upstream query, not this sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from glaredb_spark.sources.delta_native import (
    load_delta_state,
    write_delta_native,
)


def last_committed_batch(path: str, app_id: str) -> int:
    """Latest batch id committed for app_id, or -1 (missing table or no
    txn actions yet)."""
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        return -1
    try:
        state = load_delta_state(path)
    except RuntimeError:
        return -1
    return state.txns.get(app_id, -1)


def delta_batch_writer(path: str, app_id: str, partition_by=None):
    """The foreachBatch callback: idempotent exactly-once append."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(path, app_id):
            return  # checkpoint replay of an already-committed batch
        write_delta_native(
            batch_df,
            path,
            mode="append",
            partition_by=partition_by,
            txn=(app_id, batch_id),
        )

    return write_batch


def stream_to_delta(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    app_id: str,
    partition_by=None,
):
    """``stream.writeStream`` into a native Delta table with exactly-once
    batch commits. Returns the (unstarted) DataStreamWriter so callers
    pick the trigger."""
    return (
        stream.writeStream.foreachBatch(
            delta_batch_writer(path, app_id, partition_by)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
