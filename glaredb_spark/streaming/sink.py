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


# --- Iceberg streaming upsert sink (r8) -------------------------------------
#
# The Iceberg counterpart of stream_to_delta, with UPSERT semantics:
# each micro-batch commits ONE snapshot carrying an equality-delete file
# over the batch's key columns plus the batch's data files
# (sources/iceberg_native.py:upsert_iceberg_native — sequence-number
# scoping makes the delete apply to prior data only). Iceberg has no
# `txn` action; idempotence rides the snapshot summary instead (the same
# convention the Iceberg Spark sink uses): every commit records
# glaredb-app-id/glaredb-batch-id, and a checkpoint-replayed batch whose
# id is already committed becomes a no-op.


def last_committed_batch_iceberg(path: str, app_id: str) -> int:
    """Latest batch id committed for app_id per the snapshot summaries,
    or -1 (missing table / no marked snapshots)."""
    from glaredb_spark.sources.iceberg_native import (
        IcebergError,
        table_metadata,
    )

    try:
        meta = table_metadata(path)
    except (IcebergError, OSError):
        return -1
    best = -1
    for s in meta.get("snapshots", []):
        summ = s.get("summary", {})
        if summ.get("glaredb-app-id") == app_id:
            try:
                best = max(best, int(summ.get("glaredb-batch-id", -1)))
            except (TypeError, ValueError):
                continue
    return best


def iceberg_upsert_writer(
    path: str, app_id: str, on: list[str],
    maintenance_every: "int | None" = None,
):
    """The foreachBatch callback: idempotent exactly-once upsert.

    ``maintenance_every=N`` closes the equality-delete LIFECYCLE inline
    (r9): every N committed batches the sink PURGEs (materializes the
    accumulated per-batch equality-delete files back to plain COW) and
    compacts — so a long-running stream's table never accumulates
    unbounded delete files even though each micro-batch commits one.
    Maintenance commits are plain "replace" snapshots: the batch-id
    idempotence markers live in earlier snapshot summaries and survive
    (snapshot EXPIRATION is deliberately not done here — expiring a
    marker-carrying snapshot could re-apply a replayed batch; run
    VACUUM / expire_snapshots with a retention longer than the
    checkpoint replay horizon instead). If the stream dies between the
    upsert commit and maintenance, the replay skips both (the batch is
    marked committed) and maintenance simply fires at the next
    boundary."""
    from glaredb_spark.sources.iceberg_native import upsert_iceberg_native

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch_iceberg(path, app_id):
            return  # checkpoint replay of an already-committed batch
        upsert_iceberg_native(
            batch_df.sparkSession, path, batch_df, on,
            summary_extra={
                "glaredb-app-id": app_id,
                "glaredb-batch-id": str(batch_id),
            },
        )
        if maintenance_every and (batch_id + 1) % maintenance_every == 0:
            from glaredb_spark.sources.iceberg_native import (
                optimize_iceberg_native,
                purge_iceberg_native,
            )

            spark = batch_df.sparkSession
            purge_iceberg_native(spark, path)
            # small-file compaction ONLY: a full-table rewrite per
            # boundary would cost O(table) — large files carry forward
            optimize_iceberg_native(
                spark, path, min_file_bytes=64 * 1024 * 1024
            )

    return write_batch


def stream_upsert_to_iceberg(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    app_id: str,
    on: list[str],
    maintenance_every: "int | None" = None,
):
    """``stream.writeStream`` upserting into a native Iceberg v2 table
    with exactly-once batch commits (``maintenance_every=N`` purges +
    compacts every N batches — see iceberg_upsert_writer). Returns the
    (unstarted) DataStreamWriter so callers pick the trigger."""
    return (
        stream.writeStream.foreachBatch(
            iceberg_upsert_writer(
                path, app_id, on, maintenance_every=maintenance_every
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def delta_upsert_writer(path: str, app_id: str, on: list[str]):
    """foreachBatch callback: idempotent exactly-once UPSERT into a
    native Delta table (merge_delta_native per batch — delta-spark's
    foreachBatch+MERGE recipe; the txn marker rides the merge commit).
    The first batch creates the table."""
    from glaredb_spark.sources.delta_native import (
        merge_delta_native,
        write_delta_native,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(path, app_id):
            return  # checkpoint replay of an already-committed batch
        if not os.path.isdir(os.path.join(path, "_delta_log")):
            write_delta_native(
                batch_df, path, mode="append", txn=(app_id, batch_id)
            )
            return
        merge_delta_native(
            batch_df.sparkSession, path, batch_df, on,
            txn=(app_id, batch_id),
        )

    return write_batch


def stream_upsert_to_delta(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    app_id: str,
    on: list[str],
):
    """``stream.writeStream`` upserting into a native Delta table with
    exactly-once batch commits. Returns the (unstarted)
    DataStreamWriter so callers pick the trigger."""
    return (
        stream.writeStream.foreachBatch(
            delta_upsert_writer(path, app_id, on)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
