"""Incremental materialized-aggregate maintenance from changelog streams.

The composition the lakehouse surface has been building toward (r10
verdict: "consume upstream DML as a stream, maintain a derived table
exactly-once"): a ``_change_type``-annotated changes stream
(streaming/source.py iceberg_changes / delta_changes, or delta-spark's
readChangeFeed) drives a derived GROUP BY aggregate table that is
updated incrementally — per micro-batch cost is O(|changes|), never a
recompute of the upstream table.

Retractable aggregates only: SUM and COUNT (AVG = maintained sum /
maintained count at read time). MIN/MAX are not retractable from a
changelog without re-scanning the group and are refused by name.
NULL semantics: contributions that are NULL in a summed column are
ignored (SQL SUM), and the maintained total coalesces to 0 on both
sides of the arithmetic merge — so a group whose LIVE rows are all
NULL in a summed column maintains 0 where a from-scratch SQL SUM
yields NULL (the one documented divergence; counts are exact).

How a batch applies (classic delta-propagation):
  weight  = +1 for insert / update_postimage, -1 for delete /
            update_preimage
  deltas  = SELECT keys, SUM(col * weight) AS <sum_col>...,
            SUM(weight) AS <count_col> GROUP BY keys
  target  = MERGE: matched -> t.col + s.col (delete the row when the
            maintained count reaches zero), unmatched -> insert
Delta targets do this in ONE atomic commit (merge_delta_native's
when_matched_delete branch); Iceberg targets publish one snapshot via
the equality-delete upsert with delete-only keys for retired groups.
Exactly-once rides the same txn/summary markers as the plain streaming
sinks (streaming/sink.py): a checkpoint-replayed batch is skipped.

Scale: the per-batch shuffle is the delta aggregation (|changes| rows,
map-side combined); the MERGE probe touches only target files holding
matched keys (Delta) / an O(|batch|) equality delete (Iceberg). Nothing
here reads the upstream table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PLUS = ("insert", "update_postimage")
_MINUS = ("delete", "update_preimage")


def changelog_deltas(changes: DataFrame, group_by: list[str],
                     sums: dict[str, str],
                     count_col: str = "n_rows") -> DataFrame:
    """Per-key aggregate deltas of one changelog micro-batch.

    ``sums`` maps output column -> source column to SUM;
    ``count_col`` receives the row-count delta. Unknown _change_type
    values fail the batch loudly (a silently-dropped change type would
    corrupt the aggregate forever)."""
    if count_col in sums or count_col in group_by:
        raise ValueError(f"count column {count_col!r} collides")
    w = (
        F.when(F.col("_change_type").isin(*_PLUS), F.lit(1))
        .when(F.col("_change_type").isin(*_MINUS), F.lit(-1))
    )
    aggs = [
        F.sum(F.col(src) * F.col("_w")).alias(dst)
        for dst, src in sums.items()
    ] + [F.sum("_w").alias(count_col)]
    bad = F.sum(F.when(F.col("_w").isNull(), 1).otherwise(0))
    out = (
        changes.withColumn("_w", w)
        .groupBy(*group_by)
        .agg(*aggs, bad.alias("_bad"))
    )
    # fold the unknown-change-type check into the same aggregation: any
    # _bad > 0 surfaces as an error column the writer asserts on
    return out


def _split_assert_known(deltas: DataFrame,
                        group_by: list[str]) -> DataFrame:
    bad = deltas.filter("_bad > 0").limit(1).collect()
    if bad:
        raise ValueError(
            "changelog batch contains an unknown _change_type for key "
            f"{tuple(bad[0][c] for c in group_by)!r}; known: "
            f"{sorted(_PLUS + _MINUS)}"
        )
    return deltas.drop("_bad")


def _assert_no_orphan_negative(out: DataFrame, group_by: list[str],
                               count_col: str,
                               target_keys: DataFrame | None = None):
    """A negative count delta for a group the MV has never counted
    (no target row — or no target at all on the creation batch) means
    the changelog is inconsistent with this MV; silently dropping it
    would strand the divergence forever (r12 review pass 2). The probe
    runs only when a negative delta actually exists (rare)."""
    negs = out.filter(F.col(count_col) < 0)
    if target_keys is not None:
        negs = negs.join(target_keys, group_by, "left_anti")
    stray = negs.limit(1).collect()
    if stray:
        raise ValueError(
            "negative count delta for group the MV has never seen "
            f"{tuple(stray[0][k] for k in group_by)!r}: the changelog "
            "is inconsistent with this MV (attached mid-history?)"
        )


def delta_mv_writer(path: str, app_id: str, group_by: list[str],
                    sums: dict[str, str], count_col: str = "n_rows"):
    """foreachBatch callback maintaining a Delta aggregate table.

    One atomic MERGE commit per batch: matched groups add the deltas
    (and DELETE when the maintained count hits zero), new groups
    insert. Exactly-once via the txn marker."""
    from glaredb_spark.sources.delta_native import (
        merge_delta_native,
        write_delta_native,
    )
    from glaredb_spark.streaming.sink import last_committed_batch

    import os

    out_cols = [*group_by, *sums, count_col]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(path, app_id):
            return  # checkpoint replay of an already-committed batch
        # persisted: the _bad assertion and the merge consume the same
        # aggregation once, not twice (r12 review)
        deltas = changelog_deltas(
            batch_df, group_by, sums, count_col
        ).persist()
        try:
            _split_assert_known(deltas, group_by)
            out = deltas.select(*out_cols)
            if not os.path.isdir(os.path.join(path, "_delta_log")):
                _assert_no_orphan_negative(out, group_by, count_col)
                write_delta_native(
                    out.filter(F.col(count_col) > 0), path,
                    txn=(app_id, batch_id),
                )
                return
            # a NEGATIVE maintained count (changelog inconsistent with
            # the MV — attached mid-history?) fails the rewrite job
            # loudly via assert_true instead of persisting corruption;
            # a negative delta for a group the MV has never seen is
            # the same inconsistency on the insert side
            from glaredb_spark.sources.delta_native import (
                read_delta_native,
            )

            # the target-key scan + anti-join is the expensive half of
            # the probe — pay it only when a negative delta actually
            # exists (rare; the persisted deltas make this limit(1)
            # probe cheap — r12 advisor)
            if out.filter(F.col(count_col) < 0).limit(1).collect():
                _assert_no_orphan_negative(
                    out, group_by, count_col,
                    target_keys=read_delta_native(
                        batch_df.sparkSession, path
                    ).select(*group_by),
                )
            upd = {
                c: f"coalesce(t.{c}, 0) + coalesce(s.{c}, 0)"
                for c in sums
            }
            upd[count_col] = (
                f"coalesce(t.{count_col}, 0) + coalesce(s.{count_col},"
                f" 0) + CASE WHEN t.{count_col} + s.{count_col} < 0 "
                f"THEN CAST(assert_true(false, 'maintained count went "
                f"negative: the changelog is inconsistent with this MV"
                f" (attached mid-history?)') AS BIGINT) ELSE 0 END"
            )
            merge_delta_native(
                batch_df.sparkSession, path, out, group_by,
                # coalesce both sides: a batch whose contributions to a
                # sum column are all NULL has a NULL delta, and
                # NULL + x would poison the maintained total forever.
                # Documented divergence from a recompute: a group whose
                # live rows are ALL NULL in a summed column maintains
                # 0, where SQL SUM yields NULL.
                when_matched_update=upd,
                when_matched_delete=f"t.{count_col} + s.{count_col} = 0",
                # a group born and fully deleted inside one batch nets
                # to count 0 — it must not materialize as a phantom row
                when_not_matched_condition=f"{count_col} > 0",
                txn=(app_id, batch_id),
            )
        finally:
            deltas.unpersist()

    return write_batch


def iceberg_mv_writer(path: str, app_id: str, group_by: list[str],
                      sums: dict[str, str], count_col: str = "n_rows"):
    """foreachBatch callback maintaining an Iceberg v2 aggregate table.

    One snapshot per batch: current values of the MATCHED groups are
    read (semi-join on the batch's keys — the delta side broadcasts),
    summed with the deltas, and published through the equality-delete
    upsert; groups whose count reaches zero ride the same snapshot as
    delete-only keys. Exactly-once via the snapshot summary marker."""
    import os as _os

    from glaredb_spark.sources.iceberg_native import (
        read_iceberg_native,
        upsert_iceberg_native,
        write_iceberg_native,
    )
    from glaredb_spark.streaming.sink import last_committed_batch_iceberg

    out_cols = [*group_by, *sums, count_col]
    marker = lambda b: {  # noqa: E731
        "glaredb-app-id": app_id, "glaredb-batch-id": str(b),
    }

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch_iceberg(path, app_id):
            return
        spark = batch_df.sparkSession
        # persisted: the _bad assertion and the merge join consume the
        # same aggregation once, not twice (r12 review)
        agg = changelog_deltas(
            batch_df, group_by, sums, count_col
        ).persist()
        try:
            _split_assert_known(agg, group_by)
            deltas = agg.select(*out_cols)
            mdir = _os.path.join(path, "metadata")
            import glob as _glob

            if not _glob.glob(_os.path.join(mdir, "*.metadata.json")):
                # creation batch: every negative delta is by definition
                # for a group this MV has never counted (r12 review 2)
                _assert_no_orphan_negative(deltas, group_by, count_col)
                write_iceberg_native(
                    deltas.filter(F.col(count_col) > 0), path,
                    format_version=2, summary_extra=marker(batch_id),
                )
                return
            vals = [*sums, count_col]
            renamed = deltas
            for c in vals:
                renamed = renamed.withColumnRenamed(c, f"_d_{c}")
            _inner_batch(spark, renamed, vals, batch_id)
        finally:
            agg.unpersist()

    def _inner_batch(spark, renamed, vals, batch_id):
        renamed = renamed.persist()
        try:
            cur = read_iceberg_native(spark, path).select(
                *group_by, *vals
            ).join(F.broadcast(renamed), group_by, "right")
            # coalesce BOTH sides (same NULL-poisoning guard and
            # documented all-NULL-group divergence as the Delta writer)
            merged = cur.select(
                *group_by,
                *[
                    (F.coalesce(F.col(c), F.lit(0))
                     + F.coalesce(F.col(f"_d_{c}"), F.lit(0))).alias(c)
                    for c in vals
                ],
            ).persist()
            try:
                # a NEGATIVE merged count means the changelog carried
                # more deletes for a group than this MV ever counted
                # (e.g. the stream was attached past the group's
                # inserts) — silently skipping it would strand a stale
                # row forever; fail the batch loudly instead
                # (r12 review)
                neg = merged.filter(
                    F.col(count_col) < 0
                ).limit(1).collect()
                if neg:
                    raise ValueError(
                        "maintained count went negative for group "
                        f"{tuple(neg[0][k] for k in group_by)!r}: the "
                        "changelog is inconsistent with this MV "
                        "(attached mid-history?)"
                    )
                keep = merged.filter(F.col(count_col) > 0)
                dead = merged.filter(F.col(count_col) == 0) \
                    .select(*group_by)
                upsert_iceberg_native(
                    spark, path, keep, group_by,
                    summary_extra=marker(batch_id),
                    delete_keys=dead,
                )
            finally:
                merged.unpersist()
        finally:
            renamed.unpersist()

    return write_batch


def stream_maintain_delta(changes: DataFrame, path: str, checkpoint: str,
                          app_id: str, group_by: list[str],
                          sums: dict[str, str],
                          count_col: str = "n_rows"):
    """``changes.writeStream`` maintaining a Delta aggregate table from
    a changelog stream. Returns the (unstarted) DataStreamWriter."""
    return (
        changes.writeStream.foreachBatch(
            delta_mv_writer(path, app_id, group_by, sums, count_col)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def stream_maintain_iceberg(changes: DataFrame, path: str,
                            checkpoint: str, app_id: str,
                            group_by: list[str], sums: dict[str, str],
                            count_col: str = "n_rows"):
    """``changes.writeStream`` maintaining an Iceberg v2 aggregate table
    from a changelog stream. Returns the (unstarted)
    DataStreamWriter."""
    return (
        changes.writeStream.foreachBatch(
            iceberg_mv_writer(path, app_id, group_by, sums, count_col)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
