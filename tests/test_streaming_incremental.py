"""Incremental materialized-aggregate maintenance from changelog streams
(streaming/incremental.py): the end-to-end composition — upstream DML →
changes stream → exactly-once per-batch delta MERGE into a derived
aggregate table — proven equal to a from-scratch recompute after every
round of DML, on BOTH lakehouse formats."""

import pytest
from pyspark.sql import functions as F

from glaredb_spark.streaming.incremental import (
    changelog_deltas,
    delta_mv_writer,
    iceberg_mv_writer,
    stream_maintain_delta,
    stream_maintain_iceberg,
)
from glaredb_spark.streaming.source import register_stream_sources

GROUP = ["g"]
SUMS = {"total": "v"}


def _expected(upstream_df):
    return sorted(
        (r["g"], r["total"], r["n_rows"])
        for r in upstream_df.groupBy("g")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    )


def _mv_rows(df):
    return sorted(
        (r["g"], r["total"], r["n_rows"]) for r in df.collect()
    )


def test_changelog_deltas_weights(spark):
    ch = spark.createDataFrame(
        [
            ("a", 10, "insert"),
            ("a", 3, "delete"),
            ("a", 3, "insert"),
            ("b", 7, "update_preimage"),
            ("b", 9, "update_postimage"),
        ],
        "g string, v long, _change_type string",
    )
    got = sorted(
        (r["g"], r["total"], r["n_rows"])
        for r in changelog_deltas(ch, GROUP, SUMS).drop("_bad").collect()
    )
    assert got == [("a", 10, 1), ("b", 2, 0)]


def test_unknown_change_type_fails(spark, tmp_path):
    ch = spark.createDataFrame(
        [("a", 1, "mystery")], "g string, v long, _change_type string"
    )
    w = delta_mv_writer(str(tmp_path / "mv"), "app", GROUP, SUMS)
    with pytest.raises(ValueError, match="unknown _change_type"):
        w(ch, 0)


def _run_stream_delta(spark, upstream, mv, ck):
    q = stream_maintain_delta(
        spark.readStream.format("delta_changes")
        .option("path", upstream).load(),
        mv, ck, "mv_app", GROUP, SUMS,
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)


def test_delta_mv_end_to_end(spark, tmp_path):
    """Upstream Delta table with CDF → delta_changes stream →
    incrementally maintained aggregate == batch recompute after
    inserts, updates, deletes, and a whole-group retirement."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        read_delta_native,
        update_delta_native,
        write_delta_native,
    )

    register_stream_sources(spark)
    up = str(tmp_path / "up")
    mv = str(tmp_path / "mv")
    ck = str(tmp_path / "ck")
    rows = [(i, "g%d" % (i % 3), i * 10) for i in range(12)]
    write_delta_native(
        spark.createDataFrame(rows, "id long, g string, v long"),
        up, enable_cdf=True,
    )
    _run_stream_delta(spark, up, mv, ck)
    assert _mv_rows(read_delta_native(spark, mv)) == _expected(
        read_delta_native(spark, up).select("g", "v")
    )

    # round 2: DML upstream, resume the SAME checkpoint
    update_delta_native(spark, up, {"v": "v + 1000"}, "id < 4")
    delete_delta_native(spark, up, "id = 7")
    write_delta_native(
        spark.createDataFrame([(100, "g0", 5)],
                              "id long, g string, v long"),
        up, mode="append",
    )
    _run_stream_delta(spark, up, mv, ck)
    assert _mv_rows(read_delta_native(spark, mv)) == _expected(
        read_delta_native(spark, up).select("g", "v")
    )

    # round 3: retire group g1 entirely — its MV row must VANISH
    delete_delta_native(spark, up, "g = 'g1'")
    _run_stream_delta(spark, up, mv, ck)
    got = _mv_rows(read_delta_native(spark, mv))
    assert got == _expected(read_delta_native(spark, up).select("g", "v"))
    assert all(g != "g1" for g, _t, _n in got)


def test_same_batch_create_and_delete_no_phantom(spark, tmp_path):
    """A group born and fully deleted within ONE batch nets to count 0
    and must not materialize in the MV, on either format."""
    from glaredb_spark.sources.delta_native import read_delta_native
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    ch0 = spark.createDataFrame(
        [("a", 5, "insert")], "g string, v long, _change_type string"
    )
    ch1 = spark.createDataFrame(
        [("z", 9, "insert"), ("z", 9, "delete"), ("a", 1, "insert")],
        "g string, v long, _change_type string",
    )
    dmv = str(tmp_path / "dmv")
    w = delta_mv_writer(dmv, "app", GROUP, SUMS)
    w(ch0, 0)
    w(ch1, 1)
    assert _mv_rows(read_delta_native(spark, dmv)) == [("a", 6, 2)]

    imv = str(tmp_path / "imv")
    wi = iceberg_mv_writer(imv, "app", GROUP, SUMS)
    wi(ch0, 0)
    wi(ch1, 1)
    assert _mv_rows(read_iceberg_native(spark, imv)) == [("a", 6, 2)]


def test_delta_mv_replay_idempotent(spark, tmp_path):
    """A checkpoint-replayed batch must not double-apply (txn marker)."""
    from glaredb_spark.sources.delta_native import (
        read_delta_native,
        write_delta_native,
    )

    up_rows = spark.createDataFrame(
        [("a", 5, "insert"), ("b", 6, "insert")],
        "g string, v long, _change_type string",
    )
    mv = str(tmp_path / "mv")
    w = delta_mv_writer(mv, "app", GROUP, SUMS)
    w(up_rows, 0)
    w(up_rows, 0)  # replay
    assert _mv_rows(read_delta_native(spark, mv)) == [
        ("a", 5, 1), ("b", 6, 1)
    ]


def _run_stream_iceberg(spark, upstream, mv, ck):
    q = stream_maintain_iceberg(
        spark.readStream.format("iceberg_changes")
        .option("path", upstream).load(),
        mv, ck, "mv_app", GROUP, SUMS,
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)


def test_iceberg_mv_end_to_end(spark, tmp_path):
    """Upstream Iceberg v2 MoR DML → iceberg_changes stream →
    incrementally maintained aggregate == batch recompute, including a
    group retirement via equality delete."""
    from glaredb_spark.sources.iceberg_native import (
        equality_delete_iceberg_native,
        read_iceberg_native,
        upsert_iceberg_native,
        write_iceberg_native,
    )

    register_stream_sources(spark)
    up = str(tmp_path / "up")
    mv = str(tmp_path / "mv")
    ck = str(tmp_path / "ck")
    rows = [(i, "g%d" % (i % 3), i * 10) for i in range(12)]
    write_iceberg_native(
        spark.createDataFrame(rows, "id long, g string, v long")
        .coalesce(1),
        up, format_version=2,
    )
    _run_stream_iceberg(spark, up, mv, ck)
    assert _mv_rows(read_iceberg_native(spark, mv)) == _expected(
        read_iceberg_native(spark, up).select("g", "v")
    )

    # round 2: MoR upsert (update id=2, insert id=200) + eq delete id=7
    upsert_iceberg_native(
        spark, up,
        spark.createDataFrame(
            [(2, "g2", 9999), (200, "g0", 5)],
            "id long, g string, v long",
        ),
        on=["id"],
    )
    equality_delete_iceberg_native(
        spark, up, spark.createDataFrame([(7,)], "id long")
    )
    _run_stream_iceberg(spark, up, mv, ck)
    assert _mv_rows(read_iceberg_native(spark, mv)) == _expected(
        read_iceberg_native(spark, up).select("g", "v")
    )

    # round 3: retire g1 entirely
    g1_ids = [
        (r["id"],) for r in read_iceberg_native(spark, up)
        .filter("g = 'g1'").select("id").collect()
    ]
    equality_delete_iceberg_native(
        spark, up, spark.createDataFrame(g1_ids, "id long")
    )
    _run_stream_iceberg(spark, up, mv, ck)
    got = _mv_rows(read_iceberg_native(spark, mv))
    assert got == _expected(
        read_iceberg_native(spark, up).select("g", "v")
    )
    assert all(g != "g1" for g, _t, _n in got)


def test_iceberg_mv_replay_idempotent(spark, tmp_path):
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    ch = spark.createDataFrame(
        [("a", 5, "insert"), ("b", 6, "insert")],
        "g string, v long, _change_type string",
    )
    mv = str(tmp_path / "mv")
    w = iceberg_mv_writer(mv, "app", GROUP, SUMS)
    w(ch, 0)
    w(ch, 0)  # replay
    assert _mv_rows(read_iceberg_native(spark, mv)) == [
        ("a", 5, 1), ("b", 6, 1)
    ]


def test_min_max_refused_by_docs():
    """MIN/MAX are not retractable — the module documents the refusal;
    this is a doc-contract probe, not a runtime path."""
    import glaredb_spark.streaming.incremental as inc

    assert "MIN/MAX are not retractable" in inc.__doc__


def test_null_contributions_do_not_poison(spark, tmp_path):
    """A batch whose contributions to a summed column are all NULL has
    a NULL delta; the arithmetic merge must coalesce, not propagate the
    NULL into the maintained total, on both formats."""
    from glaredb_spark.sources.delta_native import read_delta_native
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    ch0 = spark.createDataFrame(
        [("a", 5, "insert")], "g string, v long, _change_type string"
    )
    ch1 = spark.createDataFrame(
        [("a", None, "insert")], "g string, v long, _change_type string"
    )
    ch2 = spark.createDataFrame(
        [("a", 7, "insert")], "g string, v long, _change_type string"
    )
    for fmt, writer, reader in (
        ("delta", delta_mv_writer, read_delta_native),
        ("iceberg", iceberg_mv_writer, read_iceberg_native),
    ):
        mv = str(tmp_path / f"mv_{fmt}")
        w = writer(mv, "app", GROUP, SUMS)
        w(ch0, 0)
        w(ch1, 1)  # NULL delta for the sum column, count +1
        w(ch2, 2)
        assert _mv_rows(reader(spark, mv)) == [("a", 12, 3)], fmt


def test_iceberg_negative_count_fails_loudly(spark, tmp_path):
    """A merged count below zero (changelog inconsistent with the MV —
    e.g. attached mid-history) must fail the batch, not strand a stale
    row silently (r12 review)."""
    mv = str(tmp_path / "neg")
    w = iceberg_mv_writer(mv, "app", GROUP, SUMS)
    w(spark.createDataFrame([("a", 5, "insert")],
                            "g string, v long, _change_type string"), 0)
    two_deletes = spark.createDataFrame(
        [("a", 5, "delete"), ("a", 9, "delete")],
        "g string, v long, _change_type string",
    )
    with pytest.raises(ValueError, match="negative"):
        w(two_deletes, 1)


def test_delta_negative_count_fails_loudly(spark, tmp_path):
    """The Delta twin of the Iceberg negative-count guard (r12 review
    pass 2): a matched group driven below zero fails the merge job; an
    unmatched negative group fails the pre-probe."""
    mv = str(tmp_path / "dneg")
    w = delta_mv_writer(mv, "app", GROUP, SUMS)
    w(spark.createDataFrame([("a", 5, "insert")],
                            "g string, v long, _change_type string"), 0)
    with pytest.raises(Exception, match="negative"):
        w(spark.createDataFrame(
            [("a", 5, "delete"), ("a", 9, "delete")],
            "g string, v long, _change_type string"), 1)
    with pytest.raises(ValueError, match="never seen"):
        w(spark.createDataFrame(
            [("ghost", 1, "delete")],
            "g string, v long, _change_type string"), 2)


def _expected_mm(upstream_df):
    return sorted(
        (r["g"], r["total"], r["n_rows"], r["v_min"], r["v_max"])
        for r in upstream_df.groupBy("g")
        .agg(F.sum("v").alias("total"),
             F.count(F.lit(1)).alias("n_rows"),
             F.min("v").alias("v_min"),
             F.max("v").alias("v_max"))
        .collect()
    )


def _mm_rows(df):
    return sorted(
        (r["g"], r["total"], r["n_rows"], r["v_min"], r["v_max"])
        for r in df.collect()
    )


def test_iceberg_mv_minmax_end_to_end(spark, tmp_path):
    """MIN/MAX maintenance on the Iceberg writer (r13): extremes track
    through inserts (least/greatest, no scan) and through retractions
    of the current extreme (bounded group re-scan via upstream_fn)."""
    from glaredb_spark.sources.iceberg_native import (
        equality_delete_iceberg_native,
        read_iceberg_native,
        write_iceberg_native,
    )
    from glaredb_spark.streaming.incremental import (
        stream_maintain_iceberg,
    )

    register_stream_sources(spark)
    up, mv, ck = (str(tmp_path / d) for d in ("up", "mv", "ck"))
    rows = [(i, "g%d" % (i % 3), i * 10) for i in range(12)]
    write_iceberg_native(
        spark.createDataFrame(rows, "id long, g string, v long")
        .coalesce(1),
        up, format_version=2,
    )

    def run():
        q = stream_maintain_iceberg(
            spark.readStream.format("iceberg_changes")
            .option("path", up).load(),
            mv, ck, "mv_mm", GROUP, SUMS,
            mins={"v_min": "v"}, maxs={"v_max": "v"},
            upstream_fn=lambda s: read_iceberg_native(s, up),
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run()
    assert _mm_rows(read_iceberg_native(spark, mv)) == _expected_mm(
        read_iceberg_native(spark, up).select("g", "v")
    )
    # retract g0's MAX (id=9 -> v=90) and g1's MIN (id=1 -> v=10):
    # both resolve only through the bounded re-scan
    equality_delete_iceberg_native(
        spark, up, spark.createDataFrame([(9,), (1,)], "id long")
    )
    run()
    assert _mm_rows(read_iceberg_native(spark, mv)) == _expected_mm(
        read_iceberg_native(spark, up).select("g", "v")
    )
    # inserts that move extremes without a scan
    write_iceberg_native(
        spark.createDataFrame(
            [(300, "g0", -5), (301, "g1", 10**6)],
            "id long, g string, v long",
        ).coalesce(1),
        up, mode="append",
    )
    run()
    assert _mm_rows(read_iceberg_native(spark, mv)) == _expected_mm(
        read_iceberg_native(spark, up).select("g", "v")
    )


def test_minmax_requires_upstream_handle():
    """mins/maxs without upstream_fn is refused by a NAMED error (the
    bounded re-scan is what makes MIN/MAX retractable)."""
    from glaredb_spark.streaming.incremental import (
        delta_mv_writer,
        iceberg_mv_writer,
    )

    for mk in (delta_mv_writer, iceberg_mv_writer):
        with pytest.raises(ValueError, match="upstream_fn"):
            mk("/tmp/x", "app", GROUP, SUMS, mins={"m": "v"})
        with pytest.raises(ValueError, match="upstream_fn"):
            mk("/tmp/x", "app", GROUP, SUMS, maxs={"m": "v"})


def test_minmax_creation_batch_folds_retractions(spark, tmp_path):
    """A creation batch folding several upstream versions (MV attached
    late) may insert AND retract the same group's extreme in one
    chunk — _add alone would resurrect the deleted extreme; the
    bounded re-scan must resolve it (r13 review)."""
    import os

    from glaredb_spark.sources.delta_native import (
        _latest_version,
        delete_delta_native,
        read_delta_native,
        table_changes_delta_native,
        write_delta_native,
    )
    from glaredb_spark.streaming.incremental import delta_mv_writer

    up = str(tmp_path / "up")
    mv = str(tmp_path / "mv")
    write_delta_native(
        spark.createDataFrame(
            [(1, "a", 1), (2, "a", 5), (3, "b", 7)],
            "id long, g string, v long",
        ),
        up, enable_cdf=True,
    )
    delete_delta_native(spark, up, "v = 1")  # retract group a's MIN
    w = delta_mv_writer(
        mv, "late", ["g"], {"total": "v"},
        mins={"v_min": "v"}, maxs={"v_max": "v"},
        upstream_fn=lambda s: read_delta_native(s, up),
    )
    # ONE batch folds version 0 (inserts) + version 1 (the delete)
    w(table_changes_delta_native(
        spark, up, 0, _latest_version(os.path.join(up, "_delta_log"))
    ), 0)
    got = sorted(tuple(r) for r in read_delta_native(spark, mv)
                 .select("g", "total", "n_rows", "v_min", "v_max")
                 .collect())
    assert got == [("a", 5, 1, 5, 5), ("b", 7, 1, 7, 7)]


def test_merged_frame_plan_bounds_target_read(spark, tmp_path):
    """The MV merge probe must bound the target read with a broadcast
    LEFT-SEMI join on the batch's keys — never a shuffled scan of the
    whole MV (the r13 review found the previous right-outer broadcast
    hint silently degraded to a sort-merge join)."""
    from glaredb_spark.sources.delta_native import (
        read_delta_native,
        write_delta_native,
    )
    from glaredb_spark.streaming.incremental import (
        _merged_frame,
        changelog_deltas,
    )

    target = str(tmp_path / "mv")
    up = str(tmp_path / "up")
    write_delta_native(
        spark.createDataFrame(
            [(f"g{i}", i * 10, 2, i, i * 3) for i in range(50)],
            "g string, total long, n_rows long, v_min long, v_max long",
        ),
        target,
    )
    write_delta_native(
        spark.createDataFrame(
            [(f"g{i % 50}", i) for i in range(100)],
            "g string, v long",
        ),
        up,
    )
    batch = spark.createDataFrame(
        [("g1", 5, "insert"), ("g2", 7, "delete")],
        "g string, v long, _change_type string",
    )
    deltas = changelog_deltas(
        batch, ["g"], {"total": "v"},
        mins={"v_min": "v"}, maxs={"v_max": "v"},
    ).drop("_bad")
    merged = _merged_frame(
        spark, read_delta_native(spark, target), deltas,
        ["g"], {"total": "v"}, "n_rows",
        {"v_min": "v"}, {"v_max": "v"},
        lambda s: read_delta_native(s, up),
    )
    physical = merged._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in physical
    assert "BroadcastHashJoin" in physical or "BroadcastExchange" \
        in physical
