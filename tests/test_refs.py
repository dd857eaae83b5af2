"""Iceberg TAGS and BRANCHES (spec ``refs`` map, r14): create/drop on
path and catalog routes, read-by-ref, and expiration protection.

Reference scope: the reference's iceberg extension is a read-only v1
scan with no refs surface; this follows the public Iceberg spec's refs
semantics (a tag pins a snapshot; pinned snapshots never expire).
"""

import pytest

from glaredb_spark.session import GlareSession
from glaredb_spark.sources import iceberg_rest as rest
from glaredb_spark.sources.iceberg_native import (
    IcebergError,
    _metadata_path,
    create_ref_iceberg_native,
    expire_snapshots_iceberg_native,
    read_iceberg_native,
    table_metadata,
    write_iceberg_native,
)
from glaredb_spark.sources.iceberg_rest_emulator import IcebergRestEmulator


def test_tag_lifecycle_path(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(4).selectExpr("id", "id * 2 AS v"), loc
    )
    first = int(table_metadata(loc)["current-snapshot-id"])
    sess = GlareSession(spark)
    st = sess.sql(
        f"ALTER TABLE '{loc}' CREATE TAG v1 AS OF SNAPSHOT {first}"
    ).collect()[0].status
    assert f"created tag v1 at snapshot {first}" in st
    write_iceberg_native(
        spark.range(10, 13).selectExpr("id", "id * 2 AS v"), loc,
        mode="append",
    )
    # the tag keeps reading the pinned snapshot
    assert read_iceberg_native(spark, loc, ref="v1").count() == 4
    assert read_iceberg_native(spark, loc).count() == 7
    # SQL surface: iceberg.scan(..., ref='v1')
    got = sess.sql(
        f"SELECT count(*) AS c FROM iceberg.scan('{loc}', ref='v1')"
    ).collect()[0].c
    assert got == 4
    # a branch defaults to the current snapshot
    st = sess.sql(
        f"ALTER TABLE '{loc}' CREATE BRANCH dev"
    ).collect()[0].status
    assert "created branch dev" in st
    assert read_iceberg_native(spark, loc, ref="dev").count() == 7
    # named errors: duplicate, unknown, main
    with pytest.raises(IcebergError, match="already exists"):
        create_ref_iceberg_native(loc, "v1")
    with pytest.raises(IcebergError, match="no ref named"):
        read_iceberg_native(spark, loc, ref="ghost")
    with pytest.raises(IcebergError, match="own branch"):
        create_ref_iceberg_native(loc, "main")


def test_tagged_snapshot_survives_expiration(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(3).selectExpr("id", "id * 2 AS v"), loc
    )
    first = int(table_metadata(loc)["current-snapshot-id"])
    create_ref_iceberg_native(loc, "pin", first)
    for lo in (10, 20):
        write_iceberg_native(
            spark.range(lo, lo + 2).selectExpr("id", "id * 2 AS v"),
            loc, mode="append",
        )
    expire_snapshots_iceberg_native(loc, retention_hours=0.0)
    # the tagged snapshot (and its files) survive 0-retention expiry
    assert read_iceberg_native(spark, loc, ref="pin").count() == 3
    assert read_iceberg_native(spark, loc).count() == 7
    # dropping the tag releases it: the next expiry removes it
    GlareSession(spark).sql(f"ALTER TABLE '{loc}' DROP TAG pin")
    expire_snapshots_iceberg_native(loc, retention_hours=0.0)
    meta = table_metadata(loc)
    assert not any(
        int(s["snapshot-id"]) == first for s in meta["snapshots"]
    )
    with pytest.raises(IcebergError, match="no ref named"):
        read_iceberg_native(spark, loc, ref="pin")


def test_tag_lifecycle_catalog(spark, tmp_path):
    """Catalog route: CREATE TAG commits through commitTable as a
    set-snapshot-ref on the named ref (the r14 _diff_updates refs
    arm); read_table(ref=) reads the pin; DROP TAG removes it."""
    emu = IcebergRestEmulator(str(tmp_path / "wh"), prefix="w1")
    endpoint = emu.start()
    try:
        loc = str(tmp_path / "wh" / "rf" / "t")
        write_iceberg_native(
            spark.range(4).selectExpr("id", "id * 2 AS v"), loc
        )
        emu.add_namespace("rf")
        emu.register("rf", "t", _metadata_path(loc))
        first = int(
            rest.load_table(endpoint, "rf", "t")["metadata"]
            ["current-snapshot-id"]
        )
        sess = GlareSession(spark)
        sess.sql(
            f"ATTACH ICEBERG_REST DATABASE AS icrf (endpoint '{endpoint}')"
        )
        try:
            st = sess.sql(
                f"ALTER TABLE icrf.rf.t CREATE TAG rel AS OF "
                f"SNAPSHOT {first}"
            ).collect()[0].status
            assert f"created tag rel at snapshot {first}" in st
            rest.append_table(
                spark, endpoint, "rf", "t",
                spark.range(10, 13).selectExpr("id", "id * 2 AS v"),
            )
            meta = rest.load_table(endpoint, "rf", "t")["metadata"]
            assert meta["refs"]["rel"] == {
                "snapshot-id": first, "type": "tag"
            }
            assert rest.read_table(
                spark, endpoint, "rf", "t", ref="rel"
            ).count() == 4
            assert rest.read_table(spark, endpoint, "rf", "t").count() == 7
            sess.sql("ALTER TABLE icrf.rf.t DROP TAG rel")
            meta = rest.load_table(endpoint, "rf", "t")["metadata"]
            assert "rel" not in (meta.get("refs") or {})
        finally:
            rest.detach_iceberg_rest(spark, "icrf")
    finally:
        emu.stop()
        rest._PREFIX_CACHE.clear()


def test_branch_append_path(spark, tmp_path):
    """Appending to a branch advances ONLY the branch: main readers
    never see branch rows; the branch read sees main's history up to
    the fork plus its own appends; tags refuse writes."""
    from glaredb_spark.sources.iceberg_native import (
        append_branch_iceberg_native,
    )

    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(4).selectExpr("id", "id * 2 AS v"), loc
    )
    sess = GlareSession(spark)
    sess.sql(f"ALTER TABLE '{loc}' CREATE BRANCH dev")
    sess.sql(f"ALTER TABLE '{loc}' CREATE TAG frozen")
    sid = append_branch_iceberg_native(
        spark.range(100, 103).selectExpr("id", "id * 2 AS v"), loc,
        "dev",
    )
    assert read_iceberg_native(spark, loc).count() == 4  # main
    dev = read_iceberg_native(spark, loc, ref="dev")
    assert sorted(r.id for r in dev.collect()) == [0, 1, 2, 3, 100,
                                                   101, 102]
    meta = table_metadata(loc)
    assert int(meta["refs"]["dev"]["snapshot-id"]) == sid
    # a main append after the fork stays invisible to the branch
    write_iceberg_native(
        spark.range(50, 52).selectExpr("id", "id * 2 AS v"), loc,
        mode="append",
    )
    assert read_iceberg_native(spark, loc).count() == 6
    assert read_iceberg_native(spark, loc, ref="dev").count() == 7
    # a second branch append parents off the branch tip
    append_branch_iceberg_native(
        spark.range(200, 201).selectExpr("id", "id * 2 AS v"), loc,
        "dev",
    )
    assert read_iceberg_native(spark, loc, ref="dev").count() == 8
    assert read_iceberg_native(spark, loc).count() == 6
    # tags are immutable; unknown branches raise by name
    with pytest.raises(IcebergError, match="immutable"):
        append_branch_iceberg_native(
            spark.range(1).selectExpr("id", "id*2 AS v"), loc, "frozen"
        )
    with pytest.raises(IcebergError, match="no branch named"):
        append_branch_iceberg_native(
            spark.range(1).selectExpr("id", "id*2 AS v"), loc, "ghost"
        )
    # fast-forward main to the branch head via ROLLBACK TO SNAPSHOT
    dev_head = int(table_metadata(loc)["refs"]["dev"]["snapshot-id"])
    sess.sql(f"ALTER TABLE '{loc}' ROLLBACK TO SNAPSHOT {dev_head}")
    assert read_iceberg_native(spark, loc).count() == 8


def test_branch_append_catalog(spark, tmp_path):
    """Catalog route: the branch append commits as add-snapshot +
    set-snapshot-ref on the branch with an assert on its base head;
    main's pointer never moves."""
    emu = IcebergRestEmulator(str(tmp_path / "wh"), prefix="w1")
    endpoint = emu.start()
    try:
        loc = str(tmp_path / "wh" / "br" / "t")
        write_iceberg_native(
            spark.range(4).selectExpr("id", "id * 2 AS v"), loc
        )
        emu.add_namespace("br")
        emu.register("br", "t", _metadata_path(loc))
        sess = GlareSession(spark)
        sess.sql(
            f"ATTACH ICEBERG_REST DATABASE AS icbr (endpoint '{endpoint}')"
        )
        try:
            sess.sql("ALTER TABLE icbr.br.t CREATE BRANCH dev")
            sid = rest.append_branch_table(
                spark, endpoint, "br", "t",
                spark.range(100, 102).selectExpr("id", "id * 2 AS v"),
                "dev",
            )
            meta = rest.load_table(endpoint, "br", "t")["metadata"]
            assert int(meta["refs"]["dev"]["snapshot-id"]) == sid
            assert rest.read_table(spark, endpoint, "br", "t").count() == 4
            assert rest.read_table(
                spark, endpoint, "br", "t", ref="dev"
            ).count() == 6
        finally:
            rest.detach_iceberg_rest(spark, "icbr")
    finally:
        emu.stop()
        rest._PREFIX_CACHE.clear()


def test_stream_ref_ancestry(spark, tmp_path):
    """readStream with ref= streams only the ref's ANCESTRY (r14): a
    branch stream sees the fork history plus branch appends and never
    main's post-fork rows; ref='main' streams the surviving lineage
    after a rollback instead of raising the chain-gap error."""
    from glaredb_spark.sources.iceberg_native import (
        append_branch_iceberg_native,
        rollback_iceberg_native,
    )
    from glaredb_spark.streaming.source import register_stream_sources

    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(3).selectExpr("id", "id * 2 AS v"), loc
    )
    first = int(table_metadata(loc)["current-snapshot-id"])
    GlareSession(spark).sql(f"ALTER TABLE '{loc}' CREATE BRANCH dev")
    append_branch_iceberg_native(
        spark.range(100, 102).selectExpr("id", "id * 2 AS v"), loc,
        "dev",
    )
    write_iceberg_native(
        spark.range(50, 54).selectExpr("id", "id * 2 AS v"), loc,
        mode="append",
    )
    register_stream_sources(spark)

    def drain(name, **opts):
        r = spark.readStream.format("iceberg_appends").option("path", loc)
        for k, v in opts.items():
            r = r.option(k, v)
        q = (r.load().writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return sorted(
            r.id for r in spark.sql(f"SELECT * FROM {name}").collect()
        )

    assert drain("ref_dev", ref="dev") == [0, 1, 2, 100, 101]
    assert drain("ref_main", ref="main") == [0, 1, 2, 50, 51, 52, 53]
    # after a rollback, ref='main' streams the surviving lineage; the
    # plain seq-range stream would hit the dead branch and raise
    rollback_iceberg_native(loc, first)
    write_iceberg_native(
        spark.range(200, 201).selectExpr("id", "id * 2 AS v"), loc,
        mode="append",
    )
    assert drain("ref_main2", ref="main") == [0, 1, 2, 200]


def test_branch_append_races_main_append(spark, tmp_path):
    """Live race: a branch append and a main append hit commitTable
    concurrently. The emulator lock + asserts serialize them; the
    loser re-plans and BOTH land — main and the branch each advance by
    exactly their own rows."""
    import threading

    from glaredb_spark.sources.iceberg_native import (
        create_ref_iceberg_native,
    )

    emu = IcebergRestEmulator(str(tmp_path / "wh"), prefix="w1")
    endpoint = emu.start()
    try:
        loc = str(tmp_path / "wh" / "rc" / "t")
        write_iceberg_native(
            spark.range(4).selectExpr("id", "id * 2 AS v"), loc
        )
        create_ref_iceberg_native(loc, "dev", kind="branch")
        emu.add_namespace("rc")
        emu.register("rc", "t", _metadata_path(loc))
        errs = []
        barrier = threading.Barrier(2)

        def do_branch():
            try:
                barrier.wait(timeout=30)
                rest.append_branch_table(
                    spark, endpoint, "rc", "t",
                    spark.range(100, 103).selectExpr(
                        "id", "id * 2 AS v"),
                    "dev", max_retries=5,
                )
            except Exception as e:  # noqa: BLE001
                errs.append(("branch", e))

        def do_main():
            try:
                barrier.wait(timeout=30)
                rest.append_table(
                    spark, endpoint, "rc", "t",
                    spark.range(50, 52).selectExpr("id", "id * 2 AS v"),
                    max_retries=5,
                )
            except Exception as e:  # noqa: BLE001
                errs.append(("main", e))

        threads = [threading.Thread(target=do_branch),
                   threading.Thread(target=do_main)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        assert rest.read_table(spark, endpoint, "rc", "t").count() == 6
        assert rest.read_table(
            spark, endpoint, "rc", "t", ref="dev"
        ).count() == 7
    finally:
        emu.stop()
        rest._PREFIX_CACHE.clear()
