"""Write-audit-publish (r15, VERDICT r14 #1): branch COW DML
(DELETE/UPDATE/MERGE planned against the branch head, only the branch
ref advances) + ALTER TABLE ... FAST FORWARD main TO <branch> with the
spec's ancestry check, on path and catalog routes.

Reference scope: the reference's iceberg extension has no refs surface
(its catalog is a stub, crates/glaredb_ext_iceberg/src/catalog/rest.rs:22);
this follows the public Iceberg spec's branch semantics and the
Spark/Iceberg fast_forward procedure's contract.
"""

import pytest

from glaredb_spark.session import GlareSession
from glaredb_spark.sources import iceberg_rest as rest
from glaredb_spark.sources.iceberg_native import (
    IcebergError,
    _metadata_path,
    append_branch_iceberg_native,
    create_ref_iceberg_native,
    fast_forward_iceberg_native,
    read_iceberg_native,
    table_metadata,
    write_iceberg_native,
)
from glaredb_spark.sources.iceberg_rest_emulator import IcebergRestEmulator


def test_wap_roundtrip_path(spark, tmp_path):
    """The full loop on a path table: write to a branch (delete +
    update + merge), audit via ref= reads while main stays untouched,
    tag the pre-publish state, FAST FORWARD main, and confirm main
    readers see the branch state while the tag still reads history."""
    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(10).selectExpr("id", "id * 2 AS v"), loc
    )
    sess = GlareSession(spark)
    sess.sql(f"ALTER TABLE '{loc}' CREATE BRANCH dev")

    n = sess.sql(
        f"DELETE FROM '{loc}' FOR BRANCH dev WHERE id >= 8"
    ).collect()[0].Count
    assert n == 2
    n = sess.sql(
        f"UPDATE '{loc}' FOR BRANCH dev SET v = v + 100 WHERE id < 2"
    ).collect()[0].Count
    assert n == 2
    n = sess.sql(
        f"MERGE INTO '{loc}' FOR BRANCH dev t USING "
        f"(SELECT 7 AS id, 999 AS v UNION ALL SELECT 20 AS id, 0 AS v) s "
        f"ON t.id = s.id "
        f"WHEN MATCHED THEN UPDATE SET v = s.v "
        f"WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0].Count
    assert n == 2

    # audit: the branch sees all three writes; main sees none
    dev = {
        r.id: r.v
        for r in read_iceberg_native(spark, loc, ref="dev").collect()
    }
    assert len(dev) == 9 and dev[0] == 100 and dev[7] == 999 and dev[20] == 0
    main = {r.id: r.v for r in read_iceberg_native(spark, loc).collect()}
    assert len(main) == 10 and main[0] == 0 and main[7] == 14

    # publish: tag the pre-publish state, then move main to the branch
    sess.sql(f"ALTER TABLE '{loc}' CREATE TAG pre_publish")
    st = sess.sql(
        f"ALTER TABLE '{loc}' FAST FORWARD main TO dev"
    ).collect()[0].status
    assert "fast-forwarded main to dev" in st
    meta = table_metadata(loc)
    assert int(meta["current-snapshot-id"]) == int(
        meta["refs"]["dev"]["snapshot-id"]
    )
    published = {
        r.id: r.v for r in read_iceberg_native(spark, loc).collect()
    }
    assert published == dev
    pre = {
        r.id: r.v
        for r in read_iceberg_native(
            spark, loc, ref="pre_publish"
        ).collect()
    }
    assert pre == main


def test_fast_forward_refuses_diverged_main(spark, tmp_path):
    """If main moved since the branch forked, FAST FORWARD would drop
    those commits — it must refuse by name (the spec's ancestry
    check); a rollback of main past the fork reopens the publish."""
    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(4).selectExpr("id", "id * 2 AS v"), loc
    )
    create_ref_iceberg_native(loc, "dev", kind="branch")
    append_branch_iceberg_native(
        spark.range(10, 12).selectExpr("id", "id * 2 AS v"), loc, "dev"
    )
    write_iceberg_native(
        spark.range(20, 23).selectExpr("id", "id * 2 AS v"), loc,
        mode="append",
    )
    with pytest.raises(IcebergError, match="not an ancestor"):
        fast_forward_iceberg_native(loc, "dev")
    # tags refuse; unknown branches raise by name
    create_ref_iceberg_native(loc, "pin")
    with pytest.raises(IcebergError, match="publishes a branch"):
        fast_forward_iceberg_native(loc, "pin")
    with pytest.raises(IcebergError, match="no branch named"):
        fast_forward_iceberg_native(loc, "ghost")


def test_fast_forward_noop_and_zero_match_branch_dml(spark, tmp_path):
    """A fast-forward to an un-diverged branch is a no-op commit, and
    a 0-match branch DML publishes nothing (no metadata version, no
    branch-head move)."""
    import glob as _g
    import os

    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(4).selectExpr("id", "id * 2 AS v"), loc
    )
    create_ref_iceberg_native(loc, "dev", kind="branch")
    sess = GlareSession(spark)
    versions = len(_g.glob(os.path.join(loc, "metadata", "*.metadata.json")))
    n = sess.sql(
        f"DELETE FROM '{loc}' FOR BRANCH dev WHERE id > 100"
    ).collect()[0].Count
    assert n == 0
    assert len(
        _g.glob(os.path.join(loc, "metadata", "*.metadata.json"))
    ) == versions
    head = int(table_metadata(loc)["refs"]["dev"]["snapshot-id"])
    assert fast_forward_iceberg_native(loc, "dev") == head
    # Delta targets refuse FOR BRANCH by name
    with pytest.raises(ValueError, match="FOR BRANCH requires an iceberg"):
        sess.sql(
            f"DELETE FROM '{tmp_path / 'nope'}' FOR BRANCH dev WHERE true"
        )


def test_wap_roundtrip_catalog(spark, tmp_path):
    """Catalog route: INSERT/DELETE/UPDATE ... FOR BRANCH commit as
    add-snapshot + set-snapshot-ref on the branch ONLY (the metadata-
    diff hook — never _commit_fn_for's unconditional main move), and
    FAST FORWARD publishes through commitTable."""
    emu = IcebergRestEmulator(str(tmp_path / "wh"), prefix="w1")
    endpoint = emu.start()
    try:
        loc = str(tmp_path / "wh" / "rf" / "t")
        write_iceberg_native(
            spark.range(6).selectExpr("id", "id * 2 AS v"), loc
        )
        emu.add_namespace("rf")
        emu.register("rf", "t", _metadata_path(loc))
        sess = GlareSession(spark)
        sess.sql(
            f"ATTACH ICEBERG_REST DATABASE AS icw (endpoint '{endpoint}')"
        )
        try:
            sess.sql("ALTER TABLE icw.rf.t CREATE BRANCH load")
            n = sess.sql(
                "INSERT INTO icw.rf.t FOR BRANCH load "
                "SELECT id, id * 2 AS v FROM range(10, 13)"
            ).collect()[0].Count
            assert n == 3
            n = sess.sql(
                "DELETE FROM icw.rf.t FOR BRANCH load WHERE id = 0"
            ).collect()[0].Count
            assert n == 1
            n = sess.sql(
                "UPDATE icw.rf.t FOR BRANCH load SET v = -1 WHERE id = 1"
            ).collect()[0].Count
            assert n == 1
            meta = rest.load_table(endpoint, "rf", "t")["metadata"]
            # main never moved off the fork point
            assert int(meta["current-snapshot-id"]) != int(
                meta["refs"]["load"]["snapshot-id"]
            )
            assert rest.read_table(spark, endpoint, "rf", "t").count() == 6
            dev = {
                r.id: r.v
                for r in rest.read_table(
                    spark, endpoint, "rf", "t", ref="load"
                ).collect()
            }
            assert len(dev) == 8 and 0 not in dev and dev[1] == -1
            st = sess.sql(
                "ALTER TABLE icw.rf.t FAST FORWARD main TO load"
            ).collect()[0].status
            assert "fast-forwarded main to load" in st
            got = {
                r.id: r.v
                for r in rest.read_table(
                    spark, endpoint, "rf", "t"
                ).collect()
            }
            assert got == dev
        finally:
            rest.detach_iceberg_rest(spark, "icw")
    finally:
        emu.stop()
        rest._PREFIX_CACHE.clear()


def test_branch_mor_delete_and_publish(spark, tmp_path):
    """Branch DML composes with the MoR strategy: a position-delete
    snapshot lands on the branch (no data file rewritten), main reads
    the full table until FAST FORWARD publishes, and strategy='auto'
    resolves against the BRANCH head's files."""
    from glaredb_spark.sources.iceberg_native import (
        delete_iceberg_native,
        fast_forward_iceberg_native,
    )

    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(12).selectExpr("id", "id * 2 AS v"), loc,
        format_version=2,
    )
    create_ref_iceberg_native(loc, "dev", kind="branch")
    deleted, files = delete_iceberg_native(
        spark, loc, "id % 3 = 0", strategy="mor", branch="dev"
    )
    assert deleted == 4 and files >= 1
    assert read_iceberg_native(spark, loc, ref="dev").count() == 8
    assert read_iceberg_native(spark, loc).count() == 12
    # auto on the branch sees the branch's position deletes -> MoR
    deleted2, _ = delete_iceberg_native(
        spark, loc, "id = 1", strategy="auto", branch="dev"
    )
    assert deleted2 == 1
    assert read_iceberg_native(spark, loc, ref="dev").count() == 7
    fast_forward_iceberg_native(loc, "dev")
    assert read_iceberg_native(spark, loc).count() == 7


def test_refs_tvf(spark, tmp_path):
    """iceberg.refs('path') — the WAP audit view (Iceberg's refs
    metadata table): main + every tag/branch with its head snapshot;
    heads move as branches advance and main moves on fast-forward."""
    from glaredb_spark.sources.iceberg_native import table_metadata

    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(4).selectExpr("id", "id * 2 AS v"), loc
    )
    sess = GlareSession(spark)
    sess.sql(f"ALTER TABLE '{loc}' CREATE TAG v1")
    sess.sql(f"ALTER TABLE '{loc}' CREATE BRANCH dev")
    append_branch_iceberg_native(
        spark.range(10, 12).selectExpr("id", "id * 2 AS v"), loc, "dev"
    )
    got = {
        r.name: (r.type, r.snapshot_id)
        for r in sess.sql(f"SELECT * FROM iceberg.refs('{loc}')")
        .collect()
    }
    meta = table_metadata(loc)
    cur = int(meta["current-snapshot-id"])
    dev_head = int(meta["refs"]["dev"]["snapshot-id"])
    assert got == {
        "main": ("branch", cur),
        "dev": ("branch", dev_head),
        "v1": ("tag", cur),
    }
    assert dev_head != cur
    fast_forward_iceberg_native(loc, "dev")
    got2 = {
        r.name: r.snapshot_id
        for r in sess.sql(f"SELECT * FROM iceberg.refs('{loc}')")
        .collect()
    }
    assert got2["main"] == dev_head == got2["dev"]
