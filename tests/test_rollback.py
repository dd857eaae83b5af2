"""ROLLBACK TO SNAPSHOT (r14): path-addressed and catalog-routed.

The catalog route exercises the r14 set-snapshot-ref gating fix
end-to-end — a rollback adds NO snapshot, so the commit is purely an
assert-ref + set-snapshot-ref pair (previously silently dropped).
Reference scope: iceberg's rollback_to_snapshot semantics; the
reference engine has no snapshot rollback (ext_iceberg is read-only).
"""

import pytest

from glaredb_spark.session import GlareSession
from glaredb_spark.sources import iceberg_rest as rest
from glaredb_spark.sources.iceberg_native import (
    IcebergError,
    _metadata_path,
    read_iceberg_native,
    rollback_iceberg_native,
    table_metadata,
    write_iceberg_native,
)
from glaredb_spark.sources.iceberg_rest_emulator import IcebergRestEmulator


def test_path_rollback_sql(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg_native(
        spark.range(4).selectExpr("id", "id * 2 AS v"), loc
    )
    first = int(table_metadata(loc)["current-snapshot-id"])
    write_iceberg_native(
        spark.range(10, 13).selectExpr("id", "id * 2 AS v"), loc,
        mode="append",
    )
    assert read_iceberg_native(spark, loc).count() == 7
    sess = GlareSession(spark)
    st = sess.sql(
        f"ALTER TABLE '{loc}' ROLLBACK TO SNAPSHOT {first}"
    ).collect()[0].status
    assert f"rolled back to snapshot {first}" in st
    assert read_iceberg_native(spark, loc).count() == 4
    # the abandoned tip stays retained and time-travelable
    meta = table_metadata(loc)
    assert len(meta["snapshots"]) == 2
    tip = next(
        int(s["snapshot-id"]) for s in meta["snapshots"]
        if int(s["snapshot-id"]) != first
    )
    assert read_iceberg_native(
        spark, loc, snapshot_id=tip
    ).count() == 7
    # a new append parents off the rolled-back snapshot
    write_iceberg_native(
        spark.range(100, 102).selectExpr("id", "id * 2 AS v"), loc,
        mode="append",
    )
    got = read_iceberg_native(spark, loc)
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3, 100, 101]
    newest = table_metadata(loc)["snapshots"][-1]
    assert int(newest["parent-snapshot-id"]) == first
    # unknown snapshot id raises by name; no-op rollback commits nothing
    with pytest.raises(IcebergError, match="no retained snapshot"):
        rollback_iceberg_native(loc, 999999)
    v = len(table_metadata(loc)["snapshots"])
    rollback_iceberg_native(
        loc, int(table_metadata(loc)["current-snapshot-id"])
    )
    assert len(table_metadata(loc)["snapshots"]) == v


def test_catalog_rollback_sql(spark, tmp_path):
    emu = IcebergRestEmulator(str(tmp_path / "wh"), prefix="w1")
    endpoint = emu.start()
    try:
        loc = str(tmp_path / "wh" / "rb" / "t")
        write_iceberg_native(
            spark.range(4).selectExpr("id", "id * 2 AS v"), loc
        )
        emu.add_namespace("rb")
        emu.register("rb", "t", _metadata_path(loc))
        first = int(
            rest.load_table(endpoint, "rb", "t")["metadata"]
            ["current-snapshot-id"]
        )
        rest.append_table(
            spark, endpoint, "rb", "t",
            spark.range(10, 13).selectExpr("id", "id * 2 AS v"),
        )
        assert rest.read_table(spark, endpoint, "rb", "t").count() == 7
        sess = GlareSession(spark)
        sess.sql(
            f"ATTACH ICEBERG_REST DATABASE AS icrb (endpoint '{endpoint}')"
        )
        try:
            st = sess.sql(
                f"ALTER TABLE icrb.rb.t ROLLBACK TO SNAPSHOT {first}"
            ).collect()[0].status
            assert f"rolled back to snapshot {first}" in st
            # the CATALOG pointer moved — a fresh loadTable-pinned read
            # sees the rolled-back state (the r14 ref-move fix: without
            # set-snapshot-ref this read would still return 7)
            assert rest.read_table(
                spark, endpoint, "rb", "t"
            ).count() == 4
            meta = rest.load_table(endpoint, "rb", "t")["metadata"]
            assert int(meta["current-snapshot-id"]) == first
            assert len(meta["snapshots"]) == 2  # tip retained
        finally:
            rest.detach_iceberg_rest(spark, "icrb")
    finally:
        emu.stop()
        rest._PREFIX_CACHE.clear()


def test_delta_restore_sql(spark, tmp_path):
    """RESTORE TABLE '<path>' TO VERSION AS OF n (r14, Delta twin of
    the Iceberg rollback): data reverts, history is preserved, and a
    post-VACUUM restore raises by name."""
    from glaredb_spark.sources.delta_native import (
        read_delta_native,
        restore_delta_native,
        write_delta_native,
    )

    loc = str(tmp_path / "dt")
    write_delta_native(
        spark.range(4).selectExpr("id", "id * 2 AS v"), loc
    )
    write_delta_native(
        spark.range(10, 13).selectExpr("id", "id * 2 AS v"), loc,
        mode="append",
    )
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    sess.sql(f"DELETE FROM '{loc}' WHERE id < 2")
    assert read_delta_native(spark, loc).count() == 5
    row = sess.sql(
        f"RESTORE TABLE '{loc}' TO VERSION AS OF 0"
    ).collect()[0]
    assert row.files_removed >= 1 and row.files_readded >= 1
    got = read_delta_native(spark, loc)
    assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3]
    # history preserved: time travel to the pre-restore state works
    assert read_delta_native(spark, loc, version=2).count() == 5
    # restoring to where we already are is a no-op
    assert restore_delta_native(spark, loc, 3) == (0, 0)
    # forward "restore" to version 1 re-adds the appended files
    sess.sql(f"RESTORE TABLE '{loc}' TO VERSION AS OF 1")
    assert read_delta_native(spark, loc).count() == 7
    # an Iceberg target is refused with a pointer to ROLLBACK
    ice = str(tmp_path / "ice")
    from glaredb_spark.sources.iceberg_native import write_iceberg_native

    write_iceberg_native(spark.range(2).selectExpr("id"), ice)
    with pytest.raises(ValueError, match="ROLLBACK TO SNAPSHOT"):
        sess.sql(f"RESTORE TABLE '{ice}' TO VERSION AS OF 0")


def test_delta_restore_refuses_vacuumed(spark, tmp_path):
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        vacuum_delta_native,
        write_delta_native,
    )

    loc = str(tmp_path / "dt")
    write_delta_native(
        spark.range(6).selectExpr("id", "id * 2 AS v").coalesce(1), loc
    )
    delete_delta_native(spark, loc, "id < 3")  # rewrites the file
    vacuum_delta_native(spark, loc, retention_hours=0.0)
    from glaredb_spark.session import GlareSession

    with pytest.raises(ValueError, match="VACUUMed"):
        GlareSession(spark).sql(
            f"RESTORE TABLE '{loc}' TO VERSION AS OF 0"
        )


def test_restore_catalog_target_named_error(spark, tmp_path):
    """RESTORE TABLE alias.ns.t dies by NAME in the guard, pointing at
    the catalog rollback — never Spark's parser."""
    from glaredb_spark.session import UnsupportedCatalogStatement
    from glaredb_spark.sources.iceberg_rest import detach_iceberg_rest

    emu = IcebergRestEmulator(str(tmp_path / "wh"), prefix="w1")
    endpoint = emu.start()
    try:
        loc = str(tmp_path / "wh" / "rg" / "t")
        write_iceberg_native(spark.range(2).selectExpr("id"), loc)
        emu.add_namespace("rg")
        emu.register("rg", "t", _metadata_path(loc))
        sess = GlareSession(spark)
        sess.sql(
            f"ATTACH ICEBERG_REST DATABASE AS icrg (endpoint '{endpoint}')"
        )
        try:
            with pytest.raises(UnsupportedCatalogStatement,
                               match="ROLLBACK TO SNAPSHOT"):
                sess.sql("RESTORE TABLE icrg.rg.t TO VERSION AS OF 0")
        finally:
            detach_iceberg_rest(spark, "icrg")
    finally:
        emu.stop()
        rest._PREFIX_CACHE.clear()
