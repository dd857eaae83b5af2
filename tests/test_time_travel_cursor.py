"""r10: AS OF timestamp time travel on both formats + durable-cursor
incremental changelog consumption (the batch-pipeline idiom: read
changes since the last committed cursor, commit after processing)."""

import json
import os

import pytest

from glaredb_spark.sources.delta_native import (
    changes_cursor_delta_native,
    delete_delta_native,
    read_delta_native,
    version_as_of_delta_native,
    write_delta_native,
)
from glaredb_spark.sources.iceberg_native import (
    IcebergError,
    changes_cursor_iceberg_native,
    expire_snapshots_iceberg_native,
    read_iceberg_native,
    snapshot_as_of_iceberg_native,
    table_metadata,
    write_iceberg_native,
)


def _wait_past(ts_ms: int) -> None:
    import time

    while int(time.time() * 1000) <= ts_ms:
        time.sleep(0.002)


def test_iceberg_as_of_timestamp(spark, tmp_path):
    p = str(tmp_path / "tt")
    write_iceberg_native(
        spark.createDataFrame([(1, "a")], "id long, v string"), p,
        format_version=2,
    )
    ts1 = int(table_metadata(p)["snapshots"][0]["timestamp-ms"])
    _wait_past(ts1)  # same-millisecond commits would make as_of ambiguous
    write_iceberg_native(
        spark.createDataFrame([(2, "b")], "id long, v string"), p
    )
    meta = table_metadata(p)
    assert snapshot_as_of_iceberg_native(meta, ts1) == 1
    # epoch-millis literal selects the first snapshot
    got = read_iceberg_native(spark, p, as_of=ts1)
    assert [r["id"] for r in got.collect()] == [1]
    # far-future ISO literal selects the current snapshot
    assert read_iceberg_native(spark, p, as_of="2099-01-01").count() == 2
    with pytest.raises(IcebergError, match="no snapshot at or before"):
        read_iceberg_native(spark, p, as_of="2001-01-01")
    with pytest.raises(IcebergError, match="cannot parse"):
        read_iceberg_native(spark, p, as_of="not-a-time")
    # SQL named arg
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    got2 = sess.sql(
        f"SELECT count(*) AS c FROM iceberg.scan('{p}', as_of='{ts1}')"
    ).collect()
    assert got2[0]["c"] == 1
    with pytest.raises(Exception, match="not both"):
        sess.sql(f"SELECT * FROM iceberg.scan('{p}', 1, as_of='{ts1}')")


def test_delta_as_of_timestamp(spark, tmp_path):
    p = str(tmp_path / "dtt")
    write_delta_native(
        spark.createDataFrame([(1, "a")], "id long, v string"), p
    )
    log = os.path.join(p, "_delta_log")
    ts0 = json.loads(
        open(os.path.join(log, f"{0:020d}.json")).readline()
    )["commitInfo"]["timestamp"]
    _wait_past(int(ts0))
    write_delta_native(
        spark.createDataFrame([(2, "b")], "id long, v string"), p,
        mode="append",
    )
    assert version_as_of_delta_native(p, ts0) == 0
    got = read_delta_native(spark, p, as_of=ts0)
    assert [r["id"] for r in got.collect()] == [1]
    assert read_delta_native(spark, p, as_of="2099-01-01").count() == 2
    with pytest.raises(RuntimeError, match="no commit at or before"):
        version_as_of_delta_native(p, "2001-01-01")
    # SQL named arg
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    got2 = sess.sql(
        f"SELECT count(*) AS c FROM delta.scan('{p}', as_of='{ts0}')"
    ).collect()
    assert got2[0]["c"] == 1


def test_iceberg_changes_cursor(spark, tmp_path):
    p = str(tmp_path / "cur")
    cursor = str(tmp_path / "state" / "ice.cursor")
    write_iceberg_native(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        p, format_version=2,
    )
    # first consumption: the full feed
    df, commit = changes_cursor_iceberg_native(spark, p, cursor)
    assert df.count() == 2
    # crash before commit: the SAME range replays
    df2, commit2 = changes_cursor_iceberg_native(spark, p, cursor)
    assert df2.count() == 2
    commit2()
    # caught up -> nothing
    none, noop = changes_cursor_iceberg_native(spark, p, cursor)
    assert none is None
    noop()
    # new snapshots: only the delta since the cursor
    write_iceberg_native(
        spark.createDataFrame([(3, "c")], "id long, v string"), p
    )
    df3, commit3 = changes_cursor_iceberg_native(spark, p, cursor)
    rows = [(r["id"], r["_change_type"]) for r in df3.collect()]
    assert rows == [(3, "insert")]
    commit3()
    # cursor pointing at an expired snapshot raises (honest gap)
    write_iceberg_native(
        spark.createDataFrame([(4, "d")], "id long, v string"), p
    )
    expire_snapshots_iceberg_native(p, retention_hours=0, retain_last=1)
    with pytest.raises(IcebergError, match="no longer retained"):
        changes_cursor_iceberg_native(spark, p, cursor)


def test_delta_changes_cursor(spark, tmp_path):
    p = str(tmp_path / "dcur")
    cursor = str(tmp_path / "state" / "delta.cursor")
    write_delta_native(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        .coalesce(1),
        p, enable_cdf=True,
    )
    df, commit = changes_cursor_delta_native(spark, p, cursor)
    assert df.count() == 2
    commit()
    none, _noop = changes_cursor_delta_native(spark, p, cursor)
    assert none is None
    delete_delta_native(spark, p, "id = 1")
    df2, commit2 = changes_cursor_delta_native(spark, p, cursor)
    rows = [(r["id"], r["_change_type"]) for r in df2.collect()]
    assert rows == [(1, "delete")]
    commit2()
    assert json.load(open(cursor))["version"] == 1

def test_cursor_table_validation(spark, tmp_path):
    """r10 review #6: a cursor written for a DIFFERENT table must raise
    instead of silently skipping history."""
    pa_, pb = str(tmp_path / "ta"), str(tmp_path / "tb")
    cursor = str(tmp_path / "shared.cursor")
    for p in (pa_, pb):
        write_iceberg_native(
            spark.createDataFrame([(1, "a")], "id long, v string"), p,
            format_version=2,
        )
    df, commit = changes_cursor_iceberg_native(spark, pa_, cursor)
    commit()
    with pytest.raises(IcebergError, match="written for table"):
        changes_cursor_iceberg_native(spark, pb, cursor)
    # delta twin
    dpa, dpb = str(tmp_path / "da"), str(tmp_path / "db")
    dcur = str(tmp_path / "d.cursor")
    for p in (dpa, dpb):
        write_delta_native(
            spark.createDataFrame([(1, "a")], "id long, v string"), p
        )
    df2, commit2 = changes_cursor_delta_native(spark, dpa, dcur)
    commit2()
    with pytest.raises(RuntimeError, match="written for table"):
        changes_cursor_delta_native(spark, dpb, dcur)
