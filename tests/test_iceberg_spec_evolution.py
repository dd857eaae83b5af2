"""Iceberg partition-spec evolution (r10 — VERDICT r9 next #5):
ADD/DROP PARTITION FIELD commit new specs; files written under older
specs stay pruned under THEIR spec (per-entry spec-scoped pruning) and
kept files split into per-spec side manifests on rewrite commits."""

import pytest

from glaredb_spark.sources.iceberg_native import (
    IcebergError,
    add_partition_field_iceberg_native,
    delete_iceberg_native,
    drop_partition_field_iceberg_native,
    read_iceberg_native,
    table_metadata,
    write_iceberg_native,
    _manifest_list_entries,
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], i * 10) for i in range(lo, hi)],
        "doc_id long, lang string, score long",
    )


def test_add_partition_field_lifecycle(spark, tmp_path):
    p = str(tmp_path / "evo")
    write_iceberg_native(
        _df(spark, 0, 40), p, partition_by=["lang"], format_version=2
    )
    sid = add_partition_field_iceberg_native(p, "bucket(4, doc_id)")
    assert sid == 1
    meta = table_metadata(p)
    assert meta["default-spec-id"] == 1
    new_spec = [s for s in meta["partition-specs"]
                if s["spec-id"] == 1][0]
    assert [f["name"] for f in new_spec["fields"]] == [
        "lang", "doc_id_bucket"
    ]
    # the carried field keeps its id; the new field mints a fresh one
    # (ids are per-field unique, minted from 1000 — spec rules)
    by_field = {
        (f["name"], f["transform"]): f["field-id"]
        for s in meta["partition-specs"] for f in s.get("fields", [])
    }
    assert by_field[("lang", "identity")] == 1000
    assert by_field[("doc_id_bucket", "bucket[4]")] == 1001
    assert meta["last-partition-id"] == 1001

    # new writes stage under the evolved spec; old files stay put
    write_iceberg_native(_df(spark, 40, 80), p)
    got = read_iceberg_native(spark, p)
    assert got.count() == 80
    # manifest-list entries record both spec ids
    meta2 = table_metadata(p)
    specs_seen = {
        int(e.get("partition_spec_id", 0))
        for e in _manifest_list_entries(meta2, p)
    }
    assert {0, 1} <= specs_seen
    # pruned reads are correct across BOTH eras (old files prune on
    # lang only; new files on lang + bucket)
    for lang in ("en", "de"):
        want = sum(
            1 for i in range(80) if ["en", "de", "fr"][i % 3] == lang
        )
        pruned = read_iceberg_native(
            spark, p, partition_filter={"lang": lang}
        ).filter(f"lang = '{lang}'")
        assert pruned.count() == want


def test_cow_dml_across_specs_and_drop_field(spark, tmp_path):
    p = str(tmp_path / "evodml")
    write_iceberg_native(
        _df(spark, 0, 30).repartition(2), p,
        partition_by=["lang"], format_version=2,
    )
    add_partition_field_iceberg_native(p, "bucket(4, doc_id)")
    write_iceberg_native(_df(spark, 30, 60).repartition(2), p)
    # COW DELETE touches only spec-0 files; spec-1 files carry forward
    # through the side-manifest split under their own spec id
    deleted, _ = delete_iceberg_native(spark, p, "doc_id = 5",
                                       strategy="cow")
    assert deleted == 1
    got = read_iceberg_native(spark, p)
    assert got.count() == 59
    assert got.filter("doc_id = 5").count() == 0
    # per-entry spec ids survived the rewrite commit
    meta = table_metadata(p)
    specs_seen = {
        int(e.get("partition_spec_id", 0))
        for e in _manifest_list_entries(meta, p)
    }
    assert {0, 1} <= specs_seen
    # pruning still correct on every era after the rewrite
    want = sum(1 for i in range(60)
               if ["en", "de", "fr"][i % 3] == "fr" and i != 5)
    pruned = read_iceberg_native(
        spark, p, partition_filter={"lang": "fr"}
    ).filter("lang = 'fr'")
    assert pruned.count() == want

    # DROP PARTITION FIELD: spec 2 = identity(lang) only
    sid = drop_partition_field_iceberg_native(p, "bucket(4, doc_id)")
    assert sid == 2
    meta2 = table_metadata(p)
    spec2 = [s for s in meta2["partition-specs"] if s["spec-id"] == 2][0]
    assert [f["name"] for f in spec2["fields"]] == ["lang"]
    write_iceberg_native(_df(spark, 60, 70), p)
    assert read_iceberg_native(spark, p).count() == 69
    with pytest.raises(IcebergError, match="unknown partition field"):
        drop_partition_field_iceberg_native(p, "nope")


def test_sql_alter_partition_field(spark, tmp_path):
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    p = str(tmp_path / "evosql")
    write_iceberg_native(
        _df(spark, 0, 20), p, partition_by=["lang"], format_version=2
    )
    msg = sess.sql(
        f"ALTER TABLE '{p}' ADD PARTITION FIELD bucket(4, doc_id)"
    ).collect()[0][0]
    assert "spec 1" in msg
    write_iceberg_native(_df(spark, 20, 40), p)
    assert sess.sql(
        f"SELECT count(*) AS c FROM iceberg.scan('{p}')"
    ).collect()[0]["c"] == 40
    msg2 = sess.sql(
        f"ALTER TABLE '{p}' DROP PARTITION FIELD doc_id_bucket"
    ).collect()[0][0]
    assert "spec 2" in msg2
    # guard: delta tables have no partition-spec evolution
    import tempfile

    from glaredb_spark.sources.delta_native import write_delta_native

    dp = tempfile.mkdtemp() + "/d"
    write_delta_native(_df(spark, 0, 5), dp)
    with pytest.raises(ValueError, match="iceberg"):
        sess.sql(f"ALTER TABLE '{dp}' ADD PARTITION FIELD lang")

def test_add_partition_field_validates_transform(spark, tmp_path):
    """r10 review #5: a transform incompatible with the source type (or
    a zero bucket width) is refused BEFORE the spec commits."""
    p = str(tmp_path / "val")
    write_iceberg_native(
        _df(spark, 0, 5), p, partition_by=["lang"], format_version=2
    )
    with pytest.raises(IcebergError, match="does not apply"):
        add_partition_field_iceberg_native(p, "year(lang)")
    with pytest.raises(IcebergError, match=">= 1"):
        add_partition_field_iceberg_native(p, "bucket(0, doc_id)")
    with pytest.raises(IcebergError, match="does not apply"):
        add_partition_field_iceberg_native(p, "hour(doc_id)")
    with pytest.raises(IcebergError, match="unknown partition source"):
        add_partition_field_iceberg_native(p, "bucket(4, nope)")
    # nothing committed
    from glaredb_spark.sources.iceberg_native import table_metadata

    assert table_metadata(p)["default-spec-id"] == 0
