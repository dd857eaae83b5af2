"""ALTER COLUMN type widening on both lakehouse formats (r10 — VERDICT
r9 next #6): iceberg spec type promotion / Delta typeWidening. Both are
metadata-only commits; old narrower files scan under the widened type
(Spark's parquet reader upcasts int32->long, float->double, decimal
precision growth natively)."""

from decimal import Decimal

import pytest


def test_iceberg_widen_lifecycle(spark, tmp_path):
    from glaredb_spark.sources.iceberg_native import (
        IcebergError,
        delete_iceberg_native,
        optimize_iceberg_native,
        read_iceberg_native,
        table_metadata,
        widen_column_iceberg_native,
        write_iceberg_native,
    )

    p = str(tmp_path / "iw")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, float(i), Decimal("1.25")) for i in range(10)],
            "id int, x float, d decimal(5,2)",
        ).coalesce(1),
        p, format_version=2,
    )
    widen_column_iceberg_native(p, "id", "long")
    widen_column_iceberg_native(p, "x", "double")
    widen_column_iceberg_native(p, "d", "decimal(12,2)")
    got = read_iceberg_native(spark, p)
    assert dict(got.dtypes) == {
        "id": "bigint", "x": "double", "d": "decimal(12,2)"
    }
    assert got.count() == 10
    assert got.filter("id = 3").collect()[0]["x"] == 3.0
    # widening never dirties the table: DML works without OPTIMIZE
    write_iceberg_native(
        spark.createDataFrame(
            [(2**40, 1.5, Decimal("9999999999.99"))],
            "id long, x double, d decimal(12,2)",
        ).coalesce(1),
        p,
    )
    got2 = read_iceberg_native(spark, p)  # mixed narrow+wide files
    assert got2.count() == 11
    assert got2.filter(f"id = {2**40}").count() == 1
    deleted, _ = delete_iceberg_native(spark, p, "id = 4", strategy="cow")
    assert deleted == 1
    optimize_iceberg_native(spark, p)
    got3 = read_iceberg_native(spark, p)
    assert got3.count() == 10 and dict(got3.dtypes)["id"] == "bigint"
    # schema history kept all revisions; field ids unchanged
    meta = table_metadata(p)
    assert len(meta["schemas"]) == 4
    assert "glaredb.evolution-dirty-seq" not in (
        meta.get("properties") or {}
    )
    # refusals: narrowing, cross-type, scale change
    for col, t in (("id", "int"), ("x", "string"), ("d", "decimal(12,4)")):
        with pytest.raises(IcebergError, match="cannot widen"):
            widen_column_iceberg_native(p, col, t)
    with pytest.raises(IcebergError, match="unknown column"):
        widen_column_iceberg_native(p, "nope", "long")


def test_delta_widen_lifecycle(spark, tmp_path):
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        load_delta_state,
        read_delta_native,
        widen_column_delta_native,
        write_delta_native,
    )

    p = str(tmp_path / "dw")
    write_delta_native(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id int, x float"
        ).coalesce(1),
        p,
    )
    widen_column_delta_native(p, "id", "bigint")
    widen_column_delta_native(p, "x", "double")
    got = read_delta_native(spark, p)
    assert dict(got.dtypes) == {"id": "bigint", "x": "double"}
    assert got.count() == 10
    # protocol carries the feature; the field records its history
    state = load_delta_state(p)
    assert "typeWidening" in state.reader_features
    assert "typeWidening" in state.writer_features
    import json as _json

    fld = [f for f in _json.loads(state.schema_json)["fields"]
           if f["name"] == "id"][0]
    hist = fld["metadata"]["delta.typeWidening"]
    assert hist[0]["fromType"] == "integer"
    assert hist[0]["toType"] == "long"
    # post-widen appends + DML over mixed files
    write_delta_native(
        spark.createDataFrame([(2**40, 2.5)], "id long, x double"), p,
        mode="append",
    )
    assert read_delta_native(spark, p).count() == 11
    deleted, _ = delete_delta_native(spark, p, "id = 4")
    assert deleted == 1
    assert read_delta_native(spark, p).count() == 10
    # refusals
    with pytest.raises(RuntimeError, match="cannot widen"):
        widen_column_delta_native(p, "x", "float")
    with pytest.raises(RuntimeError, match="unknown column"):
        widen_column_delta_native(p, "nope", "bigint")


def test_sql_alter_column_type(spark, tmp_path):
    from glaredb_spark.session import GlareSession
    from glaredb_spark.sources.iceberg_native import write_iceberg_native

    sess = GlareSession(spark)
    p = str(tmp_path / "sqlw")
    write_iceberg_native(
        spark.createDataFrame([(1, Decimal("2.50"))],
                              "id int, d decimal(6,2)"),
        p, format_version=2,
    )
    msg = sess.sql(
        f"ALTER TABLE '{p}' ALTER COLUMN id TYPE bigint"
    ).collect()[0][0]
    assert "widened" in msg
    sess.sql(f"ALTER TABLE '{p}' ALTER COLUMN d TYPE decimal(18, 2)")
    got = sess.sql(f"SELECT * FROM iceberg.scan('{p}')")
    assert dict(got.dtypes) == {"id": "bigint", "d": "decimal(18,2)"}
    assert got.collect()[0]["d"] == Decimal("2.50")

def test_widen_with_container_column_stays_readable(spark, tmp_path):
    """r10 review #1: widening a table that ALSO has a container column
    must not make it unreadable once narrow+wide files coexist (the
    merge-inference failure falls back to declared types, containers
    included), and OPTIMIZE can still normalize."""
    from glaredb_spark.sources.iceberg_native import (
        optimize_iceberg_native,
        read_iceberg_native,
        widen_column_iceberg_native,
        write_iceberg_native,
    )

    p = str(tmp_path / "wc")
    write_iceberg_native(
        spark.createDataFrame(
            [(i, [f"t{i}"]) for i in range(5)],
            "id int, tags array<string>",
        ).coalesce(1),
        p, format_version=2,
    )
    widen_column_iceberg_native(p, "id", "long")
    write_iceberg_native(
        spark.createDataFrame([(2**40, ["big"])],
                              "id long, tags array<string>").coalesce(1),
        p,
    )
    got = read_iceberg_native(spark, p)  # mixed int/long + array column
    assert got.count() == 6
    assert got.filter(f"id = {2**40}").collect()[0]["tags"] == ["big"]
    assert dict(got.dtypes)["tags"] == "array<string>"
    optimize_iceberg_native(spark, p)
    got2 = read_iceberg_native(spark, p)
    assert got2.count() == 6 and dict(got2.dtypes)["id"] == "bigint"
