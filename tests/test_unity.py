"""Unity Catalog REST surface (sources/unity.py + unity_emulator.py ↔
slt/unity_catalog/*.slt): listings, ATTACH/SHOW CATALOGS/DETACH, and a
catalog-resolved native-Delta table scan."""

import pytest

from glaredb_spark.sources import unity
from glaredb_spark.sources.unity_emulator import UnityEmulator


@pytest.fixture()
def emulator():
    em = UnityEmulator()
    endpoint = em.start()
    yield em, endpoint
    em.stop()


def test_list_schemas_and_tables(spark, emulator):
    _em, ep = emulator
    schemas = unity.list_schemas(spark, ep, "unity").collect()
    assert [(r.name, r.catalog_name, r.comment) for r in schemas] == [
        ("default", "unity", "Default schema")
    ]
    tables = unity.list_tables(spark, ep, "unity", "default").collect()
    assert [r.name for r in tables] == [
        "marksheet", "marksheet_uniform", "numbers", "user_countries"
    ]
    assert all(r.data_source_format == "DELTA" for r in tables)


def test_pagination(spark, emulator, monkeypatch):
    em, ep = emulator
    for i in range(7):
        em.add_table(
            name=f"t{i}", catalog_name="c2", schema_name="s",
            table_type="EXTERNAL", data_source_format="DELTA",
            storage_location=f"file:///tmp/t{i}", comment="",
        )
    import glaredb_spark.sources.unity_emulator as ue

    monkeypatch.setattr(ue, "_PAGE_SIZE", 3)
    got = unity.list_tables(spark, ep, "c2", "s").collect()
    assert [r.name for r in got] == [f"t{i}" for i in range(7)]


def test_attach_show_catalogs_detach(spark, emulator):
    from glaredb_spark.session import GlareSession

    _em, ep = emulator
    sess = GlareSession(spark)
    try:
        sess.sql(
            f"ATTACH unity DATABASE AS my_unity "
            f"(endpoint '{ep}', catalog 'unity')"
        )
        cats = [r[0] for r in sess.sql("SHOW CATALOGS").collect()]
        assert cats == sorted(set(cats)) and "my_unity" in cats
        assert {"system", "temp"} <= set(cats)
        with pytest.raises(unity.UnityError, match="already attached"):
            sess.sql(
                f"ATTACH unity DATABASE AS my_unity "
                f"(endpoint '{ep}', catalog 'unity')"
            )
    finally:
        sess.sql("DETACH DATABASE my_unity")
    assert "my_unity" not in [
        r[0] for r in sess.sql("SHOW CATALOGS").collect()
    ]


def test_attach_validates_endpoint(spark):
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    with pytest.raises(unity.UnityError, match="request failed"):
        sess.sql(
            "ATTACH unity DATABASE AS bad "
            "(endpoint 'http://127.0.0.1:9', catalog 'unity')"
        )


def test_read_table_resolves_storage_location(spark, sf_dir, emulator, tmp_path):
    """unity.read: catalog REST lookup -> storage_location -> native
    Delta scan, end-to-end over a table the native writer created."""
    from glaredb_spark.session import GlareSession
    from glaredb_spark.sources.delta_native import write_delta_native

    em, ep = emulator
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang")
        .filter("doc_id < 25")
    )
    loc = str(tmp_path / "dt")
    write_delta_native(docs, loc)
    em.add_table(
        name="docs", catalog_name="unity", schema_name="default",
        table_type="EXTERNAL", data_source_format="DELTA",
        storage_location=f"file://{loc}", comment="",
    )
    sess = GlareSession(spark)
    got = sess.sql(
        f"SELECT count(*) AS n FROM unity.read('{ep}', 'unity', "
        f"'default', 'docs')"
    ).collect()
    assert got[0].n == 25
    with pytest.raises(unity.UnityError, match="request failed"):
        unity.read_table(spark, ep, "unity", "default", "nope")


def test_dotted_reference_over_attached_unity(spark, emulator, tmp_path):
    """FROM <alias>.<schema>.<table> over an ATTACHed unity catalog."""
    from glaredb_spark.session import GlareSession
    from glaredb_spark.sources.delta_native import write_delta_native
    from glaredb_spark.sources.unity import attach_unity, detach_unity

    loc = str(tmp_path / "ud")
    write_delta_native(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        loc,
    )
    em, endpoint = emulator
    em.add_table(**{
        "name": "dt", "catalog_name": "unity", "schema_name": "default",
        "table_type": "EXTERNAL", "data_source_format": "DELTA",
        "storage_location": f"file://{loc}", "comment": "",
    })
    attach_unity(spark, "ud_alias", endpoint, "unity")
    try:
        sess = GlareSession(spark)
        rows = sess.sql(
            "SELECT count(*) AS n FROM ud_alias.default.dt"
        ).collect()
        assert rows[0].n == 2
    finally:
        detach_unity(spark, "ud_alias")
