"""COPY ... TO SQL surface (reference plan_copy.rs declares + stubs it;
DuckDB syntax): subquery and table sources, parquet/csv, format inference,
table-function composition."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def sess(spark, sf_dir):
    from glaredb_spark.session import GlareSession

    s = GlareSession(spark)
    s.register_tables(sf_dir, ("nation", "region"))
    return s


def test_copy_subquery_to_parquet(sess, tmp_path):
    out = str(tmp_path / "af_nations.parquet")
    n = sess.sql(
        f"COPY (SELECT n_name, n_regionkey FROM nation WHERE n_regionkey = 0) "
        f"TO '{out}' (FORMAT PARQUET)"
    ).collect()[0].Count
    assert n == 5
    back = sess.spark.read.parquet(out)
    assert back.count() == 5 and set(back.columns) == {"n_name", "n_regionkey"}


def test_copy_table_to_csv_with_inferred_format(sess, tmp_path):
    out = str(tmp_path / "regions.csv")
    n = sess.sql(f"COPY region TO '{out}'").collect()[0].Count
    assert n == 5
    back = sess.spark.read.option("header", "true").csv(out)
    assert back.count() == 5 and "r_name" in back.columns


def test_copy_composes_with_table_functions(sess, tmp_path):
    out = str(tmp_path / "tf.parquet")
    n = sess.sql(
        f"COPY (SELECT * FROM read_parquet('{SF_SMALL}/region.parquet')) "
        f"TO '{out}' (FORMAT PARQUET)"
    ).collect()[0].Count
    assert n == 5


def test_copy_bad_format_raises(sess, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        sess.sql(f"COPY region TO '{tmp_path}/x.xyz' (FORMAT XML)")


def test_copy_to_delta_appends_native_table(sess, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "nation_delta")
    n = sess.sql(f"COPY nation TO '{out}' (FORMAT DELTA)").collect()[0].Count
    assert n == 25
    n2 = sess.sql(
        f"COPY (SELECT * FROM nation WHERE n_regionkey = 0) TO '{out}' "
        "(FORMAT DELTA)"
    ).collect()[0].Count
    back = read_delta_native(sess.spark, out)
    assert back.count() == 25 + n2


def test_copy_to_iceberg_appends_native_table(sess, tmp_path):
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    out = str(tmp_path / "nation_ice")
    n = sess.sql(f"COPY nation TO '{out}' (FORMAT ICEBERG)").collect()[0].Count
    assert n == 25
    back = read_iceberg_native(sess.spark, out)
    assert back.count() == 25


def test_sql_dml_on_delta_path(sess, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "nat_delta")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_regionkey FROM nation) TO '{out}' "
        "(FORMAT DELTA)"
    )
    total = read_delta_native(sess.spark, out).count()
    n = sess.sql(
        f"DELETE FROM '{out}' WHERE n_nationkey < 5"
    ).collect()[0].Count
    assert n == 5
    assert read_delta_native(sess.spark, out).count() == total - 5
    n = sess.sql(
        f"UPDATE '{out}' SET n_regionkey = n_regionkey + 100 "
        "WHERE n_nationkey < 10"
    ).collect()[0].Count
    assert n == 5  # keys 5..9 remain
    got = read_delta_native(sess.spark, out)
    assert got.filter("n_regionkey >= 100").count() == 5


def test_copy_overwrite_delta_and_iceberg(sess, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    for fmt, reader in (
        ("DELTA", read_delta_native),
        ("ICEBERG", read_iceberg_native),
    ):
        out = str(tmp_path / fmt.lower())
        sess.sql(
            f"COPY (SELECT n_nationkey, n_name FROM nation) TO '{out}' "
            f"(FORMAT {fmt})"
        )
        n = sess.sql(
            f"COPY (SELECT n_nationkey, n_name FROM nation WHERE "
            f"n_nationkey < 5) TO '{out}' (FORMAT {fmt}, OVERWRITE)"
        ).collect()[0].Count
        assert n == 5
        assert reader(sess.spark, out).count() == 5


def test_sql_dml_on_iceberg_path(sess, tmp_path):
    """DELETE FROM / UPDATE dispatch on the directory's metadata layout:
    an iceberg table routes to the iceberg COW DML."""
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    out = str(tmp_path / "ice")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name, n_regionkey FROM nation) "
        f"TO '{out}' (FORMAT ICEBERG)"
    )
    n = sess.sql(f"DELETE FROM '{out}' WHERE n_regionkey = 0").collect()
    assert n[0].Count == 5
    n = sess.sql(
        f"UPDATE '{out}' SET n_name = upper(n_name) WHERE n_nationkey < 3"
    ).collect()
    assert n[0].Count == 2  # nations 0 and 2 survive (1 was region 0)
    rows = read_iceberg_native(sess.spark, out).collect()
    assert len(rows) == 20
    assert all(
        r["n_name"] == r["n_name"].upper()
        for r in rows if r["n_nationkey"] < 3
    )


def test_merge_into_sql(sess, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name, n_regionkey FROM nation "
        f"WHERE n_nationkey < 20) TO '{out}' (FORMAT DELTA)"
    )
    sess.spark.sql(
        "SELECT n_nationkey, concat(n_name, '!') AS n_name, n_regionkey "
        "FROM nation WHERE n_nationkey >= 15"
    ).createOrReplaceTempView("merge_src_v")
    n = sess.sql(
        f"MERGE INTO '{out}' AS t USING merge_src_v AS s "
        f"ON t.n_nationkey = s.n_nationkey "
        f"WHEN MATCHED THEN UPDATE SET n_name = s.n_name "
        f"WHEN NOT MATCHED THEN INSERT *"
    ).collect()
    assert n[0].Count == 10  # 5 updated (15..19) + 5 inserted (20..24)
    rows = {r["n_nationkey"]: r["n_name"]
            for r in read_delta_native(sess.spark, out).collect()}
    assert len(rows) == 25
    assert rows[16].endswith("!") and rows[22].endswith("!")
    assert not rows[3].endswith("!")


def test_merge_into_insert_only_and_subquery_source(sess, tmp_path):
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation WHERE "
        f"n_nationkey < 10) TO '{out}' (FORMAT DELTA)"
    )
    n = sess.sql(
        f"MERGE INTO '{out}' t USING (SELECT n_nationkey, n_name FROM "
        f"nation WHERE n_nationkey < 12) s ON t.n_nationkey = s.n_nationkey "
        f"WHEN NOT MATCHED THEN INSERT"
    ).collect()
    assert n[0].Count == 2
    assert read_delta_native(sess.spark, out).count() == 12


def test_merge_into_bad_on_condition_raises(sess, tmp_path):
    out = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation) TO '{out}' "
        f"(FORMAT DELTA)"
    )
    with pytest.raises(ValueError, match="MERGE ON"):
        sess.sql(
            f"MERGE INTO '{out}' t USING nation s ON t.n_nationkey < "
            f"s.n_nationkey WHEN NOT MATCHED THEN INSERT"
        )


def test_merge_into_aliases_named_t_and_s_swapped(sess, tmp_path):
    """User aliases that collide with the internal t/s names must not
    double-rewrite: target aliased 'x', source aliased 't'."""
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_regionkey FROM nation WHERE "
        f"n_nationkey < 10) TO '{out}' (FORMAT DELTA)"
    )
    sess.spark.sql(
        "SELECT n_nationkey, n_regionkey + 100 AS n_regionkey FROM nation "
        "WHERE n_nationkey < 5"
    ).createOrReplaceTempView("msrc")
    n = sess.sql(
        f"MERGE INTO '{out}' AS x USING msrc AS t "
        f"ON x.n_nationkey = t.n_nationkey "
        f"WHEN MATCHED THEN UPDATE SET n_regionkey = x.n_regionkey + t.n_regionkey"
    ).collect()
    assert n[0].Count == 5
    rows = {r["n_nationkey"]: r["n_regionkey"]
            for r in read_delta_native(sess.spark, out).collect()}
    base = {r["n_nationkey"]: r["n_regionkey"]
            for r in sess.spark.sql(
                "SELECT n_nationkey, n_regionkey FROM nation "
                "WHERE n_nationkey < 10").collect()}
    for k, v in base.items():
        # matched rows: target value + (source value + 100); x.* must
        # bind to the target, t.* to the source
        want = v + (v + 100) if k < 5 else v
        assert rows[k] == want, (k, rows[k], want)


def test_unknown_tvf_named_argument_raises(sess):
    with pytest.raises(Exception, match="unsupported named argument"):
        sess.sql(
            "SELECT * FROM read_csv('/root/testdata/sf0.001/region.parquet',"
            " delim = ';')"
        )


def test_maintenance_sql_statements(sess, tmp_path):
    """OPTIMIZE / VACUUM [RETAIN n HOURS] [DRY RUN] / REORG TABLE APPLY
    (PURGE) over a native Delta directory."""
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "dt")
    for lo, hi in ((0, 10), (10, 20), (20, 25)):
        sess.sql(
            f"COPY (SELECT n_nationkey, n_name FROM nation WHERE "
            f"n_nationkey >= {lo} AND n_nationkey < {hi}) TO '{out}' "
            f"(FORMAT DELTA)"
        )
    r = sess.sql(f"OPTIMIZE '{out}'").collect()[0]
    assert r.files_removed >= 2 and r.files_added >= 1
    assert read_delta_native(sess.spark, out).count() == 25
    # DV delete then purge via SQL
    sess.sql(f"DELETE FROM '{out}' WHERE n_nationkey = 3")  # COW (plain)
    from glaredb_spark.sources.delta_native import delete_delta_native

    delete_delta_native(sess.spark, out, "n_nationkey = 4", strategy="dv")
    r = sess.sql(f"REORG TABLE '{out}' APPLY (PURGE)").collect()[0]
    assert r.files_purged >= 1 and r.rows_materialized >= 1
    # dry-run lists but doesn't delete; the real vacuum then removes
    dry = sess.sql(f"VACUUM '{out}' RETAIN 0 HOURS DRY RUN").collect()
    assert dry
    import os as _os

    # returned paths are table-relative; dry-run must not delete
    assert all(_os.path.exists(_os.path.join(out, r.path)) for r in dry)
    real = sess.sql(f"VACUUM '{out}' RETAIN 0 HOURS").collect()
    assert {r.path for r in real} == {r.path for r in dry}
    assert read_delta_native(sess.spark, out).count() == 23


def test_sql_iceberg_dml_strategy_knob(spark, sf_dir, tmp_path):
    """DELETE FROM / UPDATE accept an iceberg.scan('path',
    strategy=>'cow'|'mor') target (r9): 'mor' writes position deletes
    (no data-file rewrite), 'cow' rewrites; results identical. Delta
    targets refuse the knob."""
    from glaredb_spark.session import GlareSession
    from glaredb_spark.sources.iceberg_native import (
        _manifest_entries,
        read_iceberg_native,
        table_metadata,
        write_iceberg_native,
    )

    sess = GlareSession(spark)
    src = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
    )

    def _content_counts(path):
        meta = table_metadata(path)
        out = {0: 0, 1: 0, 2: 0}
        for e in _manifest_entries(meta, path):
            out[(e["data_file"].get("content", 0) or 0)] += 1
        return out

    # MoR DELETE via SQL: position-delete files appear
    p1 = str(tmp_path / "mor")
    write_iceberg_native(src, p1, format_version=2)
    n = sess.sql(
        f"DELETE FROM iceberg.scan('{p1}', strategy=>'mor') "
        f"WHERE n_nationkey < 5"
    ).collect()
    assert n[0]["Count"] == 5
    assert _content_counts(p1)[1] >= 1  # position-delete files committed
    got = sorted(
        r["n_nationkey"] for r in read_iceberg_native(spark, p1).collect()
    )
    assert got == sorted(
        r["n_nationkey"] for r in src.filter("n_nationkey >= 5").collect()
    )
    # MoR UPDATE via SQL ('=' form also accepted)
    n = sess.sql(
        f"UPDATE iceberg.scan('{p1}', strategy='mor') "
        f"SET n_regionkey = n_regionkey + 100 WHERE n_nationkey = 7"
    ).collect()
    assert n[0]["Count"] == 1
    row = read_iceberg_native(spark, p1).filter("n_nationkey = 7").collect()
    assert row[0]["n_regionkey"] >= 100
    # COW via the knob: no delete files added
    p2 = str(tmp_path / "cow")
    write_iceberg_native(src, p2, format_version=2)
    sess.sql(
        f"DELETE FROM iceberg.scan('{p2}', strategy=>'cow') "
        f"WHERE n_nationkey < 5"
    ).collect()
    assert _content_counts(p2)[1] == 0
    assert read_iceberg_native(spark, p2).count() == src.count() - 5
    # the knob is refused on Delta targets
    import pytest as _pytest

    from glaredb_spark.sources.delta_native import write_delta_native

    p3 = str(tmp_path / "dlt")
    write_delta_native(src, p3)
    with _pytest.raises(Exception, match="strategy"):
        sess.sql(
            f"DELETE FROM iceberg.scan('{p3}', strategy=>'mor') "
            f"WHERE n_nationkey = 1"
        )


def test_merge_matched_delete_sql_delta(sess, tmp_path):
    """WHEN MATCHED THEN DELETE (r14, VERDICT r13 #3): matched rows
    are retired in the same commit; with AND <cond> only the selected
    matched rows delete while others fall to the update branch."""
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name, n_regionkey FROM nation) "
        f"TO '{out}' (FORMAT DELTA)"
    )
    sess.spark.sql(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation "
        "WHERE n_nationkey < 6"
    ).createOrReplaceTempView("mdel_src")
    n = sess.sql(
        f"MERGE INTO '{out}' AS t USING mdel_src AS s "
        f"ON t.n_nationkey = s.n_nationkey "
        f"WHEN MATCHED THEN DELETE"
    ).collect()[0].Count
    assert n == 6
    keys = {r.n_nationkey
            for r in read_delta_native(sess.spark, out).collect()}
    assert keys == set(range(6, 25))
    # conditional delete + update for the rest
    sess.spark.sql(
        "SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey "
        "FROM nation WHERE n_nationkey >= 6 AND n_nationkey < 12"
    ).createOrReplaceTempView("mdel_src2")
    n = sess.sql(
        f"MERGE INTO '{out}' AS t USING mdel_src2 AS s "
        f"ON t.n_nationkey = s.n_nationkey "
        f"WHEN MATCHED AND t.n_nationkey < 9 THEN DELETE "
        f"WHEN MATCHED THEN UPDATE SET n_name = s.n_name"
    ).collect()[0].Count
    assert n == 6  # matched rows, deleted or updated
    rows = {r.n_nationkey: r.n_name
            for r in read_delta_native(sess.spark, out).collect()}
    assert set(rows) == set(range(9, 25))
    assert rows[10] == rows[10].upper()


def test_merge_matched_delete_sql_iceberg(sess, tmp_path):
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    out = str(tmp_path / "ice")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name, n_regionkey FROM nation) "
        f"TO '{out}' (FORMAT ICEBERG)"
    )
    n = sess.sql(
        f"MERGE INTO '{out}' AS t "
        f"USING (SELECT n_nationkey, n_name, n_regionkey FROM nation "
        f"WHERE n_regionkey = 2) AS s "
        f"ON t.n_nationkey = s.n_nationkey "
        f"WHEN MATCHED THEN DELETE"
    ).collect()[0].Count
    assert n == 5
    got = read_iceberg_native(sess.spark, out)
    assert got.count() == 20
    assert got.filter("n_regionkey = 2").count() == 0


def test_merge_nested_paren_using_subquery(sess, tmp_path):
    """The USING capture is paren-balanced (r14): a subquery with
    nested parens no longer truncates at the first ')'."""
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation WHERE "
        f"n_nationkey < 10) TO '{out}' (FORMAT DELTA)"
    )
    n = sess.sql(
        f"MERGE INTO '{out}' t USING "
        f"(SELECT n_nationkey, upper(substring(n_name, 1, 3)) AS n_name "
        f"FROM nation WHERE n_nationkey IN (SELECT n_nationkey FROM "
        f"nation WHERE n_nationkey < 12)) s "
        f"ON t.n_nationkey = s.n_nationkey "
        f"WHEN MATCHED THEN UPDATE SET n_name = s.n_name "
        f"WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0].Count
    assert n == 12  # 10 updated + 2 inserted
    rows = read_delta_native(sess.spark, out).collect()
    assert len(rows) == 12
    assert all(len(r.n_name) == 3 for r in rows)


def test_merge_conditional_insert_sql(sess, tmp_path):
    """WHEN NOT MATCHED AND <cond> THEN INSERT gates inserts on a
    source predicate (r14)."""
    from glaredb_spark.sources.delta_native import read_delta_native

    out = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_regionkey FROM nation WHERE "
        f"n_nationkey < 10) TO '{out}' (FORMAT DELTA)"
    )
    n = sess.sql(
        f"MERGE INTO '{out}' t USING "
        f"(SELECT n_nationkey, n_regionkey FROM nation) s "
        f"ON t.n_nationkey = s.n_nationkey "
        f"WHEN NOT MATCHED AND s.n_regionkey = 3 THEN INSERT *"
    ).collect()[0].Count
    back = read_delta_native(sess.spark, out)
    inserted = back.filter("n_nationkey >= 10").collect()
    assert n == len(inserted)
    assert inserted and all(r.n_regionkey == 3 for r in inserted)


def test_merge_unsupported_clause_named_error(sess, tmp_path):
    out = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation) TO '{out}' "
        f"(FORMAT DELTA)"
    )
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        sess.sql(
            f"MERGE INTO '{out}' t USING nation s "
            f"ON t.n_nationkey = s.n_nationkey "
            f"WHEN MATCHED THEN FROBNICATE"
        )


def test_delete_update_without_where(sess, tmp_path):
    """DELETE FROM t / UPDATE t SET ... without WHERE are the standard
    full-table forms (r14): predicate defaults to true on both the
    path and catalog routes."""
    from glaredb_spark.sources.delta_native import read_delta_native
    from glaredb_spark.sources.iceberg_native import read_iceberg_native

    dt = str(tmp_path / "dt")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation) TO '{dt}' "
        f"(FORMAT DELTA)"
    )
    n = sess.sql(
        f"UPDATE '{dt}' SET n_name = upper(n_name)"
    ).collect()[0].Count
    assert n == 25
    assert all(
        r.n_name == r.n_name.upper()
        for r in read_delta_native(sess.spark, dt).collect()
    )
    n = sess.sql(f"DELETE FROM '{dt}'").collect()[0].Count
    assert n == 25
    assert read_delta_native(sess.spark, dt).count() == 0

    ice = str(tmp_path / "ice")
    sess.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation) TO '{ice}' "
        f"(FORMAT ICEBERG)"
    )
    n = sess.sql(f"DELETE FROM '{ice}'").collect()[0].Count
    assert n == 25
    assert read_iceberg_native(sess.spark, ice).count() == 0
