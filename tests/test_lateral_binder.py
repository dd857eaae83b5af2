"""Unit tests for the implicit-lateral retry binder. The binder is only
consulted AFTER a plain analysis failure (GlareSession.sql), so these pin
both the transform and the retry-only contract."""

import pytest

from glaredb_spark.functions.lateral_binder import lateralize


def test_comma_subquery_gets_lateral():
    q = "SELECT * FROM t1, (SELECT c1, c2 FROM t2)"
    assert " ".join(lateralize(q).split()).count("LATERAL (SELECT c1") == 1


def test_join_subquery_gets_lateral():
    q = "SELECT * FROM t LEFT JOIN (SELECT t.a + 1) t1(b) ON a = b"
    assert "JOIN LATERAL (" in lateralize(q)


def test_values_group_becomes_union_all():
    q = "SELECT * FROM (VALUES (2), (3)) v1(a), (VALUES (a + 1, a * 2)) v2(b, c)"
    out = lateralize(q)
    assert "SELECT 2 UNION ALL SELECT 3" in out
    assert "SELECT a + 1, a * 2" in out
    assert "LATERAL" in out


def test_scalar_subquery_in_select_list_untouched():
    q = "SELECT 4, (SELECT max(x) FROM t) FROM u"
    out = lateralize(q)
    assert "4, (SELECT max(x) FROM t)" in out  # no LATERAL injected here


def test_tvf_argument_commas_untouched():
    q = "SELECT * FROM f(a, (SELECT 1))"
    assert lateralize(q) == q


def test_insert_values_untouched():
    q = "INSERT INTO t VALUES (1), (2)"
    assert lateralize(q) == q


def test_session_retry_end_to_end(spark):
    from glaredb_spark import GlareSession

    sess = GlareSession(spark)
    rows = sess.sql(
        "SELECT * FROM (VALUES (2), (3)) v1(a), (VALUES (a + 1, a * 2)) v2(b, c) "
        "ORDER BY 1"
    ).collect()
    assert [tuple(r) for r in rows] == [(2, 3, 4), (3, 4, 6)]


def test_session_retry_preserves_original_error(spark):
    from glaredb_spark import GlareSession

    sess = GlareSession(spark)
    with pytest.raises(Exception) as ei:
        sess.sql("SELECT nonexistent_col FROM (VALUES (1)) t(v)")
    assert "nonexistent_col" in str(ei.value)
