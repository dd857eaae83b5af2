"""Unit tests for functions/unnest_binder.py (select-list zip semantics +
FROM-position unnest). End-to-end: slt standard/select/unnest.slt and
standard/functions/table/unnest_list.slt in the allowlist."""

from glaredb_spark.functions.unnest_binder import rewrite_unnest


def test_single_select_unnest_wraps_and_names():
    out = rewrite_unnest("SELECT unnest(array(3,4,5))")
    assert "arrays_zip(__ua0)" in out
    assert "__uzip.__ua0 AS unnest" in out
    assert "LATERAL VIEW explode" in out


def test_two_unnests_zip_once():
    out = rewrite_unnest("SELECT unnest(array(3,4,5)), unnest(array(3,2))")
    assert "arrays_zip(__ua0, __ua1)" in out
    assert out.count("coalesce") == 2


def test_duplicate_args_share_one_zip_slot():
    out = rewrite_unnest(
        "SELECT sum(unnest(a)), min(unnest(a)) FROM v"
    )
    assert "arrays_zip(__ua0)" in out and "__ua1" not in out
    assert "sum(__uzip.__ua0)" in out


def test_unnest_inside_expression():
    out = rewrite_unnest("SELECT unnest(array(3,4,5)) + 3")
    assert "__uzip.__ua0 + 3" in out
    assert "AS unnest" not in out  # not a bare item


def test_explicit_alias_kept():
    out = rewrite_unnest("SELECT unnest(array(3)) a, unnest(array(1)) b ORDER BY b")
    assert "__uzip.__ua0 a" in out and "__uzip.__ua1 b" in out
    assert out.rstrip().endswith("ORDER BY b")


def test_from_clause_and_other_columns_preserved():
    out = rewrite_unnest("SELECT b, unnest(a), b FROM v ORDER BY 2")
    assert "FROM v" in out and out.count("b,") >= 1
    assert "ORDER BY 2" in out


def test_from_position_standalone():
    out = rewrite_unnest("SELECT * FROM unnest(array(3,4,5)) ORDER BY 1")
    assert "(SELECT explode(coalesce((array(3,4,5)), array())) AS unnest)" in out


def test_from_position_comma_correlated():
    out = rewrite_unnest("SELECT u.* FROM (VALUES (x)) v(a), unnest(v.a) u ORDER BY 1")
    assert "LATERAL VIEW explode(coalesce((v.a), array())) u AS unnest" in out


def test_select_list_comma_not_treated_as_join():
    out = rewrite_unnest("SELECT unnest(NULL), unnest(array(4,5,6))")
    assert "LATERAL VIEW explode(arrays_zip" in out
    assert "__ulat" not in out


def test_no_unnest_untouched():
    sql = "SELECT a FROM t WHERE b = 'unnest(x)'"
    assert rewrite_unnest(sql) == sql


def test_group_by_bails():
    sql = "SELECT unnest(a) FROM t GROUP BY 1"
    assert rewrite_unnest(sql) == sql


def test_star_bails():
    sql = "SELECT *, unnest(a) FROM t"
    assert rewrite_unnest(sql) == sql
