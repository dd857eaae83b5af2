"""Unit tests for the star-macro pre-binder (EXCLUDE/EXCEPT/REPLACE/
COLUMNS select-list rewrites). SLT-level coverage runs the reference's own
files (test_slt.py); these pin the string-safety and no-op contracts."""

import pytest

from glaredb_spark.functions.star_binder import rewrite_star_macros


@pytest.fixture(scope="module")
def s(spark):
    spark.sql("CREATE OR REPLACE TEMP VIEW sb1 AS SELECT 2 a, 3 b, 4 c")
    return spark


def _rows(s, sql):
    return [tuple(r) for r in s.sql(rewrite_star_macros(sql, s)).collect()]


def test_noop_without_keywords(s):
    q = "SELECT a, b FROM sb1"
    assert rewrite_star_macros(q, s) is q  # fast path: same object


def test_exclude_single_relation(s):
    assert _rows(s, "SELECT * EXCLUDE (b) FROM sb1") == [(2, 4)]


def test_exclude_multi_relation_duplicate_names(s):
    # reference semantics: unqualified EXCLUDE drops EVERY b
    assert _rows(s, "SELECT * EXCLUDE (b) FROM sb1 x, sb1 y") == [(2, 4, 2, 4)]


def test_replace_preserves_position(s):
    assert _rows(s, "SELECT * REPLACE (a + 8 AS a) FROM sb1") == [(10, 3, 4)]


def test_replace_unknown_column_errors(s):
    with pytest.raises(ValueError, match="REPLACE list"):
        rewrite_star_macros("SELECT * REPLACE (d + 1 AS d) FROM sb1", s)


def test_exclude_unknown_column_errors(s):
    with pytest.raises(ValueError, match="EXCLUDE list"):
        rewrite_star_macros("SELECT * EXCLUDE (zz) FROM sb1", s)


def test_columns_regex(s):
    assert _rows(s, "SELECT COLUMNS('a|c') FROM sb1") == [(2, 4)]


def test_columns_is_case_sensitive(s):
    s.sql("CREATE OR REPLACE TEMP VIEW sb2 AS SELECT 4 Mickey, 5 mouse")
    assert _rows(s, "SELECT COLUMNS('M.*') FROM sb2") == [(4,)]
    assert _rows(s, "SELECT COLUMNS('m.*') FROM sb2") == [(5,)]


def test_keywords_inside_string_literals_untouched(s):
    q = "SELECT 'x EXCLUDE (b) y' AS lit, a FROM sb1"
    assert _rows(s, q) == [("x EXCLUDE (b) y", 2)]


def test_replace_function_call_not_a_macro(s):
    # replace() the string function must never trigger star expansion
    q = "SELECT replace('abc', 'b', 'z') AS r FROM sb1"
    assert _rows(s, q) == [("azc",)]


def test_set_operator_except_untouched(s):
    q = "SELECT a FROM sb1 EXCEPT SELECT a FROM sb1 WHERE a > 99"
    assert _rows(s, q) == [(2,)]


def test_mixed_items_and_describe_prefix(s):
    assert _rows(s, "SELECT a, * EXCLUDE (b) FROM sb1") == [(2, 2, 4)]
    rewritten = rewrite_star_macros("DESCRIBE SELECT * EXCLUDE (b) FROM sb1", s)
    assert "EXCLUDE" not in rewritten.upper()
