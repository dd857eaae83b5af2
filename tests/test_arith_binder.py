"""Unit tests for the arith pre-binder (functions/arith_binder.py) — the
reference's polymorphic add/sub/mul/div/rem and integer '/' semantics
(crates/glaredb_core/src/functions/scalar/builtin/arith/, arith.slt),
plus the r3 ADVICE regressions: double-quoted strings, comments,
signed-exponent floats, and non-2-arg poly calls.
"""

import pytest

from glaredb_spark.functions.arith_binder import (
    expand_poly_calls,
    rewrite_arith,
    rewrite_int_division,
    values_colmap,
)


def _squash(s: str) -> str:
    return " ".join(s.split())


# --- expand_poly_calls --------------------------------------------------

@pytest.mark.parametrize(
    "sql,want",
    [
        ("select add(1, 2)", "select (1 + 2)"),
        ("select sub(2, 1)", "select (2 - 1)"),
        ("select mul(2, 3)", "select (2 * 3)"),
        ("select rem(5, 2)", "select (5 % 2)"),
        ("select div(5, 2)", "select (5 / 2)"),
        # recursion, innermost-out
        ("select add(add(1, 2), add(3, 4))", "select ((1 + 2) + (3 + 4))"),
        # arbitrary expressions as args
        ("select add(1+3, 2)", "select (1+3 + 2)"),
    ],
)
def test_expand_poly(sql, want):
    assert _squash(expand_poly_calls(sql)) == _squash(want)


def test_expand_poly_skips_wrong_arity_and_continues():
    # ADVICE r3: a 3-arg call of a matching name must be skipped, NOT
    # abandon expansion of the remaining calls
    out = expand_poly_calls("SELECT add(1,2,3), add(4,5)")
    assert _squash(out) == _squash("SELECT add(1,2,3), (4 + 5)")
    # infix div followed by parens is not a div() call
    out = expand_poly_calls("SELECT 10 div (2+3), add(1,2)")
    assert _squash(out) == _squash("SELECT 10 div (2+3), (1 + 2)")


def test_expand_poly_masks_strings_and_comments():
    assert expand_poly_calls("SELECT 'add(1,2)'") == "SELECT 'add(1,2)'"
    assert expand_poly_calls('SELECT "add(1,2)"') == 'SELECT "add(1,2)"'
    out = expand_poly_calls("SELECT 1 -- add(1,2)\n, add(2,3)")
    assert _squash(out) == _squash("SELECT 1 -- add(1,2)\n, (2 + 3)")


# --- rewrite_int_division ----------------------------------------------

@pytest.mark.parametrize(
    "sql,want",
    [
        ("SELECT 5 / 2", "SELECT 5 div 2"),
        ("SELECT 5.0 / 2", "SELECT 5.0 / 2"),
        ("SELECT 5 / 2.0", "SELECT 5 / 2.0"),
        # precedence: left operand is the whole multiplicative chain
        ("SELECT 1.0 * 3 / 2", "SELECT 1.0 * 3 / 2"),
        ("SELECT 4 * 3 / 2", "SELECT 4 * 3 div 2"),
        # int-returning functions
        ("SELECT count(*) / 2 FROM t", "SELECT count(*) div 2 FROM t"),
        # cast targets
        ("SELECT cast(x as double) / 2 FROM t", "SELECT cast(x as double) / 2 FROM t"),
        ("SELECT cast(x as bigint) / 2 FROM t", "SELECT cast(x as bigint) div 2 FROM t"),
        # unknown column without resolver: left alone (conservative)
        ("SELECT x / 2 FROM t", "SELECT x / 2 FROM t"),
    ],
)
def test_int_division(sql, want):
    assert _squash(rewrite_int_division(sql)) == _squash(want)


def test_int_division_div_word_chains():
    # the `div` infix link in multiplicative chains (_split_arith_terms
    # word branch — flagged as possibly unreachable in the r3 VERDICT)
    from glaredb_spark.functions.arith_binder import _split_arith_terms

    assert _split_arith_terms("8 div 4") == ["8", "4"]
    assert _squash(rewrite_int_division("SELECT 8 / 4 div 2")) == _squash(
        "SELECT 8 div 4 div 2"
    )
    # float anywhere in the left chain blocks the rewrite
    assert (
        rewrite_int_division("SELECT 8.0 div 4 / 2")
        == "SELECT 8.0 div 4 / 2"
    )


def test_int_division_signed_exponent_floats():
    # ADVICE r3: '1e-5 / 2' must NOT become '1e-5 div 2' (= 0)
    assert rewrite_int_division("SELECT 1e-5 / 2") == "SELECT 1e-5 / 2"
    assert rewrite_int_division("SELECT 2.5e+3 / 2") == "SELECT 2.5e+3 / 2"
    # but an identifier ending in a digit is still an unknown, not a float
    assert rewrite_int_division("SELECT x5 / 2 FROM t") == "SELECT x5 / 2 FROM t"


def test_int_division_masks_double_quotes_and_comments():
    # ADVICE r3: double-quoted strings are literals in Spark's default
    # dialect — never rewrite inside them
    assert rewrite_int_division('SELECT "3/4" AS frac') == 'SELECT "3/4" AS frac'
    assert (
        rewrite_int_division("SELECT '3/4', 6/3")
        == "SELECT '3/4', 6 div 3"
    )
    out = rewrite_int_division("SELECT 1 /* 4/2 */ , 6/3")
    assert "4/2" in out and "6 div 3" in out
    out = rewrite_int_division("SELECT 6/3 -- 8/4")
    assert "6 div 3" in out and "8/4" in out


def test_values_colmap_and_resolver():
    m = values_colmap("select * from (values (1, 2.0), (3, 4.5)) v")
    assert m["col1"] is True and m["col2"] is False
    # int only when EVERY tuple's literal in the position is an int
    m = values_colmap("select * from (values (1, 2), (3.5, 4))")
    assert m["col1"] is False and m["col2"] is True


# --- end-to-end through the session -------------------------------------

def test_session_sql_semantics(spark):
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    assert sess.sql("select 5 / 2").collect()[0][0] == 2
    assert sess.sql("select 5.0 / 2").collect()[0][0] == 2.5
    assert sess.sql("select add(1, 2)").collect()[0][0] == 3
    assert sess.sql("select div(5, 2)").collect()[0][0] == 2
    assert float(sess.sql("select div(1.0, 2)").collect()[0][0]) == 0.5
    assert sess.sql("select rem(5, 2)").collect()[0][0] == 1
    row = sess.sql(
        "select col1 / 2 as q from (values (1), (3)) order by q"
    ).collect()
    assert [r.q for r in row] == [0, 1]
    # string literal with a slash unharmed
    assert sess.sql("select '3/4'").collect()[0][0] == "3/4"
    # float result of 1e-5 / 2 (would be 0 under a bad rewrite)
    assert sess.sql("select 1e-5 / 2").collect()[0][0] == pytest.approx(5e-6)
