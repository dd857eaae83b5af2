"""Unit tests for functions/misc_binder.py — factorial expansion,
NULL-bound BETWEEN poisoning, shl narrow-width wraparound, negative-scale
DECIMAL, reference type aliases. End-to-end coverage lives in the SLT
allowlist (factorial.slt, between.slt, shl.slt, cast/decimal.slt,
setops/union.slt)."""

import pytest

from glaredb_spark.functions.misc_binder import (
    ReferenceSemanticsError,
    rewrite_factorial,
    rewrite_misc,
    rewrite_null_bound_between,
    rewrite_negative_scale_decimal,
    rewrite_shl,
)


def test_factorial_expands_to_decimal_fold():
    out = rewrite_factorial("SELECT factorial(25)")
    assert "DECIMAL(38,0)" in out and "sequence(2, CAST((25) AS INT))" in out
    assert out.rstrip().endswith("AS factorial")


def test_factorial_no_alias_inside_expression():
    out = rewrite_factorial("SELECT factorial(3) + factorial(4)")
    assert "AS factorial" not in out
    assert out.count("DECIMAL(38,0)") >= 4  # two expansions


def test_factorial_nested_errors_like_reference():
    with pytest.raises(ReferenceSemanticsError):
        rewrite_factorial("SELECT factorial(factorial(3))")


def test_factorial_inside_string_untouched():
    sql = "SELECT 'factorial(3)'"
    assert rewrite_factorial(sql) == sql


def test_between_null_upper_bound_poisons():
    out = rewrite_null_bound_between(
        "SELECT * FROM t1 WHERE a NOT BETWEEN 5 AND NULL ORDER BY 1"
    )
    assert "CAST(NULL AS BOOLEAN)" in out and "BETWEEN" not in out


def test_between_null_lower_bound_poisons():
    out = rewrite_null_bound_between("SELECT a BETWEEN NULL AND 9 FROM t")
    assert "CAST(NULL AS BOOLEAN)" in out


def test_between_without_null_untouched():
    sql = "SELECT * FROM t WHERE a BETWEEN 1 AND 2"
    assert rewrite_null_bound_between(sql) == sql


def test_shl_tinyint_wraparound_form():
    out = rewrite_shl("SELECT shl(CAST(1 AS TINYINT), 7) AS result")
    assert "pmod" in out and "+ 128, 256" in out and "AS TINYINT" in out


def test_shl_smallint_width():
    out = rewrite_shl("SELECT shl(CAST(1 AS SMALLINT), 8)")
    assert "+ 32768, 65536" in out


def test_shl_int_untouched():
    sql = "SELECT shl(4, 1)"
    assert rewrite_shl(sql) == sql


def test_negative_scale_decimal_colon_cast():
    out = rewrite_negative_scale_decimal("select 10::DECIMAL(8, -1)")
    assert "ROUND(10, -1)" in out and "DECIMAL(8,0)" in out


def test_negative_scale_decimal_cast_form():
    out = rewrite_negative_scale_decimal(
        "select CAST(123 AS DECIMAL(8, -2))"
    )
    assert "ROUND(123, -2)" in out and "DECIMAL(8,0)" in out


def test_positive_scale_decimal_untouched():
    sql = "select CAST(1 AS DECIMAL(8, 2)), 3::DECIMAL(5, 1)"
    assert rewrite_negative_scale_decimal(sql) == sql


def test_type_aliases():
    out = rewrite_misc("SELECT 1.0::float8, 2::int8, CAST(x AS BLOB) FROM t")
    assert "DOUBLE" in out and "BIGINT" in out and "BINARY" in out


def test_aliases_inside_strings_untouched():
    out = rewrite_misc("SELECT 'float8 int8 blob'")
    assert "'float8 int8 blob'" in out


def test_unsigned_colon_cast_range_check():
    from glaredb_spark.functions.misc_binder import rewrite_unsigned

    out = rewrite_unsigned("select 255::UTINYINT")
    assert "raise_error" in out and "> 255" in out and "AS SMALLINT" in out


def test_unsigned_chain_scans_full_operand():
    from glaredb_spark.functions.misc_binder import rewrite_unsigned

    out = rewrite_unsigned("select 100::INT::UINT")
    assert "((100::INT)" in out.replace(" ", "") or "(100::INT)" in out
    assert "> 4294967295" in out


def test_unsigned_ubigint_decimal_target():
    from glaredb_spark.functions.misc_binder import rewrite_unsigned

    out = rewrite_unsigned("select 18446744073709551615::UBIGINT")
    assert "DECIMAL(20,0)" in out and "> 18446744073709551615" in out


def test_unsigned_ddl_names_widen():
    from glaredb_spark.functions.misc_binder import rewrite_unsigned

    out = rewrite_unsigned("CREATE TABLE t (a USMALLINT, b UBIGINT)")
    assert "a INT" in out and "b DECIMAL(20,0)" in out


def test_unsigned_select_item_keeps_column_name():
    from glaredb_spark.functions.misc_binder import rewrite_unsigned

    out = rewrite_unsigned("SELECT a::UTINYINT FROM t")
    assert out.rstrip().endswith("AS a FROM t") or " AS a " in out


def test_cast_naming_single_and_nested():
    from glaredb_spark.functions.misc_binder import rewrite_cast_naming

    out = rewrite_cast_naming("SELECT CAST(a::INT AS TEXT) FROM test")
    assert "AS a FROM" in out
    out = rewrite_cast_naming("SELECT a::INT FROM test")
    assert "a::INT AS a" in out


def test_cast_naming_recurses_into_subqueries():
    from glaredb_spark.functions.misc_binder import rewrite_cast_naming

    out = rewrite_cast_naming(
        "SELECT a || 'x' FROM (SELECT CAST(a::INT AS TEXT) FROM test)"
    )
    assert "AS a FROM test" in out


def test_cast_naming_leaves_aliased_and_literals():
    from glaredb_spark.functions.misc_binder import rewrite_cast_naming

    sql = "SELECT CAST(a AS INT) AS x, '2'::INT FROM t"
    out = rewrite_cast_naming(sql)
    assert " AS x" in out and "'2'::INT AS" not in out


def test_inline_random_ctes_reseeds_each_site():
    from glaredb_spark.functions.misc_binder import inline_random_ctes

    out = inline_random_ctes(
        "with rand_cte as (select random()) select a == b "
        "from rand_cte t1(a), rand_cte t2(b)"
    )
    assert "with" not in out.lower()
    import re

    seeds = re.findall(r"rand\((\d+)\)", out)
    assert len(seeds) == 2 and seeds[0] != seeds[1]


def test_inline_random_ctes_leaves_single_ref():
    from glaredb_spark.functions.misc_binder import inline_random_ctes

    sql = "with c as (select random()) select * from c"
    assert inline_random_ctes(sql) == sql


def test_inline_random_ctes_leaves_deterministic_cte():
    from glaredb_spark.functions.misc_binder import inline_random_ctes

    sql = "with c as (select 1) select * from c, c d"
    assert inline_random_ctes(sql) == sql


def test_array_comparison_null_greatest_rewrite():
    from glaredb_spark.functions.misc_binder import rewrite_array_comparisons

    out = rewrite_array_comparisons("SELECT array(NULL, 4) > array(4)")
    assert out.count("transform(") == 2 and "__e IS NULL" in out
    # equality untouched
    sql = "SELECT array(1) = array(1)"
    assert rewrite_array_comparisons(sql) == sql


def test_quantified_any_ops():
    from glaredb_spark.functions.misc_binder import rewrite_quantified

    out = rewrite_quantified("SELECT i = ANY(SELECT i FROM t WHERE i = a.i) FROM t a")
    assert "coalesce((i) IN (SELECT i FROM t WHERE i = a.i), false)" in out
    out = rewrite_quantified("SELECT i > ANY(SELECT i FROM t) FROM t")
    assert "min(__qv)" in out and out.endswith("FROM t")
    out = rewrite_quantified("SELECT i <= SOME(SELECT i FROM t) FROM t")
    assert "max(__qv)" in out and ", false)" in out


def test_quantified_all_ops():
    from glaredb_spark.functions.misc_binder import rewrite_quantified

    out = rewrite_quantified("SELECT i != ALL(SELECT i FROM t) FROM t")
    assert "NOT IN (SELECT i FROM t)" in out and ", true)" in out
    out = rewrite_quantified("SELECT i = ALL(SELECT i FROM t) FROM t")
    assert "min(__qv)" in out and "max(__qv)" in out and ", true)" in out
    out = rewrite_quantified("SELECT i > ALL(SELECT i FROM t) FROM t")
    assert "max(__qv)" in out


def test_quantified_skips_bool_aggregate_and_literals():
    from glaredb_spark.functions.misc_binder import rewrite_quantified

    for sql in (
        "SELECT any(flag) FROM t",
        "SELECT x = any(flag) FROM t GROUP BY x",
        "SELECT '= ANY(SELECT' AS s",
        "SELECT x FROM t UNION ALL (SELECT y FROM u)",
    ):
        assert rewrite_quantified(sql) == sql
