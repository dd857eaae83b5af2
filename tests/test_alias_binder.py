"""Unit tests for the alias pre-binders: partial alias-list padding,
CREATE VIEW partial column lists, scalar-subquery output naming."""

import pytest

from glaredb_spark.functions.alias_binder import (
    pad_partial_alias_lists,
    propagate_scalar_subquery_aliases,
)


def test_pad_derived_relation(spark):
    q = "SELECT b FROM (SELECT 1 AS a, 2) AS t(b)"
    padded = pad_partial_alias_lists(q, spark)
    assert [r["b"] for r in spark.sql(padded).collect()] == [1]


def test_pad_values_relation(spark):
    q = "SELECT * FROM (VALUES (1, 2.0, 3)) v(a, b)"
    padded = pad_partial_alias_lists(q, spark)
    cols = spark.sql(padded).columns
    assert cols[:2] == ["a", "b"] and len(cols) == 3


def test_full_arity_untouched(spark):
    q = "SELECT * FROM (VALUES (1, 2)) v(a, b)"
    assert pad_partial_alias_lists(q, spark) == q


def test_function_call_parens_untouched(spark):
    # table-function aliasing must not be mistaken for a derived relation
    q = "SELECT * FROM range(1, 5) AS r(id)"
    assert pad_partial_alias_lists(q, spark) == q


def test_create_view_padding(spark):
    q = "CREATE OR REPLACE TEMP VIEW abv(a, b) AS SELECT 3 AS a1, 4 AS b1, 5 AS c1"
    padded = pad_partial_alias_lists(q, spark)
    spark.sql(padded)
    assert spark.table("abv").columns == ["a", "b", "c1"]


def test_scalar_subquery_inner_alias_propagates(spark):
    q = "SELECT 4, (SELECT 'hello' AS my_alias WHERE false)"
    out = propagate_scalar_subquery_aliases(q, spark)
    assert spark.sql(out).columns[1] == "my_alias"


def test_scalar_subquery_bare_column_propagates(spark):
    q = "SELECT 4, (SELECT a FROM (VALUES ('x')) v(a) WHERE false)"
    out = propagate_scalar_subquery_aliases(q, spark)
    assert spark.sql(out).columns[1] == "a"


def test_scalar_subquery_explicit_alias_untouched(spark):
    q = "SELECT (SELECT 1 AS x) AS outer_name"
    # item already carries an alias -> not a bare subquery item, no change
    assert propagate_scalar_subquery_aliases(q, spark) == q


def test_expression_subquery_untouched(spark):
    q = "SELECT (SELECT max(a) FROM (VALUES (1)) v(a)) + 1 FROM (VALUES (0)) w(z)"
    assert propagate_scalar_subquery_aliases(q, spark) == q


def test_in_subquery_predicate_untouched(spark):
    q = "SELECT z FROM (VALUES (1)) w(z) WHERE z IN (SELECT a FROM (VALUES (1)) v(a))"
    assert propagate_scalar_subquery_aliases(q, spark) == q


def test_name_unaliased_values_gets_colN():
    from glaredb_spark.functions.alias_binder import name_unaliased_values

    out = name_unaliased_values(
        "SELECT * FROM (VALUES (1,2.0,3)) v(a,b), (VALUES (a + 3, b*2, c))"
    )
    assert "AS __values1(col1, col2, col3)" in out
    # the aliased relation is left alone
    assert "v(a,b) AS" not in out


def test_name_unaliased_values_skips_aliased():
    from glaredb_spark.functions.alias_binder import name_unaliased_values

    sql = "SELECT * FROM (VALUES (1,2)) t(a,b)"
    assert name_unaliased_values(sql) == sql


def test_dealias_inlines_last_duplicate():
    from glaredb_spark.functions.lateral_binder import dealias

    out = dealias("SELECT 1 AS a, 2 AS a, a + 3")
    assert out == "SELECT 1 AS a, 2 AS a, (2) + 3"


def test_dealias_untouched_when_unique():
    from glaredb_spark.functions.lateral_binder import dealias

    sql = "SELECT 1 AS a, a + 2"
    assert dealias(sql) == sql


def test_delateralize_aggregate_flattens(spark):
    from glaredb_spark.functions.lateral_binder import delateralize_aggregate

    spark.sql("DROP TABLE IF EXISTS _dla_t")
    spark.createDataFrame([(4,), (5,)], "i int").createOrReplaceTempView(
        "_dla_t"
    )
    out = delateralize_aggregate(
        "SELECT * FROM _dla_t, LATERAL (SELECT sum(_dla_t.i * i) "
        "FROM _dla_t AS t2) ORDER BY 1",
        spark,
    )
    assert "CROSS JOIN" in out and "GROUP BY" in out
    assert "t2.i" in out  # unqualified inner ref qualified
    rows = [tuple(r) for r in spark.sql(out).collect()]
    assert rows == [(4, 36), (5, 45)]


def test_delateralize_aggregate_no_from(spark):
    from glaredb_spark.functions.lateral_binder import delateralize_aggregate

    spark.createDataFrame([(4,), (5,)], "i int").createOrReplaceTempView(
        "_dla_t2"
    )
    out = delateralize_aggregate(
        "SELECT * FROM _dla_t2, LATERAL (SELECT sum(i)) ORDER BY i", spark
    )
    rows = [tuple(r) for r in spark.sql(out).collect()]
    assert rows == [(4, 4), (5, 5)]
