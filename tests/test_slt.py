"""The reference's OWN sqllogictest files, executed against the Spark
engine (glaredb_spark/slt.py) — switch-over evidence at the test-script
level. The allowlist holds every file under /root/reference/slt/standard
(plus csv/ and parquet/ format suites) that runs clean through the documented dialect rewrites (177 files at
curation time); files outside it use reference-internal surfaces
(f16/unsigned types, function chaining, DESCRIBE shapes, Rust-regex
semantics) and are intentionally excluded rather than weakened.

Run serially in one session (scripts create/drop tables).
"""

import os

import pytest

REF_SLT = "/root/reference/slt"

ALLOWLIST = ['csv/glob_different_num_columns.slt', 'csv/infer/all_null.slt', 'csv/infer/dup_header_name.slt', 'csv/infer/empty_first_line.slt', 'csv/infer/empty_header_names.slt', 'csv/infer/empty_middle_line.slt', 'csv/infer/escaped_quotes.slt', 'csv/infer/infer_string_lit_as_int.slt', 'csv/infer/mixed_type_pipe_delim.slt', 'csv/infer/semicolon_delim.slt', 'csv/infer/special_float_values.slt', 'csv/infer/tab_delim.slt', 'csv/infer/whitespace_handling.slt', 'csv/read_tsv.slt', 'csv/simple.slt', 'csv/tpch_small/nation.slt', 'parquet/capital_column_names.slt', 'parquet/file_infer.slt', 'parquet/read_parquet_local.slt', 'parquet/small_batch_size.slt', 'standard/aggregates/basic.slt', 'standard/aggregates/distinct_grouped.slt', 'standard/aggregates/distinct_grouped_many_groups.slt', 'standard/aggregates/distinct_ungrouped.slt', 'standard/aggregates/group_by_alias.slt', 'standard/aggregates/group_by_cube.slt', 'standard/aggregates/group_by_duplicated.slt', 'standard/aggregates/group_by_errors.slt', 'standard/aggregates/group_by_expr.slt', 'standard/aggregates/group_by_many.slt', 'standard/aggregates/group_by_multiple_cols.slt', 'standard/aggregates/group_by_no_aggregates.slt', 'standard/aggregates/group_by_order_by.slt', 'standard/aggregates/group_by_ordinal.slt', 'standard/aggregates/group_by_string.slt', 'standard/aggregates/having.slt', 'standard/cast/binary.slt', 'standard/cast/cast_overflow.slt', 'standard/cast/implicit_cast_int_lit.slt', 'standard/cast/implicit_cast_scalar_agg.slt', 'standard/cast/implicit_cast_string_lit.slt', 'standard/cast/nested_casts.slt', 'standard/cast/string_cast.slt', 'standard/comments.slt', 'standard/create_table/drop_table.slt', 'standard/create_table/temp_table.slt', 'standard/cte/cte.slt', 'standard/cte/insert_cte.slt', 'standard/discard.slt', 'standard/equality_join.slt', 'standard/filter/constant.slt', 'standard/filter/duplicate_conditions.slt', 'standard/functions/aggregate/approx_count_distinct.slt', 'standard/functions/aggregate/approx_quantile.slt', 'standard/functions/aggregate/avg.slt', 'standard/functions/aggregate/bit_and.slt', 'standard/functions/aggregate/bit_or.slt', 'standard/functions/aggregate/bool_and.slt', 'standard/functions/aggregate/bool_or.slt', 'standard/functions/aggregate/corr.slt', 'standard/functions/aggregate/count.slt', 'standard/functions/aggregate/count_star.slt', 'standard/functions/aggregate/covar.slt', 'standard/functions/aggregate/first_last.slt', 'standard/functions/aggregate/minmax.slt', 'standard/functions/aggregate/regr_avg.slt', 'standard/functions/aggregate/regr_count.slt', 'standard/functions/aggregate/regr_r2.slt', 'standard/functions/aggregate/regr_slope.slt', 'standard/functions/aggregate/stddev.slt', 'standard/functions/aggregate/string_agg.slt', 'standard/functions/aggregate/sum.slt', 'standard/functions/aggregate/sum_decimal.slt', 'standard/functions/scalar/arith.slt', 'standard/functions/operators/bit_and_or_not.slt', 'standard/functions/operators/case.slt', 'standard/functions/operators/case_short_circuit.slt', 'standard/functions/operators/in.slt', 'standard/functions/scalar/binary/shr.slt', 'standard/functions/scalar/ceil.slt', 'standard/functions/scalar/coalesce.slt', 'standard/functions/scalar/comparison.slt', 'standard/functions/scalar/contains.slt', 'standard/functions/scalar/date_comparison.slt', 'standard/functions/scalar/datetime/date_part.slt', 'standard/functions/scalar/datetime/date_trunc.slt', 'standard/functions/scalar/datetime/epoch.slt', 'standard/functions/scalar/datetime/extract.slt', 'standard/functions/scalar/decimal_arith.slt', 'standard/functions/scalar/decimal_arith_add.slt', 'standard/functions/scalar/decimal_arith_mul.slt', 'standard/functions/scalar/decimal_arith_sub.slt', 'standard/functions/scalar/decimal_comparison.slt', 'standard/functions/scalar/ends_with.slt', 'standard/functions/scalar/floor.slt', 'standard/functions/scalar/gcd.slt', 'standard/functions/scalar/is_bool.slt', 'standard/functions/scalar/is_distinct_from.slt', 'standard/functions/scalar/is_not_distinct_from.slt', 'standard/functions/scalar/is_null.slt', 'standard/functions/scalar/isfinite.slt', 'standard/functions/scalar/isinf.slt', 'standard/functions/scalar/l2_distance.slt', 'standard/functions/scalar/lcm.slt', 'standard/functions/scalar/like.slt', 'standard/functions/scalar/negate.slt', 'standard/functions/scalar/not.slt', 'standard/functions/scalar/pi.slt', 'standard/functions/scalar/round.slt', 'standard/functions/scalar/string/ascii.slt', 'standard/functions/scalar/string/length.slt', 'standard/functions/scalar/string/lower.slt', 'standard/functions/scalar/string/lpad.slt', 'standard/functions/scalar/string/position.slt', 'standard/functions/scalar/string/regexp_like.slt', 'standard/functions/scalar/string/repeat.slt', 'standard/functions/scalar/string/replace.slt', 'standard/functions/scalar/string/reverse.slt', 'standard/functions/scalar/string/rpad.slt', 'standard/functions/scalar/string/string_concat.slt', 'standard/functions/scalar/string/strpos.slt', 'standard/functions/scalar/string/substring.slt', 'standard/functions/scalar/string/translate.slt', 'standard/functions/scalar/string/upper.slt', 'standard/functions/scalar/trigonometric.slt', 'standard/functions/star_is_special.slt', 'standard/functions/string/md5.slt', 'standard/functions/table/list_database.slt', 'standard/functions/table/list_functions.slt', 'standard/functions/table/list_tables.slt', 'standard/functions/table/list_views.slt', 'standard/ident/case_sensitivity.slt', 'standard/ident/case_sensitivity_alias.slt', 'standard/ident/leading_underscore.slt', 'standard/insert/insert_count.slt', 'standard/insert/insert_invalid.slt', 'standard/insert/insert_parallel.slt', 'standard/join/cross_join.slt', 'standard/join/inner_join.slt', 'standard/join/inner_join_eq_neq.slt', 'standard/join/inner_join_using.slt', 'standard/join/join_empty.slt', 'standard/join/left_join_with_right_filter.slt', 'standard/join/left_outer.slt', 'standard/join/left_outer_using.slt', 'standard/join/natural_join.slt', 'standard/join/right_outer.slt', 'standard/join/right_outer_using.slt', 'standard/join/semi_join.slt', 'standard/join/where_or_condition.slt', 'standard/limit/basic.slt', 'standard/limit/global_limit.slt', 'standard/limit/limit_union.slt', 'standard/optimizer/column_pruning_no_table_projections.slt', 'standard/optimizer/cse.slt', 'standard/optimizer/filter_pushdown_nested_cross_join.slt', 'standard/order/basic.slt', 'standard/order/order_by_alias.slt', 'standard/order/order_by_large.slt', 'standard/order/order_by_many.slt', 'standard/order/order_by_noninline_data.slt', 'standard/order/order_by_nulls.slt', 'standard/order/order_by_ordinal.slt', 'standard/order/order_by_strings.slt', 'standard/order/order_group.slt', 'standard/parallelism/arbitrary_values.slt', 'standard/select/from_missing.slt', 'standard/select/from_values_no_parens.slt', 'standard/setops/union_distinct.slt', 'standard/subqueries/correlated_exists.slt', 'standard/subqueries/correlated_in.slt', 'standard/subqueries/correlated_set_semantics.slt', 'standard/subqueries/correlated_subquery.slt', 'standard/subqueries/from_subquery.slt', 'standard/subqueries/from_table_subquery.slt', 'standard/subqueries/in.slt', 'standard/subqueries/neumann.slt', 'standard/subqueries/scalar/count_subquery.slt', 'standard/subqueries/scalar/scalar_exists.slt', 'standard/time/date_arith.slt', 'standard/time/date_cmp.slt', 'standard/values/implicit_cast.slt', 'standard/values/num_columns.slt', 'standard/vars/reset.slt', 'standard/vars/set_batch_size.slt', 'standard/vars/set_var.slt', 'standard/vars/verify_optimized_plan.slt']

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SLT), reason="reference slt tree not present"
)


@pytest.fixture(scope="module")
def sess(spark):
    from glaredb_spark import GlareSession
    from glaredb_spark.functions.register import register_all

    register_all(spark)
    return GlareSession(spark)


@pytest.mark.parametrize("rel", ALLOWLIST)
def test_reference_slt(sess, rel):
    from glaredb_spark.slt import run_slt_file

    res = run_slt_file(sess, os.path.join(REF_SLT, rel))
    assert not res.failures, res.failures[:3]
    assert res.ok > 0


def test_order_by_rewrite_units():
    from glaredb_spark.slt import rewrite_sql

    assert (
        rewrite_sql("SELECT a FROM t ORDER BY a")
        == "SELECT a FROM t ORDER BY a NULLS LAST "
    )
    out = rewrite_sql("SELECT a FROM t ORDER BY a DESC LIMIT 2")
    assert "a DESC NULLS FIRST" in out and "LIMIT 2" in out
    out = rewrite_sql("SELECT * FROM (SELECT a FROM t ORDER BY a) ORDER BY 1 DESC")
    assert out.count("NULLS") == 2
