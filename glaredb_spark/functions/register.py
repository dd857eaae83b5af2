"""SQL-surface registration of reference-named functions.

GlareDB registers its function sets into a system catalog visible to SQL
(catalog/system.rs:42-58). The Spark analog: names Spark SQL already has
(most of SURVEY.md §2.3) pass through; names it lacks are registered as
Spark 4 SQL UDFs (pure SQL expression bodies → fully codegen'd, zero Python
in the execution path) — plus two pandas UDFs (gcd/lcm) where SQL can't
express the loop.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, body) — pure-SQL temporary functions
_SQL_UDFS: dict[str, tuple[str, str]] = {
    # similarity (reference similarity/l2_distance.rs); scaled-integer
    # deterministic kernels — SAME round(x*y*1e12)→BIGINT sum as
    # glaredb_spark.functions.vector, so fn['l2_distance'] and the SQL name
    # return bit-identical values (asserted in tests/test_functions.py).
    "l2_distance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "sqrt(CAST(aggregate(zip_with(a, b,"
        " (x, y) -> CAST(round((x - y) * (x - y) * 1e12) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / 1e12)",
    ),
    # reference alias (l2_distance.rs: aliases &["array_distance"])
    "array_distance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "l2_distance(a, b)",
    ),
    "dot_product": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "CAST(aggregate(zip_with(a, b,"
        " (x, y) -> CAST(round(x * y * 1e12) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / 1e12",
    ),
    "cosine_similarity": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "(CAST(aggregate(zip_with(a, b,"
        " (x, y) -> CAST(round(x * y * 1e12) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / 1e12)"
        " / (sqrt(CAST(aggregate(transform(a,"
        " x -> CAST(round(x * x * 1e12) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / 1e12)"
        " * sqrt(CAST(aggregate(transform(b,"
        " x -> CAST(round(x * x * 1e12) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / 1e12))",
    ),
    # datetime (reference datetime/epoch.rs: unix seconds/millis -> TIMESTAMP;
    # direction verified against slt/standard/functions/scalar/datetime/epoch.slt)
    "epoch": (
        "(s BIGINT) RETURNS TIMESTAMP",
        "timestamp_seconds(s)",
    ),
    "epoch_s": (
        "(s BIGINT) RETURNS TIMESTAMP",
        "timestamp_seconds(s)",
    ),
    "epoch_ms": (
        "(ms BIGINT) RETURNS TIMESTAMP",
        "timestamp_millis(ms)",
    ),
    # string (reference string/strpos.rs, byte_length.rs)
    "strpos": ("(s STRING, sub STRING) RETURNS INT", "instr(s, sub)"),
    "byte_length": ("(s STRING) RETURNS INT", "octet_length(s)"),
    # list (reference list/list_extract.rs — 1-indexed, NULL out of bounds
    # per slt list_extract.slt; try_element_at matches under ANSI mode)
    "list_extract": (
        "(arr ARRAY<DOUBLE>, i INT) RETURNS DOUBLE",
        "try_element_at(arr, i)",
    ),
    # numeric (reference numeric/isfinite.rs)
    "isfinite": (
        "(x DOUBLE) RETURNS BOOLEAN",
        "NOT (isnan(x) OR abs(x) = double('inf'))",
    ),
    "isinf": ("(x DOUBLE) RETURNS BOOLEAN", "abs(x) = double('inf')"),
    # string predicates under reference names (string/{starts,ends}_with.rs)
    "ends_with": (
        "(s STRING, suffix STRING) RETURNS BOOLEAN",
        "endswith(s, suffix)",
    ),
    "starts_with": (
        "(s STRING, prefix STRING) RETURNS BOOLEAN",
        "startswith(s, prefix)",
    ),
    # Postgres-semantics left/right (reference string/{left,right}.rs):
    # negative n drops |n| chars from the other end; Spark's builtins
    # return empty for negative n. The slt runner maps left(/right( here.
    "pg_left": (
        "(s STRING, n INT) RETURNS STRING",
        "CASE WHEN n >= 0 THEN left(s, n) "
        "ELSE substr(s, 1, greatest(length(s) + n, 0)) END",
    ),
    "pg_right": (
        "(s STRING, n INT) RETURNS STRING",
        "CASE WHEN n >= 0 THEN right(s, n) ELSE substr(s, 1 - n) END",
    ),
    # short aliases (reference FunctionSet: prefix/suffix,
    # starts_with.rs:21 / ends_with.rs:21)
    "prefix": (
        "(s STRING, p STRING) RETURNS BOOLEAN",
        "startswith(s, p)",
    ),
    "suffix": (
        "(s STRING, p STRING) RETURNS BOOLEAN",
        "endswith(s, p)",
    ),
    # is-checks under reference names (is.rs; NULL-safe booleans per
    # slt/standard/functions/scalar/is_bool.slt: NULL is neither)
    "is_true": ("(x BOOLEAN) RETURNS BOOLEAN", "coalesce(x = true, false)"),
    "is_false": ("(x BOOLEAN) RETURNS BOOLEAN", "coalesce(x = false, false)"),
    "is_not_true": (
        "(x BOOLEAN) RETURNS BOOLEAN",
        "NOT coalesce(x = true, false)",
    ),
    "is_not_false": (
        "(x BOOLEAN) RETURNS BOOLEAN",
        "NOT coalesce(x = false, false)",
    ),
    "is_null": ("(x STRING) RETURNS BOOLEAN", "x IS NULL"),
    "is_not_null": ("(x STRING) RETURNS BOOLEAN", "x IS NOT NULL"),
    # bit shifts + xor (binary.rs) — BIGINT domain
    "shl": ("(x BIGINT, n INT) RETURNS BIGINT", "shiftleft(x, n)"),
    "shr": ("(x BIGINT, n INT) RETURNS BIGINT", "shiftright(x, n)"),
    "xor": ("(a BIGINT, b BIGINT) RETURNS BIGINT", "a ^ b"),
    # null-safe comparison as functions (comparison.rs IS [NOT] DISTINCT
    # FROM; STRING params make them type-generic via implicit casts)
    "is_distinct_from": (
        "(a STRING, b STRING) RETURNS BOOLEAN",
        "NOT (a <=> b)",
    ),
    "is_not_distinct_from": (
        "(a STRING, b STRING) RETURNS BOOLEAN",
        "a <=> b",
    ),
    # reference sign(): NaN and -0.0 both sign to 0 (sign.slt); Spark's
    # signum propagates NaN and negative zero
    "pg_sign": (
        "(x DOUBLE) RETURNS DOUBLE",
        "CASE WHEN isnan(x) THEN 0.0d ELSE signum(x) + 0.0d END",
    ),
    # reference trunc(): single-arg truncate toward zero (trunc.slt);
    # Spark's trunc is date-only
    "pg_trunc": (
        "(x DOUBLE) RETURNS DOUBLE",
        "CASE WHEN x >= 0 THEN floor(x) ELSE ceil(x) END",
    ),
    # reference split_part: index 0 yields '' (string_split_part.slt);
    # Spark raises INVALID_INDEX_OF_ZERO
    "pg_split_part": (
        "(s STRING, d STRING, n INT) RETURNS STRING",
        "CASE WHEN n = 0 THEN '' ELSE split_part(s, d, n) END",
    ),
}


def register_all(spark: SparkSession) -> None:
    """Register the GlareDB-name SQL surface into this session."""
    for name, (sig, body) in _SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig.split(' RETURNS')[0]} "
            f"RETURNS{sig.split(' RETURNS')[1]} RETURN {body}"
        )
    # slow-path pandas UDFs (no SQL-expressible form)
    from glaredb_spark.functions.scalar import gcd_udf, lcm_udf

    spark.udf.register("gcd", gcd_udf())
    spark.udf.register("lcm", lcm_udf())
    from glaredb_spark.functions.scalar import (
        pg_initcap_udf,
        pg_regexp_replace_udf,
    )

    spark.udf.register("pg_regexp_replace", pg_regexp_replace_udf())
    spark.udf.register("pg_initcap", pg_initcap_udf())
