"""Scalar/aggregate function conformance batteries.

Covers the reference's scalar registry (SURVEY.md §2.3 —
functions/scalar/builtin/{string,numeric,datetime}/) and aggregate registry
(§2.4 — functions/aggregate/builtin/) through oracle-checked batteries.

Transcendentals (exp/log2/cbrt/…) differ from DuckDB by 1 ulp on some
inputs (different libm) — they are exercised in the rows-only battery
``fn_native_approx`` instead of an oracle battery. Statistical aggregates
(stddev/var/corr) are oracle-checked via exact-decimal closed-form sums,
and natively in the rows-only battery.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

D = "decimal(15,2)"


# ---------------------------------------------------------------------------
# string battery (reference: functions/scalar/builtin/string/*.rs)
# ---------------------------------------------------------------------------
@register_query(
    "fn_string_battery",
    oracle="""
SELECT doc_id,
       upper(lang) AS u, lower(source) AS lo,
       substring(text, 3, 10) AS sub,
       lpad(lang, 6, '*') AS lp, rpad(lang, 6, '#') AS rp,
       replace(substring(text, 1, 30), 'a', '@') AS rep,
       reverse(lang) AS rev, repeat(lang, 3) AS rpt,
       split_part(text, ' ', 2) AS sp2,
       CAST(strpos(text, 'data') AS BIGINT) AS pos_data,
       translate(lang, 'en', 'xy') AS tr,
       CAST(ascii(lang) AS BIGINT) AS asc1,
       CAST(length(text) AS BIGINT) AS len,
       left(text, 5) AS l5, right(text, 5) AS r5,
       starts_with(text, 'key') AS sw, ends_with(text, 'value') AS ew,
       contains(text, 'table') AS ct,
       substr(md5(text), 1, 8) AS md5p,
       concat(lang, ':', source) AS cc,
       trim('  pad  ') AS tm, ltrim('  pad  ') AS ltm, rtrim('  pad  ') AS rtm
FROM documents WHERE doc_id < 100
ORDER BY doc_id
""",
)
def fn_string_battery(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 100
    )
    return docs.select(
        "doc_id",
        F.upper("lang").alias("u"),
        F.lower("source").alias("lo"),
        F.substring("text", 3, 10).alias("sub"),
        F.lpad("lang", 6, "*").alias("lp"),
        F.rpad("lang", 6, "#").alias("rp"),
        F.replace(F.substring("text", 1, 30), F.lit("a"), F.lit("@")).alias("rep"),
        F.reverse("lang").alias("rev"),
        F.repeat("lang", 3).alias("rpt"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("sp2"),
        F.instr("text", "data").cast("long").alias("pos_data"),
        F.translate("lang", "en", "xy").alias("tr"),
        F.ascii("lang").cast("long").alias("asc1"),
        F.length("text").cast("long").alias("len"),
        F.substring("text", 1, 5).alias("l5"),
        F.substr(F.col("text"), F.length("text") - 4, F.lit(5)).alias("r5"),
        F.startswith(F.col("text"), F.lit("key")).alias("sw"),
        F.endswith(F.col("text"), F.lit("value")).alias("ew"),
        F.contains(F.col("text"), F.lit("table")).alias("ct"),
        F.substring(F.md5("text"), 1, 8).alias("md5p"),
        F.concat("lang", F.lit(":"), "source").alias("cc"),
        F.trim(F.lit("  pad  ")).alias("tm"),
        F.ltrim(F.lit("  pad  ")).alias("ltm"),
        F.rtrim(F.lit("  pad  ")).alias("rtm"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# numeric battery — exact-safe subset (abs/ceil/floor/sign/sqrt/mod/
# greatest/least/factorial; reference: functions/scalar/builtin/numeric/)
# ---------------------------------------------------------------------------
@register_query(
    "fn_math_battery",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS a,
       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ce,
       CAST(floor(l_quantity / 7.0) AS BIGINT) AS fl,
       CAST(sign(l_discount - 0.05) AS BIGINT) AS sg,
       sqrt(l_quantity) AS sq,
       CAST(l_orderkey % 7 AS BIGINT) AS md,
       greatest(l_quantity, l_discount * 100) AS gr,
       least(l_quantity, l_discount * 100) AS le,
       CAST(factorial(l_linenumber) AS BIGINT) AS fact,
       power(CAST(l_linenumber AS DOUBLE), 2.0) AS pw
FROM lineitem WHERE l_orderkey < 500
ORDER BY l_orderkey, l_linenumber
""",
)
def fn_math_battery(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"].filter(
        F.col("l_orderkey") < 500
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("a"),
        F.ceil(F.col("l_quantity") / 7.0).cast("long").alias("ce"),
        F.floor(F.col("l_quantity") / 7.0).cast("long").alias("fl"),
        # DuckDB sign() is TINYINT, F.signum is DOUBLE: the driver value-hash
        # formats -1 vs -1.0 differently. Values are exactly -1/0/1 → cast
        # both sides to BIGINT (reference: numeric/sign.rs returns int sign).
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("sg"),
        F.sqrt("l_quantity").alias("sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("md"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("gr"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("le"),
        F.factorial("l_linenumber").cast("long").alias("fact"),
        F.power(F.col("l_linenumber").cast("double"), F.lit(2.0)).alias("pw"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# decimal arithmetic battery (reference: dedicated decimal kernels
# arith/decimal_arith.rs + decimal_sigs.rs — precision/scale result rules).
#
# Discipline (see tpch.py header + memory notes): inputs cast to
# DECIMAL(15,2) on BOTH engines; every intermediate stays in exact decimal
# via explicit upcasts (upcasts never round); only the final value goes to
# DOUBLE/BIGINT (all unscaled values << 2^53, so the conversion is exact on
# both engines). Decimal→int goes through floor/ceil explicitly — Spark
# truncates bare casts where DuckDB rounds.
# ---------------------------------------------------------------------------
_DP = "CAST(l_extendedprice AS DECIMAL(15,2))"
_DD = "CAST(l_discount AS DECIMAL(15,2))"
_DT = "CAST(l_tax AS DECIMAL(15,2))"


@register_query(
    "fn_decimal_battery",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       CAST(CAST({_DP} + {_DT} AS DECIMAL(16,2)) AS DOUBLE) AS add_pt,
       CAST(CAST({_DP} - {_DD} AS DECIMAL(16,2)) AS DOUBLE) AS sub_pd,
       CAST(CAST({_DP} * {_DD} AS DECIMAL(31,4)) AS DOUBLE) AS mul_pd,
       CAST(-{_DP} AS DOUBLE) AS neg_p,
       CAST(abs({_DD} - CAST(0.05 AS DECIMAL(15,2))) AS DOUBLE) AS abs_d,
       CAST(round({_DP}, 1) AS DOUBLE) AS rnd1,
       CAST(round({_DP}, 0) AS DOUBLE) AS rnd0,
       CAST(floor({_DP}) AS BIGINT) AS fl_p,
       CAST(ceil({_DP}) AS BIGINT) AS ce_p,
       CAST(CAST({_DP} AS DECIMAL(20,4)) AS DOUBLE) AS up_p,
       CAST({_DP} AS VARCHAR) AS str_p,
       ({_DP} > {_DT} * 1000) AS gt_pt
FROM lineitem WHERE l_orderkey < 400
ORDER BY l_orderkey, l_linenumber
""",
)
def fn_decimal_battery(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"].filter(
        F.col("l_orderkey") < 400
    )
    p = F.col("l_extendedprice").cast("decimal(15,2)")
    d = F.col("l_discount").cast("decimal(15,2)")
    t = F.col("l_tax").cast("decimal(15,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (p + t).cast("decimal(16,2)").cast("double").alias("add_pt"),
        (p - d).cast("decimal(16,2)").cast("double").alias("sub_pd"),
        (p * d).cast("decimal(31,4)").cast("double").alias("mul_pd"),
        (-p).cast("double").alias("neg_p"),
        F.abs(d - F.lit(0.05).cast("decimal(15,2)")).cast("double").alias("abs_d"),
        F.round(p, 1).cast("double").alias("rnd1"),
        F.round(p, 0).cast("double").alias("rnd0"),
        F.floor(p).cast("long").alias("fl_p"),
        F.ceil(p).cast("long").alias("ce_p"),
        p.cast("decimal(20,4)").cast("double").alias("up_p"),
        p.cast("string").alias("str_p"),
        (p > t * 1000).alias("gt_pt"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# datetime battery (reference: functions/scalar/builtin/datetime/)
# ---------------------------------------------------------------------------
@register_query(
    "fn_datetime_battery",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
       CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT) AS doy,
       CAST(EXTRACT(isodow FROM o_orderdate) AS BIGINT) AS idow,
       date_trunc('month', o_orderdate) AS mstart,
       date_trunc('year', o_orderdate) AS ystart,
       o_orderdate + INTERVAL '7 days' AS plus7,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
            AS BIGINT) AS days_since,
       CAST(epoch(o_orderdate) AS BIGINT) AS ep,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom
FROM orders WHERE o_orderkey < 500
ORDER BY o_orderkey
""",
)
def fn_datetime_battery(spark, sf_dir):
    ords = load_tables(spark, sf_dir, "orders")["orders"].filter(
        F.col("o_orderkey") < 500
    )
    return ords.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("idow"),
        F.date_trunc("month", "o_orderdate").alias("mstart"),
        F.date_trunc("year", "o_orderdate").alias("ystart"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 days")).alias("plus7"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
        )
        .cast("long")
        .alias("days_since"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).cast("long").alias("ep"),
        F.col("o_orderdate").cast("date").cast("timestamp_ntz").alias("day_start"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp_ntz").alias("eom"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# exact aggregate battery (reference: functions/aggregate/builtin/ —
# min/max/count/bool_and/bool_or/bit_and/bit_or/string_agg/first)
# ---------------------------------------------------------------------------
@register_query(
    "fn_agg_exact",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q,
       MIN(l_shipdate) AS min_d, MAX(l_shipdate) AS max_d,
       bool_and(l_quantity > 0) AS all_pos,
       bool_or(l_discount > 0.09) AS any_high_disc,
       CAST(bit_and(l_orderkey) AS BIGINT) AS band,
       CAST(bit_or(l_orderkey) AS BIGINT) AS bor,
       array_to_string(list_sort(list_distinct(list(l_linestatus))), ',')
         AS statuses
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def fn_agg_exact(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("min_q"),
            F.max("l_quantity").alias("max_q"),
            F.min("l_shipdate").alias("min_d"),
            F.max("l_shipdate").alias("max_d"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_high_disc"),
            F.bit_and("l_orderkey").cast("long").alias("band"),
            F.bit_or("l_orderkey").cast("long").alias("bor"),
            F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
                "statuses"
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# exact percentiles (the reference ships approx_quantile/t-digest, covered
# rows-only in fn_native_approx; the EXACT form is bit-comparable — Spark
# percentile() and DuckDB quantile_cont() use the same linear interpolation
# (1-f)*lo + f*hi, verified identical on the fixture)
# ---------------------------------------------------------------------------
@register_query(
    "fn_percentile_battery",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5) AS med_q,
       quantile_cont(l_quantity, 0.9) AS q90,
       quantile_cont(l_extendedprice, 0.5) AS med_price,
       quantile_cont(l_extendedprice, 0.99) AS p99_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def fn_percentile_battery(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("med_q"),
            F.percentile("l_quantity", F.lit(0.9)).alias("q90"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("med_price"),
            F.percentile("l_extendedprice", F.lit(0.99)).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# statistical aggregates via exact-decimal closed forms (stddev/var/corr —
# reference: functions/aggregate/builtin/{stddev,variance,corr,covar}.rs)
# ---------------------------------------------------------------------------
# moments use (l_quantity, l_discount): bounded values keep every decimal
# sum's unscaled magnitude far below 2^53, where decimal→double casts are
# cross-engine exact (DuckDB's int128→double path double-rounds above that;
# quantizing down instead is unsafe — DuckDB truncates decimal downcasts
# while Spark rounds HALF_UP)
_O_SX = "CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE)"
_O_SY = "CAST(SUM(CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE)"
_O_SXX = (
    "CAST(SUM(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2)))"
    " AS DOUBLE)"
)
_O_SYY = (
    "CAST(SUM(CAST(l_discount AS DECIMAL(15,2)) *"
    " CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE)"
)
_O_SXY = (
    "CAST(SUM(CAST(l_quantity AS DECIMAL(15,2)) *"
    " CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE)"
)


@register_query(
    "fn_agg_stats_exact",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n,
       ({_O_SXX} - {_O_SX} * {_O_SX} / COUNT(*)) / (COUNT(*) - 1) AS var_samp_qty,
       sqrt(({_O_SXX} - {_O_SX} * {_O_SX} / COUNT(*)) / (COUNT(*) - 1))
         AS stddev_samp_qty,
       ({_O_SXY} - {_O_SX} * {_O_SY} / COUNT(*)) / (COUNT(*) - 1) AS covar_samp,
       (COUNT(*) * {_O_SXY} - {_O_SX} * {_O_SY})
         / (sqrt(COUNT(*) * {_O_SXX} - {_O_SX} * {_O_SX})
            * sqrt(COUNT(*) * {_O_SYY} - {_O_SY} * {_O_SY})) AS corr_qty_disc
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def fn_agg_stats_exact(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    x = F.col("l_quantity").cast(D)
    y = F.col("l_discount").cast(D)
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sx, sy, sxx, syy, sxy = (F.col(c) for c in ["sx", "sy", "sxx", "syy", "sxy"])
    return agg.select(
        "l_returnflag",
        "n",
        ((sxx - sx * sx / n) / (n - 1)).alias("var_samp_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_samp_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_samp"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_disc"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# list/struct battery (reference: functions/scalar/builtin/list/ —
# list_extract is 1-INDEXED (list_extract.rs), list_value constructor;
# struct_funcs.rs struct_pack/struct_extract). Spark: element_at is also
# 1-indexed with negative-from-end, matching the reference and DuckDB
# bracket indexing. Outputs are extracted back to scalars so the gate
# compares plain columns (no array/struct-typed output normalization).
# ---------------------------------------------------------------------------
@register_query(
    "fn_list_struct_battery",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS t
  FROM documents WHERE doc_id < 100)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tok,
       t[1] AS first_tok,
       t[-1] AS last_tok,
       t[3] AS third_tok,
       list_sort(t)[1] AS min_tok,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
       list_contains(t, 'table') AS has_table,
       CAST(list_position(t, 'value') AS BIGINT) AS pos_value,
       array_to_string(t[1:5], '-') AS head5,
       array_to_string(list_reverse_sort(list_distinct(t))[1:2], '|') AS top2,
       struct_pack(lang := lang, n := len(t)).lang AS s_lang,
       CAST(struct_pack(lang := lang, n := len(t)).n AS BIGINT) AS s_n,
       [lang, source][2] AS lv2
FROM tok
ORDER BY doc_id
""",
)
def fn_list_struct_battery(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id") < 100
    )
    tok = docs.select("doc_id", "lang", "source", F.split("text", " ").alias("t"))
    packed = F.struct(F.col("lang"), F.size("t").alias("n"))
    return tok.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tok"),
        F.element_at("t", 1).alias("first_tok"),
        F.element_at("t", -1).alias("last_tok"),
        F.element_at("t", 3).alias("third_tok"),
        F.element_at(F.array_sort("t"), 1).alias("min_tok"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
        F.array_contains("t", "table").alias("has_table"),
        F.array_position("t", "value").cast("long").alias("pos_value"),
        F.array_join(F.slice("t", 1, 5), "-").alias("head5"),
        F.array_join(
            F.slice(F.reverse(F.array_sort(F.array_distinct("t"))), 1, 2), "|"
        ).alias("top2"),
        packed.getField("lang").alias("s_lang"),
        packed.getField("n").cast("long").alias("s_n"),
        F.element_at(F.array("lang", "source"), 2).alias("lv2"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# native approximate / transcendental battery — rows-only (no oracle):
# approx_count_distinct (HLL — reference statistics/hll.rs),
# percentile_approx (t-digest — reference statistics/tdigest.rs),
# native stddev/corr, exp/ln/log2/cbrt/trig (libm 1-ulp divergence)
# ---------------------------------------------------------------------------
@register_query("fn_native_approx")  # no oracle: approx + libm variance
def fn_native_approx(spark, sf_dir):
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_nd_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.stddev_samp("l_quantity").alias("stddev_native"),
        F.corr("l_quantity", "l_extendedprice").alias("corr_native"),
        F.avg(F.exp(F.col("l_discount"))).alias("avg_exp_disc"),
        F.avg(F.log(F.col("l_extendedprice"))).alias("avg_ln_price"),
        F.avg(F.cbrt(F.col("l_quantity"))).alias("avg_cbrt_qty"),
        F.avg(F.sin(F.col("l_tax"))).alias("avg_sin_tax"),
    ).orderBy("l_returnflag")
