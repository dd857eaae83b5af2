"""ClickBench-shape wide-scan aggregation battery (VERDICT r1 'Next round'
#6) — the reference carries the full ClickBench suite
(bench/clickbench/single/q00..q42 over the 105-column `hits` table); these
adapt its distinct stress shapes to the events/documents fixtures:

- q01/q02 shape  -> cb_filter_agg          (filtered scan, global aggs)
- q08/q13 shape  -> cb_groupby_highcard    (high-cardinality group + distinct)
- q10 shape      -> cb_groupby_distinct_topk (group + count-distinct top-k)
- q20/q21 shape  -> cb_like_topk           (LIKE filter + group top-k)
- q28 shape      -> cb_regexp_domain_agg   (regexp extract + HAVING)
- q29 shape      -> cb_sum_expr_battery    (many parallel sum expressions)
- q30 shape      -> cb_multikey_group      (two-key group, mixed aggs)
- q40 shape      -> cb_filtered_daily_topk (selective filter + LIMIT/OFFSET)
- q26 shape      -> cb_quantile_battery     (per-group exact percentiles)
- q05/q35 shape  -> cb_hourly_uniques       (time-bucketed count-distinct)

Scale notes: every query is a single scan -> (optional filter, all pushed
to parquet) -> one partial+final aggregation -> top-k
(TakeOrderedAndProject). No joins, no Python; count-distincts expand to the
standard two-level aggregate. Sums over DOUBLE go through DECIMAL(15,2)
(exact, associative — partition-order-invariant, see MEMORY notes); all
ORDER BY ... LIMIT have full tiebreakers so top-k is unique.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

D = "decimal(15,2)"
O_VAL = "CAST(value AS DECIMAL(15,2))"


def _ev(spark, sf_dir):
    return load_tables(spark, sf_dir, "events")["events"]


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, "documents")["documents"]


@register_query(
    "cb_filter_agg",
    oracle=f"""
SELECT COUNT(*) AS n,
       CAST(SUM({O_VAL}) AS DOUBLE) AS sum_value,
       CAST(SUM({O_VAL}) / COUNT(*) AS DOUBLE) AS avg_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events WHERE event_type <> 'error'
""",
)
def cb_filter_agg(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    dec = F.sum(F.col("value").cast(D))
    return ev.filter(F.col("event_type") != "error").agg(
        F.count(F.lit(1)).alias("n"),
        dec.cast("double").alias("sum_value"),
        (dec / F.count(F.lit(1))).cast("double").alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register_query(
    "cb_groupby_highcard",
    oracle="""
SELECT user_id, COUNT(*) AS c, COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10
""",
    cache_plan=True,
)
def cb_groupby_highcard(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy(F.col("c").desc(), "user_id")
        .limit(10)
    )


@register_query(
    "cb_groupby_distinct_topk",
    oracle="""
SELECT lang, COUNT(DISTINCT source) AS n_sources, COUNT(*) AS c
FROM documents WHERE lang <> ''
GROUP BY lang ORDER BY n_sources DESC, c DESC, lang LIMIT 10
""",
)
def cb_groupby_distinct_topk(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.filter(F.col("lang") != "")
        .groupBy("lang")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("c"),
        )
        .orderBy(F.col("n_sources").desc(), F.col("c").desc(), "lang")
        .limit(10)
    )


@register_query(
    "cb_like_topk",
    oracle="""
SELECT source, MIN(doc_id) AS first_doc, COUNT(*) AS c
FROM documents WHERE text LIKE '%the%'
GROUP BY source ORDER BY c DESC, source LIMIT 10
""",
)
def cb_like_topk(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.filter(F.col("text").like("%the%"))
        .groupBy("source")
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "source")
        .limit(10)
    )


@register_query(
    "cb_regexp_domain_agg",
    oracle="""
SELECT regexp_extract(text, '^([A-Za-z]+)', 1) AS head_word,
       CAST(SUM(strlen(text)) AS DOUBLE) / COUNT(*) AS avg_len,
       COUNT(*) AS c, MIN(doc_id) AS first_doc
FROM documents WHERE text <> ''
GROUP BY head_word HAVING COUNT(*) > 5
ORDER BY avg_len DESC, head_word LIMIT 25
""",
    cache_plan=True,
)
def cb_regexp_domain_agg(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return (
        docs.filter(F.col("text") != "")
        .groupBy(
            F.regexp_extract("text", r"^([A-Za-z]+)", 1).alias("head_word")
        )
        .agg(
            (F.sum(F.octet_length("text")).cast("double") / F.count(F.lit(1))).alias(
                "avg_len"
            ),
            F.count(F.lit(1)).alias("c"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("c") > 5)
        .orderBy(F.col("avg_len").desc(), "head_word")
        .limit(25)
    )


_N_SUMS = 20


@register_query(
    "cb_sum_expr_battery",
    # DuckDB SUM(int) is HUGEINT -> float64 in pandas; Spark sum(long) stays
    # long. Cast the oracle to BIGINT so both engines format integers.
    oracle="SELECT "
    + ", ".join(f"CAST(SUM(n_chars + {i}) AS BIGINT) AS s{i}" for i in range(_N_SUMS))
    + " FROM documents",
)
def cb_sum_expr_battery(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.agg(
        *[F.sum(F.col("n_chars") + F.lit(i)).alias(f"s{i}") for i in range(_N_SUMS)]
    )


@register_query(
    "cb_multikey_group",
    oracle=f"""
SELECT event_type, user_id % 100 AS bucket, COUNT(*) AS c,
       CAST(SUM({O_VAL}) AS DOUBLE) AS sum_value
FROM events WHERE event_type <> ''
GROUP BY event_type, bucket
ORDER BY c DESC, event_type, bucket LIMIT 10
""",
)
def cb_multikey_group(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") != "")
        .groupBy("event_type", (F.col("user_id") % 100).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast(D)).cast("double").alias("sum_value"),
        )
        .orderBy(F.col("c").desc(), "event_type", "bucket")
        .limit(10)
    )


@register_query(
    "cb_filtered_daily_topk",
    oracle="""
SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS pv
FROM events WHERE event_type = 'view'
GROUP BY user_id, day
ORDER BY pv DESC, user_id, day LIMIT 10 OFFSET 10
""",
)
def cb_filtered_daily_topk(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("pv"))
        .orderBy(F.col("pv").desc(), "user_id", "day")
        .offset(10)
        .limit(10)
    )


@register_query(
    "cb_quantile_battery",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       COUNT(*) AS c
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def cb_quantile_battery(spark, sf_dir):
    """ClickBench q26-style per-group percentiles — EXACT interpolated
    percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
    verified bit-equal at 6 decimals). Exact percentile collects each
    group's values; the 100 TB path is ``approx_percentile`` (t-digest,
    mergeable sketches — covered rows-only in fn_native_approx); this
    battery is the oracle-checkable small-group form (5 groups here)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
            F.count(F.lit(1)).alias("c"),
        )
        .orderBy("event_type")
    )


@register_query(
    "cb_hourly_uniques",
    oracle="""
SELECT date_trunc('hour', ts) AS hour,
       COUNT(DISTINCT user_id) AS uniques,
       COUNT(*) AS c,
       CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY hour ORDER BY uniques DESC, hour LIMIT 24
""",
)
def cb_hourly_uniques(spark, sf_dir):
    """ClickBench q05/q35-style time-bucketed uniques: hourly distinct
    users + traffic. Two-level distinct aggregate after one scan; the
    decimal sum keeps partition-order invariance (exact associative)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.countDistinct("user_id").alias("uniques"),
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast(D)).cast("double").alias("sum_value"),
        )
        .orderBy(F.col("uniques").desc(), "hour")
        .limit(24)
    )
