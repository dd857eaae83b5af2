"""Event-stream operators (batch form) over the ``events`` fixture.

The reference has no streaming subsystem (SURVEY.md §2.7) — these are the
batch formulations of the standard streaming operator set: tumbling windows,
hopping (sliding) windows, sessionization with an inactivity gap, and a
per-day event-type pivot. glaredb_spark.streaming exposes the same logic as
Structured Streaming jobs (readStream + watermark); the batch versions here
are the oracle-checkable surface.

Scale notes: windowed aggregation shuffles on (window, keys) with map-side
partial aggregation; sessionization shuffles once on user_id and computes
sessions with window functions inside each partition — at 100 TB both are
single-shuffle plans. Hopping windows use Spark's native `window()` slide
expansion (2 rows per event for 1h/30m), the same expansion Structured
Streaming uses.

Determinism: timestamps are exact microseconds (ns fixture values truncated
by integer division identically in both engines); value sums go through
DECIMAL(15,2); counts are integers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

D = "decimal(15,2)"
O_VAL = "CAST(value AS DECIMAL(15,2))"


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, "events")["events"]


@register_query(
    "events_tumbling_hourly",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM({O_VAL}) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_tumbling_hourly(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(D)).cast("double").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register_query(
    "events_hopping_1h_30m",
    oracle=f"""
SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes'
         AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM({O_VAL}) AS DOUBLE) AS total_value
FROM events, UNNEST([0, 1]) AS offs(k)
GROUP BY 1
ORDER BY 1
""",
)
def events_hopping_1h_30m(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@register_query(
    "events_sessionize",
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events),
numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM({O_VAL}) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    cache_plan=True,
)
def events_sessionize(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 minutes")),
            1,
        ).otherwise(0),
    )
    # event_id tiebreaker: with duplicate timestamps per user the ROWS-frame
    # order would otherwise be engine-nondeterministic (ADVICE r1).
    wnum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    numbered = marked.withColumn(
        "session_id", F.sum("new_session").over(wnum).cast("long")
    )
    # r15: total_value in exact long cents (the q01 pattern, tpch.cents):
    # floor(value*100+0.5) is the unscaled DECIMAL(15,2) value for the
    # fixture's 2-decimal money doubles; the decimal(20,0) accumulator
    # keeps the sum exact at any scale and the exact 0.01 rescale leaves
    # the double cast as the single rounding step — bit-identical to
    # sum(cast(value as decimal(15,2))).cast(double) (proven at 3 SFs +
    # oracle parity, tests/test_q01_cents.py). Interleaved A/B at sf0.1:
    # cents faster 7/8 pairs, min 0.558→0.507 s.
    total_cents = F.sum(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("decimal(20,0)")
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (total_cents * F.lit("0.01").cast("decimal(2,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register_query(
    "events_daily_type_pivot",
    oracle=f"""
SELECT date_trunc('day', ts) AS day,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN {O_VAL}
                     ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE) AS purchase_value
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def events_daily_type_pivot(spark, sf_dir):
    ev = _events(spark, sf_dir)
    zero = F.lit(0).cast(D)

    def cnt(t):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t)

    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            cnt("view"),
            cnt("click"),
            cnt("purchase"),
            cnt("signup"),
            cnt("error"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value").cast(D)).otherwise(zero)
            )
            .cast("double")
            .alias("purchase_value"),
        )
        .orderBy("day")
    )


@register_query(
    "events_retention_cohorts",
    oracle="""
WITH cohorts AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, a.week) // 7 AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN cohorts c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts: users bucketed by first-activity week,
    counted in each subsequent active week. Two aggregations (per-user min,
    distinct user-week) + one equi-join on user_id — every shuffle keyed by
    user or (cohort, offset), never by raw events."""
    ev = _events(spark, sf_dir)
    wk = F.date_trunc("week", F.col("ts"))
    cohorts = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = ev.select("user_id", wk.alias("week")).distinct()
    return (
        active.join(cohorts, "user_id")
        .select(
            "cohort_week",
            F.expr("CAST(datediff(week, cohort_week) AS BIGINT) div 7").alias(
                "week_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
