"""As-of and range joins — time-series operators Spark lacks as builtins.

The reference has no as-of join either; this is north-star surface ("an
operator Spark lacks… implement as a composition of existing DataFrame
ops"). The DuckDB oracle uses its native ASOF JOIN, so the composition is
verified against a real implementation of the semantics.

`asof_join` (backward, inclusive): for each left row, the right row with
the greatest right_ts ≤ left_ts within the same key group.

Spark plan: union both sides tagged, single shuffle on the key, one
ordered window pass carrying the last-seen right row forward
(`last(..., ignoreNulls)` over rows-unbounded-preceding), then filter back
to left rows. O(n log n) per key partition, ONE shuffle — the same cost
profile as sort-merge ASOF in native engines, and AQE-skew-splittable.
Ordering ties at equal ts put right rows first so `<=` semantics hold.

Range join: equi key + time-band predicate; Spark executes as an equi join
with the band as a post-join filter (shuffle on key only — never a cross
join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Backward as-of join. Right columns come back prefixed ``asof_``.

    Both inputs must not share column names other than `on`/ts columns;
    right is projected to (on, right_ts, other cols → asof_<col>).
    """
    r_cols = [c for c in right.columns if c not in (on, right_ts)]
    # All right columns travel as ONE struct: a struct literal is non-null
    # for every right row even when individual fields are NULL, so a single
    # last(ignorenulls) carries the latest right row WHOLESALE — never mixing
    # fields from different right matches (ASOF semantics; DuckDB parity).
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right rows sort first at equal ts (<=)
        F.struct(
            *[F.col(c).alias(f"asof_{c}") for c in r_cols],
            F.col(right_ts).alias("asof_ts"),
        ).alias("_r"),
    )
    l_cols = [c for c in left.columns if c != on]
    lt = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols],
    )
    unioned = lt.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_carry", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        F.col(on),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in l_cols if c != left_ts],
        *[F.col("_carry").getField(f"asof_{c}").alias(f"asof_{c}") for c in r_cols],
        F.col("_carry").getField("asof_ts").alias("asof_ts"),
    )
    return out


# ---------------------------------------------------------------------------
# as-of query: each purchase matched to the latest prior view of that user
# ---------------------------------------------------------------------------
@register_query(
    "asof_purchase_view",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
       v.event_id AS view_id,
       CAST(epoch_us(v.ts) AS BIGINT) AS view_us,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
ORDER BY purchase_id
""",
)
def asof_purchase_view(spark, sf_dir):
    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    joined = asof_join(purchases, views, on="user_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp")).cast("long")  # noqa: E731
    return joined.select(
        "purchase_id",
        "user_id",
        us("ts").alias("purchase_us"),
        F.col("asof_view_id").alias("view_id"),
        us("asof_ts").alias("view_us"),
        (us("ts") - us("asof_ts")).alias("gap_us"),
    ).orderBy("purchase_id")


# ---------------------------------------------------------------------------
# range (band) join: views within the hour preceding each purchase
# ---------------------------------------------------------------------------
@register_query(
    "rel_range_join",
    oracle="""
SELECT p.user_id, p.event_id AS purchase_id, COUNT(v.event_id) AS views_1h
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts > p.ts - INTERVAL '1 hour' AND v.ts <= p.ts
GROUP BY p.user_id, p.event_id
ORDER BY p.user_id, purchase_id
""",
)
def rel_range_join(spark, sf_dir):
    ev = load_tables(spark, sf_dir, "events")["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 hour"))
            & (F.col("v_ts") <= F.col("p_ts")),
            "left",
        )
        .groupBy("user_id", "purchase_id")
        .agg(F.count("view_id").alias("views_1h"))
        .orderBy("user_id", "purchase_id")
    )
