"""TPC-DS-shape query battery — the reference carries the full suite
(slt/tpcds/q01..q99, bench_bin/bench_runner.rs registration); these adapt
its distinct stress shapes (the ones TPC-H doesn't already cover) to the
fixture star schema:

- q67 shape  -> tpcds_rollup_rank      (ROLLUP + rank-per-group windows)
- q47 shape  -> tpcds_moving_avg       (partitioned moving average + deviation)
- q01/q06    -> tpcds_over_avg_spend   (correlated above-group-average filter)
- q33/q56    -> tpcds_channel_union    (UNION ALL of channel subqueries + re-agg)
- q34/q73    -> tpcds_order_buckets    (CASE bucketing + HAVING counts)
- q10/q35    -> tpcds_multi_exists     (customers active in BOTH periods)
- q38 shape  -> tpcds_tri_channel_intersect (INTERSECT of channel sets)
- q53/q63    -> tpcds_ratio_to_avg     (month revenue vs group average)
- q74 shape  -> tpcds_yoy_growth       (YoY growth: window lag, no self-join)
- q78/q97    -> tpcds_channel_fullouter (FULL OUTER join of channel aggs)
- q66 shape  -> tpcds_case_pivot       (conditional-aggregate pivot, one pass)
- q86 shape  -> tpcds_grouping_share   (ROLLUP + share-of-parent via window)
- q90 shape  -> tpcds_ampm_ratio       (two time-window counts, one scan)
- q49 shape  -> tpcds_ntile_buckets    (quartile split of per-entity aggregate)
- q51 shape  -> tpcds_cumulative_compare (aligned running totals, overtake days)

Scale notes: rollup/window shapes shuffle once on their grouping keys with
partial aggregation; the moving average is one window pass after one agg
shuffle; channel union re-aggregates map-side (three scans of one table —
at 100 TB the channel split would be partition-pruned date ranges of one
scan). Money math runs in DECIMAL(15,2) on both engines (exact,
order-invariant); every ORDER BY carries full tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

D = "decimal(15,2)"
O_PRICE = "CAST(o_totalprice AS DECIMAL(15,2))"


def _t(spark, sf_dir, *names):
    return load_tables(spark, sf_dir, *names)


@register_query(
    "tpcds_rollup_rank",
    oracle=f"""
WITH agg AS (
  SELECT n.n_name AS nation, c.c_mktsegment AS segment,
         CAST(SUM({O_PRICE}) AS DOUBLE) AS revenue,
         GROUPING(n.n_name) + 2 * GROUPING(c.c_mktsegment) AS lvl
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY ROLLUP(n.n_name, c.c_mktsegment)),
ranked AS (
  SELECT nation, segment, revenue, CAST(lvl AS INT) AS lvl,
         RANK() OVER (PARTITION BY lvl ORDER BY revenue DESC, nation NULLS FIRST,
                      segment NULLS FIRST) AS rnk
  FROM agg)
SELECT nation, segment, revenue, lvl, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
ORDER BY lvl, rnk, nation NULLS FIRST, segment NULLS FIRST
""",
)
def tpcds_rollup_rank(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "customer", "nation")
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("revenue"),
            (F.grouping("n_name") + F.grouping("c_mktsegment") * 2)
            .cast("int")
            .alias("lvl"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            "revenue",
            "lvl",
        )
    )
    w = Window.partitionBy("lvl").orderBy(
        F.col("revenue").desc(),
        F.col("nation").asc_nulls_first(),
        F.col("segment").asc_nulls_first(),
    )
    return (
        agg.withColumn("rnk", F.rank().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("nation", "segment", "revenue", "lvl", "rnk")
        .orderBy(
            "lvl",
            "rnk",
            F.col("nation").asc_nulls_first(),
            F.col("segment").asc_nulls_first(),
        )
    )


@register_query(
    "tpcds_moving_avg",
    oracle=f"""
WITH monthly AS (
  SELECT c.c_nationkey AS nationkey, date_trunc('month', o.o_orderdate) AS mon,
         SUM({O_PRICE}) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
win AS (
  SELECT nationkey, mon, CAST(rev AS DOUBLE) AS rev,
         CAST(SUM(rev) OVER (PARTITION BY nationkey ORDER BY mon
                             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY nationkey ORDER BY mon
                            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mavg
  FROM monthly)
SELECT CAST(nationkey AS INT) AS nationkey, mon, rev, mavg
FROM win WHERE rev > 1.1 * mavg
ORDER BY nationkey, mon
""",
)
def tpcds_moving_avg(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "customer")
    monthly = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(D)).alias("rev_dec"))
    )
    w = Window.partitionBy("nationkey").orderBy("mon").rowsBetween(-1, 1)
    # exact decimal SUM / integer COUNT (never AVG over DECIMAL: Spark's
    # decimal-avg rounds at scale 6, DuckDB keeps full precision)
    win = monthly.select(
        "nationkey",
        "mon",
        F.col("rev_dec").cast("double").alias("rev"),
        (
            F.sum("rev_dec").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mavg"),
    )
    return win.filter(F.col("rev") > 1.1 * F.col("mavg")).orderBy("nationkey", "mon")


@register_query(
    "tpcds_over_avg_spend",
    oracle=f"""
WITH spend AS (
  SELECT c.c_custkey AS custkey, c.c_nationkey AS nationkey,
         SUM({O_PRICE}) AS total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
nat AS (SELECT nationkey, CAST(SUM(total) AS DOUBLE) / COUNT(*) AS avg_total
        FROM spend GROUP BY 1)
SELECT CAST(s.custkey AS BIGINT) AS custkey,
       CAST(s.nationkey AS INT) AS nationkey,
       CAST(s.total AS DOUBLE) AS total
FROM spend s JOIN nat n ON s.nationkey = n.nationkey
WHERE s.total > 1.2 * n.avg_total
ORDER BY custkey
""",
)
def tpcds_over_avg_spend(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "customer")
    spend = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_nationkey").cast("int").alias("nationkey"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(D)).alias("total_dec"))
    )
    # exact decimal SUM / COUNT (avg-over-decimal rounds differently per engine)
    nat = spend.groupBy("nationkey").agg(
        (F.sum("total_dec").cast("double") / F.count(F.lit(1))).alias("avg_total")
    )
    return (
        spend.join(nat, "nationkey")
        .filter(F.col("total_dec") > 1.2 * F.col("avg_total"))
        .select(
            "custkey", "nationkey", F.col("total_dec").cast("double").alias("total")
        )
        .orderBy("custkey")
    )


@register_query(
    "tpcds_channel_union",
    oracle=f"""
WITH channels AS (
  SELECT 'q1' AS channel, o_custkey, {O_PRICE} AS price FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01'
  UNION ALL
  SELECT 'q2', o_custkey, {O_PRICE} FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
  UNION ALL
  SELECT 'q3', o_custkey, {O_PRICE} FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01')
SELECT channel, COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_custs,
       CAST(SUM(price) AS DOUBLE) AS revenue
FROM channels GROUP BY channel ORDER BY channel
""",
)
def tpcds_channel_union(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    price = F.col("o_totalprice").cast(D).alias("price")

    def ch(name, cond):
        return o.filter(cond).select(F.lit(name).alias("channel"), "o_custkey", price)

    d1, d2 = F.lit("1997-01-01").cast("timestamp"), F.lit("1999-01-01").cast("timestamp")
    dt = F.col("o_orderdate")
    channels = (
        ch("q1", dt < d1)
        .unionByName(ch("q2", (dt >= d1) & (dt < d2)))
        .unionByName(ch("q3", dt >= d2))
    )
    return (
        channels.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.sum("price").cast("double").alias("revenue"),
        )
        .orderBy("channel")
    )


@register_query(
    "tpcds_order_buckets",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey)
SELECT CASE WHEN n <= 2 THEN 'low' WHEN n <= 5 THEN 'mid' ELSE 'high' END
         AS bucket,
       COUNT(*) AS n_custs, CAST(SUM(n) AS BIGINT) AS n_orders
FROM per_cust
GROUP BY bucket HAVING COUNT(*) > 1
ORDER BY bucket
""",
)
def tpcds_order_buckets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")["orders"]
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    bucket = (
        F.when(F.col("n") <= 2, "low").when(F.col("n") <= 5, "mid").otherwise("high")
    )
    return (
        per_cust.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("n").cast("long").alias("n_orders"),
        )
        .filter(F.col("n_custs") > 1)
        .orderBy("bucket")
    )


@register_query(
    "tpcds_multi_exists",
    oracle="""
SELECT CAST(c.c_custkey AS BIGINT) AS custkey, c.c_mktsegment AS segment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate < TIMESTAMP '1999-01-01')
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01')
ORDER BY custkey
""",
)
def tpcds_multi_exists(spark, sf_dir):
    t = _t(spark, sf_dir, "orders", "customer")
    o, c = t["orders"], t["customer"]
    cut = F.lit("1999-01-01").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    late = o.filter(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    return (
        c.join(early, c["c_custkey"] == early["o_custkey"], "left_semi")
        .join(late, c["c_custkey"] == late["o_custkey"], "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment"))
        .orderBy("custkey")
    )


@register_query(
    "tpcds_tri_channel_intersect",
    oracle="""
SELECT CAST(u AS BIGINT) AS user_id FROM (
  SELECT DISTINCT user_id AS u FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
ORDER BY user_id
""",
)
def tpcds_tri_channel_intersect(spark, sf_dir):
    """q38 shape: entities present in ALL three channels via INTERSECT of
    per-channel distinct sets (the reference stubs INTERSECT physical
    planning at plan_set_operation.rs:30; Spark ships it). Each branch is
    a filtered distinct of one scan; at 100 TB the three branches are
    partition-pruned slices of a single source."""
    events = _t(spark, sf_dir, "events")["events"]

    def chan(t):
        return (
            events.filter(F.col("event_type") == t)
            .select("user_id")
            .distinct()
        )

    return (
        chan("click")
        .intersect(chan("view"))
        .intersect(chan("purchase"))
        .select(F.col("user_id").cast("long").alias("user_id"))
        .orderBy("user_id")
    )


@register_query(
    "tpcds_ratio_to_avg",
    oracle=f"""
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         date_trunc('month', o_orderdate) AS month,
         CAST(SUM({O_PRICE}) AS DOUBLE) AS revenue
  FROM orders
  GROUP BY 1, 2)
SELECT priority, month, revenue,
       revenue / (CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
                        OVER (PARTITION BY priority) AS DOUBLE)
                  / COUNT(*) OVER (PARTITION BY priority)) AS ratio
FROM monthly
QUALIFY ratio > 1.05
ORDER BY priority, month
""",
)
def tpcds_ratio_to_avg(spark, sf_dir):
    """q53/q63 shape: per-group monthly revenue vs the group's average
    month, keeping above-average months. One agg shuffle then one window
    pass; the group average uses exact-decimal sum / count (never AVG
    over DECIMAL — cross-engine scale rules differ)."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    monthly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("priority")
    ratio = F.col("revenue") / (
        F.sum(F.col("revenue").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        monthly.withColumn("ratio", ratio)
        .filter(F.col("ratio") > 1.05)
        .orderBy("priority", "month")
    )


@register_query(
    "tpcds_yoy_growth",
    oracle=f"""
WITH yearly AS (
  SELECT o_custkey AS custkey,
         CAST(date_part('year', o_orderdate) AS INT) AS yr,
         CAST(SUM({O_PRICE}) AS DOUBLE) AS spend
  FROM orders GROUP BY 1, 2)
SELECT custkey, yr, spend,
       lag(spend) OVER (PARTITION BY custkey ORDER BY yr) AS prev_spend,
       round(spend / lag(spend) OVER (PARTITION BY custkey ORDER BY yr), 6)
         AS growth
FROM yearly
QUALIFY prev_spend IS NOT NULL AND growth > 1.5
ORDER BY growth DESC, custkey, yr LIMIT 25
""",
)
def tpcds_yoy_growth(spark, sf_dir):
    """q74 shape: year-over-year per-customer spend growth. TPC-DS writes
    this as a self-join of the yearly aggregate with itself; the
    Spark-first form is one agg shuffle + one window ``lag`` over
    (custkey, year) — same result, half the scans, no join. Exact
    decimal sums; the ratio is one double division rounded to 6."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    yearly = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(F.sum(F.col("o_totalprice").cast(D)).cast("double").alias("spend"))
    w = Window.partitionBy("custkey").orderBy("yr")
    return (
        yearly.withColumn("prev_spend", F.lag("spend").over(w))
        .withColumn("growth", F.round(F.col("spend") / F.col("prev_spend"), 6))
        .filter(F.col("prev_spend").isNotNull() & (F.col("growth") > 1.5))
        .orderBy(F.col("growth").desc(), "custkey", "yr")
        .limit(25)
    )


@register_query(
    "tpcds_channel_fullouter",
    oracle="""
WITH p AS (
  SELECT user_id, COUNT(*) AS n_purchases,
         CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
 v AS (
  SELECT user_id, COUNT(*) AS n_views
  FROM events WHERE event_type = 'view' GROUP BY user_id)
SELECT coalesce(p.user_id, v.user_id) AS user_id,
       coalesce(n_purchases, 0) AS n_purchases,
       coalesce(purchase_value, 0.0) AS purchase_value,
       coalesce(n_views, 0) AS n_views
FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
WHERE coalesce(n_purchases, 0) = 0 OR coalesce(n_views, 0) = 0
ORDER BY user_id
""",
)
def tpcds_channel_fullouter(spark, sf_dir):
    """q78/q97 shape: FULL OUTER join of two per-channel aggregates,
    keeping single-channel entities (buyers who never browsed and
    browsers who never bought). Both aggregates shuffle on user_id, so
    the join itself reuses that partitioning (no third exchange under
    AQE); at 100 TB the channel split is a partition-pruned predicate
    over one scan."""
    ev = _t(spark, sf_dir, "events")["events"]
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast(D)).cast("double").alias("purchase_value"),
        )
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    joined = p.join(v, "user_id", "full_outer")
    return (
        joined.select(
            "user_id",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
        )
        .filter((F.col("n_purchases") == 0) | (F.col("n_views") == 0))
        .orderBy("user_id")
    )


@register_query(
    "tpcds_case_pivot",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN {O_PRICE} ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE) AS urgent_rev,
       CAST(SUM(CASE WHEN o.o_orderpriority = '2-HIGH' THEN {O_PRICE} ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE) AS high_rev,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN {O_PRICE} ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE) AS other_rev,
       CAST(SUM({O_PRICE}) AS DOUBLE) AS total_rev
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
     JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""",
)
def tpcds_case_pivot(spark, sf_dir):
    """q66 shape: conditional-aggregate pivot — one pass computes a
    column per category (priority bands here standing in for q66's
    months) plus the total. One shuffle on the grouping key with full
    map-side partial aggregation; at 100 TB this beats the naive
    N-subquery self-join form by N scans. Money math in DECIMAL(15,2)
    so results are AQE-repartition-invariant."""
    t = _t(spark, sf_dir, "orders", "customer", "nation")
    o, c, n = t["orders"], t["customer"], t["nation"]
    price = F.col("o_totalprice").cast(D)
    zero = F.lit(0).cast(D)
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", price)
                .otherwise(zero)
            ).cast("double").alias("urgent_rev"),
            F.sum(
                F.when(F.col("o_orderpriority") == "2-HIGH", price)
                .otherwise(zero)
            ).cast("double").alias("high_rev"),
            F.sum(
                F.when(
                    ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                    price,
                ).otherwise(zero)
            ).cast("double").alias("other_rev"),
            F.sum(price).cast("double").alias("total_rev"),
        )
        .orderBy("nation")
    )


@register_query(
    "tpcds_grouping_share",
    oracle=f"""
WITH agg AS (
  SELECT n.n_name AS nation, o.o_orderpriority AS priority,
         SUM({O_PRICE}) AS revenue,
         GROUPING(o.o_orderpriority) AS is_total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY ROLLUP(n.n_name, o.o_orderpriority)
  HAVING GROUPING(n.n_name) = 0)
SELECT nation, priority,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(CAST(is_total AS INT) AS INT) AS is_total,
       CAST(revenue AS DOUBLE) * 100 /
       CAST(SUM(CASE WHEN is_total = 1 THEN revenue END)
            OVER (PARTITION BY nation) AS DOUBLE) AS pct_of_nation
FROM agg
ORDER BY nation, is_total, priority NULLS FIRST
""",
)
def tpcds_grouping_share(spark, sf_dir):
    """q86 shape: ROLLUP with GROUPING() + share-of-parent percentage —
    each (nation, priority) row carries its percent of the nation
    subtotal computed by a window over the rollup output (no re-join of
    the aggregate to itself). The rollup shuffles once; the window
    repartitions on nation only."""
    t = _t(spark, sf_dir, "orders", "customer", "nation")
    o, c, n = t["orders"], t["customer"], t["nation"]
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast(D)).alias("revenue"),
            F.grouping("o_orderpriority").alias("is_total"),
        )
        # GROUPING(n_name) = 0: fixture nation names are never NULL, so
        # dropping the NULL-nation row removes exactly the grand total
        .filter(F.col("n_name").isNotNull())
    )
    w = Window.partitionBy("n_name")
    total = F.sum(
        F.when(F.col("is_total") == 1, F.col("revenue"))
    ).over(w)
    return (
        agg.select(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
            F.col("revenue").cast("double").alias("revenue"),
            F.col("is_total").cast("int").alias("is_total"),
            (
                F.col("revenue").cast("double") * 100
                / total.cast("double")
            ).alias("pct_of_nation"),
        )
        .orderBy("nation", "is_total", F.col("priority").asc_nulls_first())
    )


@register_query(
    "tpcds_ampm_ratio",
    oracle="""
SELECT CAST(am_events AS BIGINT) AS am_events,
       CAST(pm_events AS BIGINT) AS pm_events,
       CAST(am_events AS DOUBLE) / pm_events AS am_pm_ratio
FROM (SELECT SUM(CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 1 ELSE 0 END) AS am_events,
             SUM(CASE WHEN EXTRACT(hour FROM ts) >= 12 THEN 1 ELSE 0 END) AS pm_events
      FROM events WHERE event_type IN ('view', 'click'))
""",
)
def tpcds_ampm_ratio(spark, sf_dir):
    """q90 shape: the ratio of two time-window counts, computed as ONE
    conditional aggregate over one scan — not q90's literal two
    subqueries joined (two scans). Zero-shuffle to a single row."""
    ev = _t(spark, sf_dir, "events")["events"]
    hour = F.hour("ts")
    return (
        ev.filter(F.col("event_type").isin("view", "click"))
        .agg(
            F.sum(F.when(hour < 12, 1).otherwise(0)).alias("am_events"),
            F.sum(F.when(hour >= 12, 1).otherwise(0)).alias("pm_events"),
        )
        .select(
            F.col("am_events").cast("long").alias("am_events"),
            F.col("pm_events").cast("long").alias("pm_events"),
            (
                F.col("am_events").cast("double") / F.col("pm_events")
            ).alias("am_pm_ratio"),
        )
    )


@register_query(
    "tpcds_ntile_buckets",
    oracle=f"""
WITH t AS (
  SELECT o_custkey, SUM({O_PRICE}) AS spend
  FROM orders GROUP BY o_custkey),
b AS (
  SELECT o_custkey, spend, NTILE(4) OVER (ORDER BY spend DESC, o_custkey) AS bucket
  FROM t)
SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS customers,
       CAST(MIN(spend) AS DOUBLE) AS min_spend,
       CAST(MAX(spend) AS DOUBLE) AS max_spend
FROM b GROUP BY bucket ORDER BY bucket
""",
)
def tpcds_ntile_buckets(spark, sf_dir):
    """q49 shape: quartile bucketing of a per-entity aggregate (NTILE
    over deterministic total order) then per-bucket stats. The global
    NTILE is the single-partition window any engine pays for an exact
    global quantile split; at 100 TB the approx path is
    approx_quantile cutoffs + a map-side bucket join (fn_percentile
    family), kept exact here for oracle parity."""
    o = _t(spark, sf_dir, "orders")["orders"]
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(D)).alias("spend")
    )
    w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    b = spend.withColumn("bucket", F.ntile(4).over(w))
    return (
        b.groupBy(F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.min("spend").cast("double").alias("min_spend"),
            F.max("spend").cast("double").alias("max_spend"),
        )
        .orderBy("bucket")
    )


@register_query(
    "tpcds_cumulative_compare",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views
  FROM events GROUP BY CAST(ts AS DATE)),
cum AS (
  SELECT d,
         SUM(purchases) OVER (ORDER BY d) AS cum_purchases,
         SUM(views) OVER (ORDER BY d) AS cum_views
  FROM daily)
SELECT CAST(d AS VARCHAR) AS d,
       CAST(cum_purchases AS BIGINT) AS cum_purchases,
       CAST(cum_views AS BIGINT) AS cum_views
FROM cum WHERE cum_purchases > cum_views
ORDER BY d
""",
)
def tpcds_cumulative_compare(spark, sf_dir):
    """q51 shape: running totals of two channels aligned by day, keeping
    the days where one overtakes the other. One conditional daily
    aggregate (single scan, no per-channel self-join) then an ordered
    cumulative window; cardinality entering the window is |days| — tiny
    — so the single-partition ordered window is not a scale concern."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchases"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("views"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("purchases").over(w).cast("long").alias("cum_purchases"),
        F.sum("views").over(w).cast("long").alias("cum_views"),
    )
    return (
        cum.filter(F.col("cum_purchases") > F.col("cum_views"))
        .select(
            F.col("d").cast("string").alias("d"),
            "cum_purchases",
            "cum_views",
        )
        .orderBy("d")
    )
