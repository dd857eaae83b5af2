"""TPC-H q01–q22 adapted to the driver fixture schema, DataFrame-first.

The reference runs TPC-H via golden SLTs (slt/tpchbench/q01.slt..q22.slt)
and bench files (bench/tpch/{1,10,50,100}/q*.bench). The driver fixture is a
reduced TPC-H star schema (no partsupp; fewer columns; money columns stored
as DOUBLE; l_shipdate is a timestamp; dates span 1995–2001) — every query
below keeps the *operator shape* of its TPC-H namesake (same join pattern,
agg structure, subquery form) on the available columns. Where the classic
query needs partsupp, lineitem's (l_partkey, l_suppkey) plays that role.

Determinism contract: money aggregates are computed in exact DECIMAL
arithmetic (cast each input to DECIMAL(15,2), keep every intermediate within
DECIMAL(38,_) via explicit casts) and only the final aggregate is cast to
DOUBLE. The Spark builders and the DuckDB oracle SQL apply identical casts,
so results are bit-identical across engines — no float-summation order
sensitivity. This mirrors the reference, whose TPC-H money columns really
are Decimal64(15,2) (glaredb_ext_tpch_gen/src/functions/lineitem.rs:41-62).
l_quantity values are whole numbers, so double sums/avgs of them are exact.

Correlated subqueries are expressed as join/aggregate rewrites on the Spark
side (the decorrelation GlareDB performs in its planner,
logical/planner/plan_subquery.rs:36-44, and Catalyst performs for SQL) while
the oracle keeps the correlated SQL form — semantically identical.

Scale notes (100 TB):
- lineitem/orders joins shuffle on the join key; AQE picks the join strategy
  and splits skewed partitions at runtime.
- region/nation (≤25 rows by schema) and part/supplier dims are broadcast
  (explicit `F.broadcast` for the schema-bounded tiny ones) — no fact-table
  shuffle for those joins.
- Aggregations are partial (map-side combine) by construction via groupBy.
- Filters sit directly on scan columns → parquet predicate pushdown +
  row-group pruning (reference analog: row_group_pruner.rs:13-60).
- Top-k = orderBy().limit(k) → Spark TakeOrderedAndProject, the reference's
  sort limit-hint (optimizer/sort_limit_hint.rs:13). Sort keys always
  include a unique tiebreaker so LIMIT is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

D = "decimal(15,2)"


def dec(col):
    return F.col(col).cast(D)


def ONE():
    return F.lit(1).cast(D)


def disc_price():
    """exact: (15,2)*(16,2) → scale-4 product, fits decimal(18,4)"""
    return (dec("l_extendedprice") * (ONE() - dec("l_discount"))).cast("decimal(18,4)")


def charge():
    return (disc_price() * (ONE() + dec("l_tax")).cast("decimal(16,2)")).cast(
        "decimal(24,6)"
    )


# Oracle-side equivalents (identical casts → identical exact values).
O_DISC = (
    "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * "
    "(CAST(1 AS DECIMAL(15,2)) - CAST(l_discount AS DECIMAL(15,2))) "
    "AS DECIMAL(18,4))"
)
O_CHARGE = (
    f"CAST({O_DISC} * CAST(CAST(1 AS DECIMAL(15,2)) + CAST(l_tax AS DECIMAL(15,2)) "
    "AS DECIMAL(16,2)) AS DECIMAL(24,6))"
)
O_QTY = "CAST(l_quantity AS DECIMAL(15,2))"
O_PRICE = "CAST(l_extendedprice AS DECIMAL(15,2))"


def money(sum_col):
    """Final cast of an exact decimal aggregate to DOUBLE."""
    return sum_col.cast("double")


def sum_disc_price_cents():
    """Exact long-cents form of money(F.sum(disc_price())) — the q01
    rewrite's dp4 path as a reusable aggregate (r15: shipped on q03/q09
    after interleaved A/B; q05 measured as a no-win and keeps the
    decimal chain). Per-row product cents(price)*(100-cents(discount))
    is the 10^-4-unscaled value of disc_price() (see cents());
    aggregation in decimal(20,0) keeps the sum exact at any scale; the
    exact 10^-4 rescale leaves the double cast as the single rounding
    step — bit-identical to sum(decimal(18,4)).cast(double)
    (tests/test_q01_cents.py)."""
    dp4 = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    s = F.sum(dp4.cast("decimal(20,0)"))
    return (s * F.lit("0.0001").cast("decimal(4,4)")).cast("double")


def ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def T(spark, sf_dir, *names):
    return load_tables(spark, sf_dir, *names)


# ---------------------------------------------------------------------------
# q01 — pricing summary report (scan → filter → hash agg → sort)
# ---------------------------------------------------------------------------
def cents(col):
    """Exact integer 'cents' of a fixture money DOUBLE, in pure codegen.

    Equals the unscaled value of CAST(col AS DECIMAL(15,2)) for this
    fixture's money columns (non-negative, at most 2 decimal digits,
    < 10^6) while avoiding the per-row Double.toString/BigDecimal path
    that cast takes (r15 profile: the dec() casts alone cost ~0.30 s of
    tpch_q01's 0.95 s at sf0.1). Why floor(x*100 + 0.5) is exact here:
    the true value v has <= 2 decimals, so v*100 is an integer n and the
    stored double x deviates from v by < 1 ulp; x*100 then lands within
    ~1e-8 of n (|n| < 10^8, far from the 0.5 threshold), so adding 0.5
    and flooring recovers n for every representable input. Ties (values
    with exactly 3 decimals ending in 5) cannot occur with 2-decimal
    data. Proven per-row equal to the decimal cast on every lineitem
    money column at sf0.001/0.01/0.1 (tests/test_q01_cents.py)."""
    return F.floor(F.col(col) * 100 + F.lit(0.5))


@register_query(
    "tpch_q01",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({O_QTY}) AS DOUBLE) AS sum_qty,
       CAST(SUM({O_PRICE}) AS DOUBLE) AS sum_base_price,
       CAST(SUM({O_DISC}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({O_CHARGE}) AS DOUBLE) AS sum_charge,
       CAST(SUM({O_QTY}) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM({O_PRICE}) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    cache_plan=True,
)
def q01(spark, sf_dir):
    # r15: money arithmetic in exact long cents instead of per-row
    # double->decimal casts + a widening decimal product chain. Per-row
    # products stay in long (bounded: charge6 < 1.1e12); AGGREGATION is
    # decimal(20,0) -> decimal(30,0) accumulators so sums remain exact at
    # any scale (a long sum of charge6 would overflow around sf10 —
    # scale-wrong). The final rescale multiplies the exact integer sum by
    # an exact decimal 10^-k constant (product precision <= 37, no
    # rounding), so the cast to DOUBLE is the single rounding step —
    # bit-identical to the previous sum(decimal)->double path and to the
    # unchanged DuckDB oracle. Proven by bit-identical collects at
    # sf0.001/0.01/0.1 and oracle parity (tests/test_q01_cents.py).
    li = T(spark, sf_dir, "lineitem")["lineitem"]
    qc, pc = cents("l_quantity"), cents("l_extendedprice")
    dc, tc = cents("l_discount"), cents("l_tax")
    dp4 = pc * (F.lit(100) - dc)  # disc_price, unscaled at 10^-4
    ch6 = dp4 * (F.lit(100) + tc)  # charge, unscaled at 10^-6

    def S(col):
        return F.sum(col.cast("decimal(20,0)"))

    def at(sum_col, k: int):
        scale = F.lit("0." + "0" * (k - 1) + "1").cast(f"decimal({k},{k})")
        return (sum_col * scale).cast("double")

    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            at(S(qc), 2).alias("sum_qty"),
            at(S(pc), 2).alias("sum_base_price"),
            at(S(dp4), 4).alias("sum_disc_price"),
            at(S(ch6), 6).alias("sum_charge"),
            (at(S(qc), 2) / cnt).alias("avg_qty"),
            (at(S(pc), 2) / cnt).alias("avg_price"),
            (at(S(dc), 2) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — min-cost supplier (correlated scalar MIN subquery; lineitem plays
# partsupp). Spark side: decorrelated via groupBy-min + join.
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q02",
    oracle="""
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_size <= 10 AND p_type = 'ECONOMY'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2, supplier s2, nation n2, region r2
    WHERE p_partkey = l2.l_partkey AND s2.s_suppkey = l2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def q02(spark, sf_dir):
    t = T(spark, sf_dir, "part", "supplier", "lineitem", "nation", "region")
    eu_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    eu_supp = t["supplier"].join(
        F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    eu_offers = t["lineitem"].select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    ).join(eu_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    min_price = eu_offers.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    parts = t["part"].filter((F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY"))
    return (
        eu_offers.join(min_price, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q03 — shipping priority (3-way join + agg + deterministic top-10)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q03",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM({O_DISC}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    cache_plan=True,
)
def q03(spark, sf_dir):
    t = T(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    ords = t["orders"].filter(F.col("o_orderdate") < ts("1997-03-15 00:00:00"))
    li = t["lineitem"].filter(F.col("l_shipdate") > ts("1997-03-15 00:00:00"))
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # r15: long-cents revenue (see sum_disc_price_cents) — interleaved
        # A/B at sf0.1: new faster 9/10 pairs, med 0.390→0.333 s.
        .agg(sum_disc_price_cents().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — order priority checking (EXISTS → left-semi join with extra
# non-equi condition; commitdate/receiptdate replaced by ship-after-order)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q04",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT * FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q04(spark, sf_dir):
    t = T(spark, sf_dir, "orders", "lineitem")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1996-10-01 00:00:00"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        ords.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q05 — local supplier volume (6-way join incl. two small broadcast dims)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q05",
    oracle=f"""
SELECT n_name, CAST(SUM({O_DISC}) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    cache_plan=True,
)
def q05(spark, sf_dir):
    t = T(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    asia_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    return (
        t["lineitem"]
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(money(F.sum(disc_price())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# q06 — forecast revenue change (pure scan-filter-aggregate; all predicates
# push down to the parquet scan)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q06",
    oracle=f"""
SELECT CAST(SUM(CAST({O_PRICE} * CAST(l_discount AS DECIMAL(15,2))
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    cache_plan=True,
)
def q06(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money(
            F.sum((dec("l_extendedprice") * dec("l_discount")).cast("decimal(18,4)"))
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# q07 — volume shipping between two nations (self-joined dim, year extract)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q07",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             {O_DISC} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00') shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q07(spark, sf_dir):
    t = T(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate").between(ts("1996-01-01 00:00:00"), ts("1997-12-31 00:00:00"))
    )
    joined = (
        li.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(money(F.sum("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q08 — national market share (8-way join, conditional agg ratio)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q08",
    oracle=f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {O_DISC} AS volume, n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
        AND p_type = 'ECONOMY') all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q08(spark, sf_dir):
    t = T(spark, sf_dir, "part", "supplier", "lineitem", "orders", "customer",
          "nation", "region")
    asia_keys = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cust_nkey"))
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("nation")
    )
    parts = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    ords = t["orders"].filter(
        F.col("o_orderdate").between(ts("1996-01-01 00:00:00"), ts("1997-12-31 00:00:00"))
    )
    joined = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_keys), F.col("c_nationkey") == F.col("cust_nkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        joined.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            disc_price().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                money(F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero)))
                / money(F.sum("volume"))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q09 — product-type profit (LIKE filter + multi-join + year rollup;
# profit = discounted revenue, partsupp cost unavailable in fixtures)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q09",
    oracle=f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {O_DISC} AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%bolt%') profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    cache_plan=True,
)
def q09(spark, sf_dir):
    t = T(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    parts = t["part"].filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            # r15: long-cents amount (see sum_disc_price_cents) —
            # interleaved A/B at sf0.1: faster 32/36 pairs over 4 passes,
            # min 0.401→0.357 s in the deciding pass.
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("nation", "o_year")
        .agg(sum_disc_price_cents().alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q10 — returned item reporting (join + agg + deterministic top-20)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name, CAST(SUM({O_DISC}) AS DOUBLE) AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10(spark, sf_dir):
    t = T(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= ts("1996-10-01 00:00:00"))
        & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(money(F.sum(disc_price())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q11 — important stock identification (agg + global-total scalar subquery
# in HAVING; lineitem value per part plays partsupp)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q11",
    oracle=f"""
SELECT l_partkey, CAST(SUM({O_PRICE}) AS DOUBLE) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_5'
GROUP BY l_partkey
HAVING CAST(SUM({O_PRICE}) AS DOUBLE) > (
  SELECT CAST(SUM({O_PRICE}) AS DOUBLE) * 0.001
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_5')
ORDER BY value DESC, l_partkey
""",
)
def q11(spark, sf_dir):
    t = T(spark, sf_dir, "lineitem", "supplier", "nation")
    nat = t["nation"].filter(F.col("n_name") == "NATION_5")
    supp = t["supplier"].join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    offers = t["lineitem"].join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = offers.groupBy("l_partkey").agg(
        money(F.sum(dec("l_extendedprice"))).alias("value")
    )
    total = offers.agg(
        (money(F.sum(dec("l_extendedprice"))) * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# q12 — shipping mode / priority (conditional counts; returnflag plays
# shipmode since the fixture lacks l_shipmode)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q12",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey AND l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12(spark, sf_dir):
    t = T(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1997-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (left outer join with extra join
# predicate + double aggregation)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q13",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    cache_plan=True,
)
def q13(spark, sf_dir):
    t = T(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue (conditional agg ratio over a part join)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q14",
    oracle=f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {O_DISC}
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
       / CAST(SUM({O_DISC}) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
""",
)
def q14(spark, sf_dir):
    t = T(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < ts("1996-10-01 00:00:00"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                money(F.sum(F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(zero)))
                * F.lit(100.0)
                / money(F.sum(disc_price()))
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q15 — top supplier (CTE + scalar MAX subquery)
# ---------------------------------------------------------------------------
_Q15_REVENUE = f"""
SELECT l_suppkey AS supplier_no, CAST(SUM({O_DISC}) AS DOUBLE) AS total_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY l_suppkey
"""


@register_query(
    "tpch_q15",
    oracle=f"""
WITH revenue AS ({_Q15_REVENUE})
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15(spark, sf_dir):
    t = T(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < ts("1996-04-01 00:00:00"))
        )
        .groupBy("l_suppkey")
        .agg(money(F.sum(disc_price())).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q16 — parts/supplier relationship (NOT IN subquery → left-anti join,
# COUNT DISTINCT)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16(spark, sf_dir):
    t = T(spark, sf_dir, "lineitem", "part", "supplier")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
    )
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue (correlated AVG subquery → groupBy-avg
# + join; quantities are whole numbers so double avg is exact)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q17",
    oracle=f"""
SELECT CAST(SUM({O_PRICE}) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_size = 5
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
""",
)
def q17(spark, sf_dir):
    t = T(spark, sf_dir, "lineitem", "part")
    parts = t["part"].filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") == 5)
    ).select("p_partkey")
    avg_qty = t["lineitem"].groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((money(F.sum(dec("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q18 — large-volume customers (IN over grouped HAVING + 3-way join agg)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q18",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM({O_QTY}) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM({O_QTY}) > CAST(150 AS DECIMAL(15,2)))
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    cache_plan=True,
)
def q18(spark, sf_dir):
    # One lineitem pass (r15): the per-order quantity total computed for the
    # HAVING filter IS the query's sum_qty — o_orderkey is unique in orders
    # and rides the group key, so the post-join re-aggregation over a second
    # lineitem scan (semi join + groupBy) collapsed to a join of the
    # already-aggregated per-order totals. Same decimal sum over the same
    # rows → bit-identical after the final double cast.
    # r15 second pass: the per-order quantity total in exact long cents
    # (see cents()), aggregated in decimal(20,0) — same rewrite as q01.
    # HAVING boundary: tot_qty > 150.00 ⇔ cents sum > 15000 (both sides
    # exact integers in cents); the final ×0.01 rescale + double cast is
    # the q01-proven single-rounding path. Bit-identical at all 3 SFs
    # (tests/test_q01_cents.py::test_q18_bit_identical_to_decimal_chain).
    t = T(spark, sf_dir, "customer", "orders", "lineitem")
    big_orders = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity").cast("decimal(20,0)")).alias("qty_c"))
        .filter(F.col("qty_c") > 15000)
    )
    return (
        big_orders
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            (F.col("qty_c") * F.lit("0.01").cast("decimal(2,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — discounted revenue (disjunction of conjunctive range predicates —
# the reference's join-filter OR-split rewrite, expr_rewrite/join_filter_or.rs)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q19",
    oracle=f"""
SELECT CAST(SUM({O_DISC}) AS DOUBLE) AS revenue
FROM lineitem, part
WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
       AND p_size BETWEEN 1 AND 5 AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#13'
       AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#14'
       AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q19(spark, sf_dir):
    t = T(spark, sf_dir, "lineitem", "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#14")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(money(F.sum(disc_price())).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q20 — potential part promotion (nested IN subqueries with grouped HAVING)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q20",
    oracle=f"""
SELECT s_name, s_acctbal
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l_suppkey, l_partkey
    HAVING SUM({O_QTY}) > CAST(25 AS DECIMAL(15,2)))
  AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
ORDER BY s_name
""",
)
def q20(spark, sf_dir):
    t = T(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    small_parts = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy_supp = (
        t["lineitem"]
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("tot"))
        .filter(F.col("tot") > F.lit(25).cast(D))
        .select("l_suppkey")
        .distinct()
    )
    nat = t["nation"].filter(F.col("n_name") == "NATION_4")
    return (
        t["supplier"]
        .join(heavy_supp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS correlated
# on two outer columns → join-aggregate rewrite on the Spark side)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q21",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT * FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT * FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_6'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    cache_plan=True,
)
def q21(spark, sf_dir):
    # Single lineitem pass (r15): the old form scanned lineitem three times
    # (late join, EXISTS distinct, NOT EXISTS distinct) and re-shuffled it
    # for two semi joins. Both correlated conditions are per-order distinct
    # supplier counts, so one join to F-orders + two collect_set windows
    # over the SAME hash partitioning (l_orderkey — established by the join
    # exchange, reused by the window) computes them in place:
    #   EXISTS other-supplier lineitem      ⇔ n_supp  (distinct suppliers) ≥ 2
    #   NOT EXISTS other-supplier LATE item ⇔ n_late (distinct late supp) = 1
    # (l1 itself is late, so "no other late supplier" means exactly one).
    # Orders are unique by o_orderkey, so the join preserves every lineitem
    # row of an F order exactly once — the distinct counts match the old
    # whole-table distincts on the orders that can qualify at all.
    from pyspark.sql import Window

    t = T(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    ords = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(ords, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate")
    )
    w = Window.partitionBy("l_orderkey")
    j = j.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w))).withColumn(
        "n_late",
        F.size(F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)),
    )
    nat = t["nation"].filter(F.col("n_name") == "NATION_6")
    supp = t["supplier"].join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        j.filter(F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q22 — global sales opportunity (substring bucketing + exact-decimal AVG
# threshold + NOT EXISTS anti join; mktsegment prefix plays cntrycode)
# ---------------------------------------------------------------------------
@register_query(
    "tpch_q22",
    oracle="""
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS totacctbal
FROM (SELECT SUBSTRING(c_mktsegment, 1, 2) AS cntrycode, c_acctbal
      FROM customer
      WHERE SUBSTRING(c_mktsegment, 1, 2) IN ('AU', 'FU', 'MA')
        AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*)
          FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT * FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')) custsale
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def q22(spark, sf_dir):
    t = T(spark, sf_dir, "customer", "orders")
    cust = t["customer"].withColumn(
        "cntrycode", F.substring("c_mktsegment", 1, 2)
    ).filter(F.col("cntrycode").isin("AU", "FU", "MA"))
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            (money(F.sum(dec("c_acctbal"))) / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= ts("2000-01-01 00:00:00")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
