"""Distributed TPC-H data generator — ``tpch_gen.<table>(sf)`` TVFs.

The reference registers dbgen as a table-function extension
(crates/glaredb_ext_tpch_gen/src/, delegating to the public ``tpchgen``
crate; slt/tpch_gen/*.slt). This is the Spark-native equivalent: every
table is a pure-JVM expression pipeline over ``spark.range(n)`` — no
driver-side materialization, no Python in the row path — so generation
parallelism scales with the cluster exactly like a scan (100 TB of
TPC-H is just ``range`` splits).

Fidelity contract:
- **Schemas** match the reference exactly (describe.slt golden:
  Decimal64(15,2) money columns, Int64 keys, Date32 dates).
- **region/nation** are the spec's constant tables, byte-exact
  (TPC-H §4.2.3; the 5+25 rows every dbgen emits).
- **Scaled tables** follow the spec's cardinalities and value
  distributions (§4.2.2-4.2.3): sparse order keys (8 per 32-block),
  the partsupp supplier formula, the closed-form p_retailprice, date
  windows (o_orderdate ∈ [1992-01-01, 1998-08-02], ship/commit/receipt
  offsets), returnflag/linestatus rules vs the 1995-06-17 current date,
  and o_totalprice as the exact line-level sum. The RNG is a
  deterministic per-column hash stream (xxhash64), NOT dbgen's Lehmer
  LCG — row-level values differ from C dbgen while every distribution,
  bound, and cross-column constraint holds. Documented divergence:
  bit-parity with dbgen would need its per-stream seed tables.
- Text columns are deterministic word-salad from the spec's grammar
  vocabulary, not the full grammar.

Internal consistency: lineitem derives o_orderdate and the per-order
line count from the SAME hash streams orders uses, so order↔line
constraints (dates, status, totalprice) hold without a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "gen_table"]

_CURRENT = "DATE '1995-06-17'"
_START = "DATE '1992-01-01'"
# o_orderdate max = 1998-12-31 - 151 days
_ODATE_DAYS = 2405  # days in [1992-01-01, 1998-08-02]

REGION_ROWS = [
    (0, "AFRICA", "lar deposits. blithely final packages cajole. regular waters are final requests. regular accounts are according to "),
    (1, "AMERICA", "hs use ironic, even requests. s"),
    (2, "ASIA", "ges. thinly even pinto beans ca"),
    (3, "EUROPE", "ly final courts cajole furiously final excuse"),
    (4, "MIDDLE EAST", "uickly special accounts cajole carefully blithely close requests. carefully final asymptotes haggle furiousl"),
]

NATION_ROWS = [
    (0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1),
    (3, "CANADA", 1), (4, "EGYPT", 4), (5, "ETHIOPIA", 0),
    (6, "FRANCE", 3), (7, "GERMANY", 3), (8, "INDIA", 2),
    (9, "INDONESIA", 2), (10, "IRAN", 4), (11, "IRAQ", 4),
    (12, "JAPAN", 2), (13, "JORDAN", 4), (14, "KENYA", 0),
    (15, "MOROCCO", 0), (16, "MOZAMBIQUE", 0), (17, "PERU", 1),
    (18, "CHINA", 2), (19, "ROMANIA", 3), (20, "SAUDI ARABIA", 4),
    (21, "VIETNAM", 2), (22, "RUSSIA", 3), (23, "UNITED KINGDOM", 3),
    (24, "UNITED STATES", 1),
]

_WORDS = (
    "blithely regular ironic final furiously carefully quickly slyly "
    "express silent pending deposits requests accounts packages theodolites "
    "foxes pinto beans instructions dependencies"
).split()

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_INSTRUCTS = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
_MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
_CONTAINERS1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
_CONTAINERS2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]
_TYPES1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
_TYPES2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
_TYPES3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]


def _r(key: str, col, lo: int, hi: int):
    """Deterministic per-column stream: uniform integer in [lo, hi]."""
    return (F.pmod(F.xxhash64(F.lit(key), col), F.lit(hi - lo + 1)) + lo).cast(
        "long"
    )


def _pick(key: str, col, values: list[str]):
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), (_r(key, col, 0, len(values) - 1) + 1).cast("int")
    )


def _words(key: str, col, n: int):
    return F.concat_ws(
        " ", *[_pick(f"{key}:{i}", col, _WORDS) for i in range(n)]
    )


def _money(expr_cents):
    return (expr_cents.cast("decimal(20,0)") / 100).cast("decimal(15,2)")


def _phone(key: str, col, nation):
    return F.concat(
        (nation + 10).cast("string"), F.lit("-"),
        _r(key + ":1", col, 100, 999).cast("string"), F.lit("-"),
        _r(key + ":2", col, 100, 999).cast("string"), F.lit("-"),
        _r(key + ":3", col, 1000, 9999).cast("string"),
    )


def region(spark: SparkSession, sf: float = 1.0) -> DataFrame:
    return spark.createDataFrame(
        REGION_ROWS, "r_regionkey int, r_name string, r_comment string"
    )


def nation(spark: SparkSession, sf: float = 1.0) -> DataFrame:
    rows = [
        (k, n, r, " ".join(_WORDS[(k + i) % len(_WORDS)] for i in range(8)))
        for k, n, r in NATION_ROWS
    ]
    return spark.createDataFrame(
        rows, "n_nationkey int, n_name string, n_regionkey int, n_comment string"
    )


def customer(spark: SparkSession, sf: float = 1.0) -> DataFrame:
    n = max(1, int(150_000 * sf))
    c = F.col("id") + 1
    return spark.range(n).select(
        c.alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(c.cast("string"), 9, "0")).alias(
            "c_name"
        ),
        F.concat(F.lit("addr "), F.substring(F.md5(c.cast("string")), 1, 16)).alias(
            "c_address"
        ),
        _r("c_nat", c, 0, 24).cast("int").alias("c_nationkey"),
        _phone("c_phone", c, _r("c_nat", c, 0, 24)).alias("c_phone"),
        _money(_r("c_bal", c, -99999, 999999)).alias("c_acctbal"),
        _pick("c_seg", c, _SEGMENTS).alias("c_mktsegment"),
        _words("c_cmt", c, 8).alias("c_comment"),
    )


def supplier(spark: SparkSession, sf: float = 1.0) -> DataFrame:
    n = max(1, int(10_000 * sf))
    s = F.col("id") + 1
    return spark.range(n).select(
        s.alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(s.cast("string"), 9, "0")).alias(
            "s_name"
        ),
        F.concat(F.lit("addr "), F.substring(F.md5(s.cast("string")), 1, 16)).alias(
            "s_address"
        ),
        _r("s_nat", s, 0, 24).cast("int").alias("s_nationkey"),
        _phone("s_phone", s, _r("s_nat", s, 0, 24)).alias("s_phone"),
        _money(_r("s_bal", s, -99999, 999999)).alias("s_acctbal"),
        _words("s_cmt", s, 10).alias("s_comment"),
    )


def _retailprice_cents(partkey):
    # spec 4.2.3: (90000 + ((partkey/10) mod 20001) + 100*(partkey mod 1000))
    return (
        F.lit(90000)
        + F.pmod((partkey / 10).cast("long"), F.lit(20001))
        + 100 * F.pmod(partkey, F.lit(1000))
    )


def part(spark: SparkSession, sf: float = 1.0) -> DataFrame:
    n = max(1, int(200_000 * sf))
    p = F.col("id") + 1
    m = _r("p_mfgr", p, 1, 5)
    return spark.range(n).select(
        p.alias("p_partkey"),
        _words("p_name", p, 5).alias("p_name"),
        F.concat(F.lit("Manufacturer#"), m.cast("string")).alias("p_mfgr"),
        F.concat(
            F.lit("Brand#"), m.cast("string"),
            _r("p_brand", p, 1, 5).cast("string"),
        ).alias("p_brand"),
        F.concat_ws(
            " ", _pick("p_t1", p, _TYPES1), _pick("p_t2", p, _TYPES2),
            _pick("p_t3", p, _TYPES3),
        ).alias("p_type"),
        _r("p_size", p, 1, 50).cast("int").alias("p_size"),
        F.concat_ws(
            " ", _pick("p_c1", p, _CONTAINERS1), _pick("p_c2", p, _CONTAINERS2)
        ).alias("p_container"),
        _money(_retailprice_cents(p)).alias("p_retailprice"),
        _words("p_cmt", p, 5).alias("p_comment"),
    )


def partsupp(spark: SparkSession, sf: float = 1.0) -> DataFrame:
    nparts = max(1, int(200_000 * sf))
    nsupp = max(1, int(10_000 * sf))
    base = spark.range(nparts).select((F.col("id") + 1).alias("pk"))
    exploded = base.select(
        "pk", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    )
    pk, i, s = F.col("pk"), F.col("i"), F.lit(nsupp)
    # spec 4.2.3 supplier spread formula
    suppkey = (
        F.pmod(
            pk + i * (s / 4 + (pk - 1) / s).cast("long"), s
        )
        + 1
    )
    return exploded.select(
        pk.alias("ps_partkey"),
        suppkey.cast("long").alias("ps_suppkey"),
        _r("ps_qty", pk * 4 + i, 1, 9999).cast("int").alias("ps_availqty"),
        _money(_r("ps_cost", pk * 4 + i, 100, 100000)).alias("ps_supplycost"),
        _words("ps_cmt", pk * 4 + i, 12).alias("ps_comment"),
    )


# --- orders / lineitem: shared hash streams ---------------------------------


def _sparse_orderkey(i):
    # 8 keys per 32-block (spec: sparse O_ORDERKEY over 4x the range)
    return ((i / 8).cast("long") * 32 + F.pmod(i, F.lit(8)) + 1).cast("long")


def _odate_off(okey):
    return _r("o_date", okey, 0, _ODATE_DAYS)


def _line_count(okey):
    return _r("l_cnt", okey, 1, 7)


def _ship_off(okey, ln):
    return _r("l_ship", okey * 8 + ln, 1, 121)


def _receipt_off(okey, ln):
    return _r("l_rcpt", okey * 8 + ln, 1, 30)


def _qty(okey, ln):
    return _r("l_qty", okey * 8 + ln, 1, 50)


def _partkey(okey, ln, nparts):
    return _r("l_part", okey * 8 + ln, 1, nparts)


def _disc_pct(okey, ln):
    return _r("l_disc", okey * 8 + ln, 0, 10)


def _tax_pct(okey, ln):
    return _r("l_tax", okey * 8 + ln, 0, 8)


def _extprice_cents(okey, ln, nparts):
    return _qty(okey, ln) * _retailprice_cents(_partkey(okey, ln, nparts))


def orders(spark: SparkSession, sf: float = 1.0) -> DataFrame:
    n = max(1, int(1_500_000 * sf))
    ncust = max(1, int(150_000 * sf))
    i = F.col("id")
    okey = _sparse_orderkey(i)
    # customers ≡ 0 (mod 3) place no orders (spec)
    rawc = _r("o_cust", okey, 1, max(ncust - 1, 1))
    ckey = F.when(F.pmod(rawc, F.lit(3)) == 0, rawc + 1).otherwise(rawc)
    odate = F.date_add(
        F.to_date(F.lit("1992-01-01")), _odate_off(okey).cast("int")
    )
    lines = F.sequence(F.lit(1), _line_count(okey).cast("int"))
    current = F.to_date(F.lit("1995-06-17"))
    shipped = F.transform(
        lines,
        lambda ln: F.date_add(
            F.to_date(F.lit("1992-01-01")),
            (_odate_off(okey) + _ship_off(okey, ln.cast("long"))).cast("int"),
        )
        <= current,
    )
    all_shipped = F.forall(shipped, lambda x: x)
    none_shipped = F.forall(shipped, lambda x: ~x)
    status = (
        F.when(all_shipped, "F").when(none_shipped, "O").otherwise("P")
    )
    nparts = max(1, int(200_000 * sf))
    total_cents = F.aggregate(
        lines,
        F.lit(0).cast("decimal(20,0)"),
        lambda acc, ln: (
            acc
            + (
                _extprice_cents(okey, ln.cast("long"), nparts)
                * (100 - _disc_pct(okey, ln.cast("long")))
                * (100 + _tax_pct(okey, ln.cast("long")))
                / 10000
            ).cast("decimal(20,0)")
        ).cast("decimal(20,0)"),
    )
    return spark.range(n).select(
        okey.alias("o_orderkey"),
        ckey.alias("o_custkey"),
        status.alias("o_orderstatus"),
        (total_cents / 100).cast("decimal(15,2)").alias("o_totalprice"),
        odate.alias("o_orderdate"),
        _pick("o_pri", okey, _PRIORITIES).alias("o_orderpriority"),
        F.concat(
            F.lit("Clerk#"),
            F.lpad(_r("o_clerk", okey, 1, max(int(1000 * sf), 1)).cast("string"), 9, "0"),
        ).alias("o_clerk"),
        F.lit(0).alias("o_shippriority"),
        _words("o_cmt", okey, 8).alias("o_comment"),
    )


def lineitem(spark: SparkSession, sf: float = 1.0) -> DataFrame:
    n = max(1, int(1_500_000 * sf))
    nparts = max(1, int(200_000 * sf))
    nsupp = max(1, int(10_000 * sf))
    i = F.col("id")
    okey = _sparse_orderkey(i)
    base = spark.range(n).select(
        okey.alias("okey"),
        F.explode(F.sequence(F.lit(1), _line_count(okey).cast("int"))).alias(
            "ln"
        ),
    )
    okey, ln = F.col("okey"), F.col("ln").cast("long")
    pkey = _partkey(okey, ln, nparts)
    s = F.lit(nsupp)
    i4 = _r("l_supp", okey * 8 + ln, 0, 3)
    skey = F.pmod(pkey + i4 * (s / 4 + (pkey - 1) / s).cast("long"), s) + 1
    shipdate = F.date_add(
        F.to_date(F.lit("1992-01-01")),
        (_odate_off(okey) + _ship_off(okey, ln)).cast("int"),
    )
    commitdate = F.date_add(
        F.to_date(F.lit("1992-01-01")),
        (_odate_off(okey) + _r("l_commit", okey * 8 + ln, 30, 90)).cast("int"),
    )
    receiptdate = F.date_add(shipdate, _receipt_off(okey, ln).cast("int"))
    current = F.to_date(F.lit("1995-06-17"))
    returnflag = F.when(
        receiptdate <= current, _pick("l_rf", okey * 8 + ln, ["R", "A"])
    ).otherwise(F.lit("N"))
    linestatus = F.when(shipdate > current, "O").otherwise("F")
    ext_cents = _extprice_cents(okey, ln, nparts)
    return base.select(
        okey.alias("l_orderkey"),
        pkey.alias("l_partkey"),
        skey.cast("long").alias("l_suppkey"),
        F.col("ln").cast("int").alias("l_linenumber"),
        _qty(okey, ln).alias("l_quantity"),
        _money(ext_cents).alias("l_extendedprice"),
        (_disc_pct(okey, ln).cast("decimal(15,2)") / 100)
        .cast("decimal(15,2)")
        .alias("l_discount"),
        (_tax_pct(okey, ln).cast("decimal(15,2)") / 100)
        .cast("decimal(15,2)")
        .alias("l_tax"),
        returnflag.alias("l_returnflag"),
        linestatus.alias("l_linestatus"),
        shipdate.alias("l_shipdate"),
        commitdate.alias("l_commitdate"),
        receiptdate.alias("l_receiptdate"),
        _pick("l_inst", okey * 8 + ln, _INSTRUCTS).alias("l_shipinstruct"),
        _pick("l_mode", okey * 8 + ln, _MODES).alias("l_shipmode"),
        _words("l_cmt", okey * 8 + ln, 4).alias("l_comment"),
    )


TABLES = {
    "region": region,
    "nation": nation,
    "customer": customer,
    "supplier": supplier,
    "part": part,
    "partsupp": partsupp,
    "orders": orders,
    "lineitem": lineitem,
}


def gen_table(spark: SparkSession, name: str, sf: float = 1.0) -> DataFrame:
    try:
        fn = TABLES[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown tpch_gen table {name!r}; expected one of {sorted(TABLES)}"
        ) from None
    return fn(spark, sf)
