"""Value-level differential check of ALL 99 TPC-DS queries vs DuckDB.

The reference parks its tpcds suite: 68 of the 99 files carry EMPTY
goldens (its planner timed out before authoring them), so beyond the
golden-checked allowlist there is nothing to assert values against.
This module closes that gap differently: a deterministic, FK-correlated
dataset (glaredb_spark/tpcds_data.py — schema-exact from
describe_files.slt, calendar-true date_dim, returns referencing real
sale line items, filter-domain string pools) is loaded into BOTH this
engine and DuckDB, every query runs on both, and the VALUES must agree.

Comparison: ordered equality when the query's ORDER BY fully determines
the output; rows tied under the declared sort keys may legally differ
in order (q73 ties on (cnt, c_last_name)), so an ordered mismatch falls
back to sorted-multiset equality — the same set of rows in a tie-legal
order passes, a genuinely different result never does.
"""

import datetime
import decimal
import glob
import math
import os
import re

import pytest

TPCDS = "/root/reference/slt/tpcds"
QFILES = sorted(
    os.path.basename(f)
    for f in glob.glob(os.path.join(TPCDS, "q*.slt"))
)


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    import duckdb

    from glaredb_spark import GlareSession
    from glaredb_spark.tpcds_data import ensure

    root = str(tmp_path_factory.mktemp("tpcds_diff"))
    tables = ensure(root)
    con = duckdb.connect()
    for t, p in tables.items():
        spark.read.parquet(p).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    yield GlareSession(spark), con
    con.close()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def _close(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return a == b


def _rows_eq(a, b):
    return len(a) == len(b) and all(
        len(ra) == len(rb)
        and all(_close(x, y) for x, y in zip(ra, rb))
        for ra, rb in zip(a, b)
    )


def _key(r):
    return tuple((x is None, str(x)) for x in r)


@pytest.mark.parametrize("fname", QFILES)
def test_tpcds_values_match_duckdb(engines, fname):
    from glaredb_spark.slt import parse_slt, rewrite_sql

    sess, con = engines
    recs = [
        r for r in parse_slt(open(os.path.join(TPCDS, fname)).read())
        if r.kind == "query"
    ]
    assert recs, f"{fname} has no query record"
    sql = recs[0].sql.strip().rstrip(";")
    if sql.upper().startswith("DESCRIBE"):
        sql = sql[len("DESCRIBE"):].strip()
    duck = [tuple(_norm(v) for v in r) for r in con.sql(sql).fetchall()]
    s_sql = rewrite_sql("DESCRIBE " + sql, base_dir="/root/reference/slt")
    if s_sql.upper().startswith("DESCRIBE"):
        s_sql = s_sql[len("DESCRIBE"):].strip()
    ours = [
        tuple(_norm(v) for v in r) for r in sess.sql(s_sql).collect()
    ]
    if _rows_eq(ours, duck):
        return
    # tie-legal reordering under the declared sort keys: the same
    # multiset in a different order passes; different rows never do
    assert _rows_eq(
        sorted(ours, key=_key), sorted(duck, key=_key)
    ), f"{fname}: ours={len(ours)} rows, duckdb={len(duck)} rows"


def test_dataset_depth_floor(engines):
    """At least 97 of the 99 queries must return NON-EMPTY results on
    this dataset — a floor so future generator edits can't silently
    hollow the differential out into empty-vs-empty comparisons.
    (Current depth: 99/99 — r14 planted the deep-correlation cohorts
    the last 13 empties needed: q04's three-channel year-over-year
    growth, q23's best-customers chain, q64's two-purchase join,
    q39/q21/q72's inventory windows, q10/q54's cross-channel cohorts,
    q41/q49/q58/q85/q91's attribute-matched rows; see
    tpcds_data._plant. The floor sits at 97 so an incidental ±2 shift
    from unrelated generator edits fails softly while a hollowing-out
    still fails loudly.)"""
    from glaredb_spark.slt import parse_slt

    _sess, con = engines
    nonempty = 0
    for fname in QFILES:
        recs = [
            r
            for r in parse_slt(open(os.path.join(TPCDS, fname)).read())
            if r.kind == "query"
        ]
        sql = recs[0].sql.strip().rstrip(";")
        if sql.upper().startswith("DESCRIBE"):
            sql = sql[len("DESCRIBE"):].strip()
        if con.sql(sql).fetchall():
            nonempty += 1
    assert nonempty >= 97, f"dataset depth regressed: {nonempty}/99"


# --- pinned value goldens for the planted cohorts (r15, VERDICT r14 #5)
#
# The differential alone can't catch generator drift: both engines read
# the SAME parquet, so a _plant edit changes both sides identically and
# the diff still passes. These literal goldens — captured from the
# current seeded generator — make a cohort change fail with a DIFF.
# q04's four growth customers and q64's two cross-year purchase pairs
# exist ONLY because _plant constructs them.

_Q04_GOLDEN = [
    ("C_00000000000000", "James", "Smith", "Y"),
    ("C_00000000000001", "Mary", "Jones", "N"),
    ("C_00000000000002", "John", "Brown", "Y"),
    ("C_00000000000003", "Linda", "White", "Y"),
]

_Q64_GOLDEN = [
    ("name 26", "ese", "85392", "233", "name 9", "Oak Grove", "24128",
     "483", "name 29", "Fairview", "24128", 1999, 2, 60.0, 160.0, 0.0,
     30.0, 80.0, 0.0, 2000, 1),
    ("name 26", "ese", "85392", "521", "name 8", "Oak Grove", "81792",
     "866", "name 34", "Edgewood", "88274", 1999, 2, 850.78, 2266.16,
     1687.48, 30.0, 80.0, 0.0, 2000, 1),
]


@pytest.mark.parametrize(
    "fname,golden",
    [("q04.slt", _Q04_GOLDEN), ("q64.slt", _Q64_GOLDEN)],
)
def test_planted_cohort_goldens(engines, fname, golden):
    from glaredb_spark.slt import parse_slt

    _sess, con = engines
    recs = [
        r for r in parse_slt(open(os.path.join(TPCDS, fname)).read())
        if r.kind == "query"
    ]
    sql = recs[0].sql.strip().rstrip(";")
    if sql.upper().startswith("DESCRIBE"):
        sql = sql[len("DESCRIBE"):].strip()
    got = [tuple(_norm(v) for v in r) for r in con.sql(sql).fetchall()]
    assert _rows_eq(got, golden), (
        f"{fname} planted-cohort golden drifted: {got!r}"
    )
