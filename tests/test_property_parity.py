"""Property-based parity: randomly generated filter/aggregate queries must
produce identical results in Spark and DuckDB.

Exceeds the reference's test strategy (SURVEY.md §5: "No property-based/
randomized testing found"). The generated grammar stays inside the
cross-engine-deterministic subset: integer-valued doubles, DECIMAL(15,2)
sums, string equality, timestamp comparisons, AND/OR/NOT.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.oracle import compare_frames

SF = "/root/testdata/sf0.001"

num_pred = st.builds(
    lambda col, op, v: f"({col} {op} {v})",
    st.sampled_from(["l_quantity", "l_linenumber", "l_orderkey % 97"]),
    st.sampled_from(["<", "<=", ">", ">=", "="]),
    st.integers(min_value=0, max_value=60),
)
disc_pred = st.builds(
    lambda op, cents: f"(l_discount {op} 0.0{cents})",
    st.sampled_from(["<", ">", "<=", ">="]),
    st.integers(min_value=1, max_value=9),
)
str_pred = st.builds(
    lambda col, v: f"({col} = '{v}')",
    st.sampled_from(["l_returnflag", "l_linestatus"]),
    st.sampled_from(["A", "N", "R", "O", "F"]),
)
date_pred = st.builds(
    lambda y, m: f"(l_shipdate >= TIMESTAMP '{y}-{m:02d}-01 00:00:00')",
    st.integers(min_value=1995, max_value=2001),
    st.integers(min_value=1, max_value=12),
)
leaf = st.one_of(num_pred, disc_pred, str_pred, date_pred)


def combine(children):
    preds, ops = children
    out = preds[0]
    for p, op in zip(preds[1:], ops):
        out = f"({out} {op} {p})"
    return out


predicate = st.builds(
    combine,
    st.tuples(
        st.lists(leaf, min_size=1, max_size=4),
        st.lists(st.sampled_from(["AND", "OR"]), min_size=3, max_size=3),
    ),
)


def run_both(spark, where: str):
    sql = f"""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sq
        FROM lineitem
        WHERE {where}
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """
    spark_pdf = spark.sql(sql).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{SF}/lineitem.parquet')"
        )
        duck_pdf = con.execute(sql).fetch_df()
    finally:
        con.close()
    return spark_pdf, duck_pdf


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from glaredb_spark.sources.files import read_parquet

    read_parquet(spark, f"{SF}/lineitem.parquet").createOrReplaceTempView("lineitem")


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=predicate)
def test_random_filter_agg_parity(spark, where):
    spark_pdf, duck_pdf = run_both(spark, where)
    errs = compare_frames(spark_pdf, duck_pdf)
    assert not errs, f"WHERE {where}: {errs}"
