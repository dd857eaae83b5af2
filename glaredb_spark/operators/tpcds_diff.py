"""Driver-gate row over the TPC-DS DIFFERENTIAL dataset (r14).

The r13 differential (tests/test_tpcds_differential.py) value-checks all
99 TPC-DS queries against DuckDB locally; this module promotes one of
them into the driver's 50-row correctness gate so the rotation
exercises the FK-correlated fixture (glaredb_spark/tpcds_data.py)
end-to-end under the external DuckDB oracle every round.

q88 is the pick: an 8-way cross join of half-hour time-band counts over
store_sales x household_demographics x time_dim x store — it exercises
the fixture's time_dim minute grid, the enumerated household
dep/vehicle combos, and the 'ese' store-name pool in one deterministic
1-row/8-column result that can never be vacuously empty. Reference
anchor: slt/tpcds/q88.slt (query text read at import, never vendored —
the same contract as the SLT conformance harness).

Scale: each band is a filter + broadcast-dim hash join + partial count
— at 100 TB the eight scans share one shuffle-free store_sales pass
under common-subexpression reuse, and the dims broadcast.
"""

from __future__ import annotations

import os
import tempfile

from glaredb_spark.registry import register_query

_GATE_ROOT = os.path.join(tempfile.gettempdir(), "glaredb_tpcds_gate")
_Q88_TABLES = ("store_sales", "household_demographics", "time_dim",
               "store")
_Q88_FILE = "/root/reference/slt/tpcds/q88.slt"


def _gate_tables() -> dict:
    from glaredb_spark.tpcds_data import ensure

    return ensure(_GATE_ROOT)


def _q88_sql() -> str:
    from glaredb_spark.slt import parse_slt

    with open(_Q88_FILE) as fh:
        recs = [r for r in parse_slt(fh.read()) if r.kind == "query"]
    sql = recs[0].sql.strip().rstrip(";")
    if sql.upper().startswith("DESCRIBE"):
        sql = sql[len("DESCRIBE"):].strip()
    return sql


# generated at import so the ORACLE string can embed the parquet paths:
# the driver may run the DuckDB side before the Spark side, so the
# files must exist before either does. ensure() is content-cached —
# this costs ~7 s once per machine, ~2 ms after.
_PATHS = _gate_tables()
_SQL = _q88_sql()
_ORACLE = (
    "WITH "
    + ",\n     ".join(
        f"{t} AS (SELECT * FROM read_parquet('{_PATHS[t]}'))"
        for t in _Q88_TABLES
    )
    + "\n"
    + _SQL
)


@register_query("tpcds_diff_q88", oracle=_ORACLE)
def tpcds_diff_q88(spark, sf_dir):
    """TPC-DS q88 verbatim on the differential fixture: Spark runs the
    reference's own query text (through the SLT dialect rewriter, the
    same path the 99-query differential uses); DuckDB runs it against
    the identical parquet via the CTE-shadowed oracle."""
    from glaredb_spark.session import GlareSession
    from glaredb_spark.slt import rewrite_sql

    paths = _gate_tables()
    for t in _Q88_TABLES:
        spark.read.parquet(paths[t]).createOrReplaceTempView(t)
    s_sql = rewrite_sql("DESCRIBE " + _SQL,
                        base_dir="/root/reference/slt")
    if s_sql.upper().startswith("DESCRIBE"):
        s_sql = s_sql[len("DESCRIBE"):].strip()
    return GlareSession(spark).sql(s_sql)
