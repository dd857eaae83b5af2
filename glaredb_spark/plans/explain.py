"""Plan inspection utilities — the Spark analog of GlareDB's EXPLAIN and
profile table functions (reference: explain/ module,
functions/table/builtin/profile.rs, optimized-plan capture
engine/session.rs:354-365).

Used by tests and by the 100 TB design review: every operator's plan is
checked for filter pushdown (PushedFilters reaching the parquet scan —
reference analog row_group_pruner.rs), column pruning (ReadSchema), partial
aggregation, and broadcast joins on schema-bounded dims.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def plan_has(df: DataFrame, *needles: str) -> bool:
    plan = formatted_plan(df)
    return all(n in plan for n in needles)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            inner = line.split(":", 1)[1].strip().strip("[]")
            if inner:
                out.extend(p.strip() for p in inner.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the parquet scan (pruning check)."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)
            if len(inner) == 2:
                body = inner[1].rsplit(">", 1)[0]
                cols.extend(f.split(":")[0] for f in body.split(",") if f)
    return cols


def query_profile(df: DataFrame) -> dict:
    """Summary counters over the physical plan (profile-table analog)."""
    plan = formatted_plan(df)
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "hash_aggregates": plan.count("HashAggregate"),
        # simple-mode plans mark codegen stages with "*(n)"; AQE's initial
        # formatted plan omits codegen ids
        "wholestage_codegen": simple_plan(df).count("*("),
        "scans": plan.count("Scan parquet"),
        "pushed_filters": pushed_filters(df),
    }
