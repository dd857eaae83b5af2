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


# ---------------------------------------------------------------------------
# Profile table functions (reference: functions/table/builtin/profile.rs —
# planning_profile / optimizer_profile / execution_profile, each over the
# most recent query or the nth / id'd one). Spark analogs: the
# QueryPlanningTracker phases (analysis/optimization/planning) play the
# planning steps, its per-rule summaries play the optimizer rules, and the
# executed plan's SQLMetrics play the operator execution counters.
# ---------------------------------------------------------------------------

_QUERY_LOG: dict[str, list] = {}  # applicationId -> [(query_id, DataFrame)]
_PER_PARTITION: dict[str, bool] = {}  # applicationId -> per_partition_counts


def set_per_partition_counts(spark, flag: bool) -> None:
    """SET per_partition_counts (config/session.rs:12-21): when on,
    execution_profile() adds one row per output partition (GlareSession
    _apply_var wires the session variable here)."""
    _PER_PARTITION[spark.sparkContext.applicationId] = bool(flag)


def record_query(spark, df: DataFrame) -> str:
    """Log a query for the profile table functions (GlareSession.sql calls
    this; bounded history like the reference's profile buffer)."""
    import uuid

    key = spark.sparkContext.applicationId
    qid = str(uuid.uuid4())
    log = _QUERY_LOG.setdefault(key, [])
    log.append((qid, df))
    del log[:-20]
    return qid


def _profile_target(spark, arg=None):
    """(query_id, df) for the most recent query, the nth most recent
    (int), or a specific query id (str) — profile.rs signatures."""
    log = _QUERY_LOG.get(spark.sparkContext.applicationId, [])
    if not log:
        return None
    if arg is None or arg == "":
        return log[-1]
    if isinstance(arg, int) or (isinstance(arg, str) and arg.lstrip("-").isdigit()):
        n = int(arg)
        return log[-1 - n] if 0 <= n < len(log) else None
    return next(((q, d) for q, d in log if q == arg), None)


def _scala_map_items(jmap):
    it = jmap.iterator()
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2()


def planning_profile(spark, arg=None) -> DataFrame:
    """(query_id, step_order, step, duration_seconds) — planning phases
    from Spark's QueryPlanningTracker (profile.rs PlanningProfileTable)."""
    tgt = _profile_target(spark, arg)
    rows = []
    if tgt is not None:
        qid, df = tgt
        try:
            phases = df._jdf.queryExecution().tracker().phases()
            order = {"analysis": 0, "optimization": 1, "planning": 2}
            for name, summary in _scala_map_items(phases):
                dur = (summary.endTimeMs() - summary.startTimeMs()) / 1e3
                rows.append((qid, order.get(name, 9), str(name), float(dur)))
            rows.sort(key=lambda r: r[1])
        except Exception:  # noqa: BLE001 — jvm internals shifted
            pass
    return spark.createDataFrame(
        rows,
        "query_id string, step_order int, step string, duration_seconds double",
    )


def optimizer_profile(spark, arg=None) -> DataFrame:
    """(query_id, rule, total_seconds, invocations, effective_invocations)
    — per-rule Catalyst timings (profile.rs OptimizerProfileTable)."""
    tgt = _profile_target(spark, arg)
    rows = []
    if tgt is not None:
        qid, df = tgt
        try:
            rules = df._jdf.queryExecution().tracker().rules()
            for name, s in _scala_map_items(rules):
                rows.append(
                    (
                        qid,
                        str(name),
                        float(s.totalTimeNs()) / 1e9,
                        int(s.numInvocations()),
                        int(s.numEffectiveInvocations()),
                    )
                )
            rows.sort(key=lambda r: -r[2])
        except Exception:  # noqa: BLE001
            pass
    return spark.createDataFrame(
        rows,
        "query_id string, rule string, total_seconds double, "
        "invocations long, effective_invocations long",
    )


def execution_profile(spark, arg=None) -> DataFrame:
    """(query_id, operator_order, operator, metric, value) — SQLMetrics of
    the executed physical plan (profile.rs ExecutionProfileTable; values
    populate once the query has run)."""
    tgt = _profile_target(spark, arg)
    rows = []
    if tgt is not None:
        qid, df = tgt
        try:
            plan = df._jdf.queryExecution().executedPlan()
            stack, order = [(plan, 0)], 0
            while stack:
                node, depth = stack.pop()
                try:
                    for mname, metric in _scala_map_items(node.metrics()):
                        rows.append(
                            (
                                qid,
                                order,
                                str(node.nodeName()),
                                str(mname),
                                int(metric.value()),
                            )
                        )
                except Exception:  # noqa: BLE001
                    pass
                order += 1
                children = node.children()
                for i in range(children.length()):
                    stack.append((children.apply(i), depth + 1))
                # AQE wrappers hide the real plan outside children():
                # AdaptiveSparkPlanExec.executedPlan, QueryStageExec.plan,
                # InputAdapter/ReusedExchange via child
                for accessor in ("executedPlan", "plan"):
                    try:
                        inner = getattr(node, accessor)()
                        if inner is not None and inner.getClass().getName() != node.getClass().getName():
                            stack.append((inner, depth + 1))
                            break
                    except Exception:  # noqa: BLE001
                        continue
        except Exception:  # noqa: BLE001
            pass
        if _PER_PARTITION.get(spark.sparkContext.applicationId):
            # per_partition_counts (reference session var): one row per
            # output partition of the profiled query. This runs the query
            # once more with a partition-id aggregate — an explicit
            # profiling opt-in, exactly what the variable asks for.
            from pyspark.sql import functions as F

            pcounts = (
                df.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .orderBy("pid")
                .collect()
            )
            rows.extend(
                (qid, 10_000 + r["pid"], "ResultOutput",
                 f"partition_{r['pid']}_rows", int(r["count"]))
                for r in pcounts
            )
    return spark.createDataFrame(
        rows,
        "query_id string, operator_order int, operator string, "
        "metric string, value long",
    )
