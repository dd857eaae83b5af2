"""100 TB design checks: filter pushdown, column pruning, broadcast joins,
partial aggregation — asserted on the actual physical plans.

Reference analogs: scan-filter pushdown (optimizer/scan_filter.rs, consumed
at functions/table/scan.rs:41-42), column prune (optimizer/column_prune.rs),
parquet row-group pruning (row_group_pruner.rs:13-60).
"""

from glaredb_spark.plans import (
    formatted_plan,
    pushed_filters,
    query_profile,
    read_schema_columns,
)
from glaredb_spark.registry import QUERIES, load_all

load_all()


def test_q06_filters_pushed(spark, sf_dir):
    df = QUERIES["tpch_q06"](spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf


def test_q01_column_pruning(spark, sf_dir):
    df = QUERIES["tpch_q01"](spark, sf_dir)
    cols = set(read_schema_columns(df))
    assert "l_orderkey" not in cols  # unused column pruned from scan
    assert {"l_quantity", "l_extendedprice", "l_shipdate"} <= cols


def test_q01_partial_aggregation(spark, sf_dir):
    plan = formatted_plan(QUERIES["tpch_q01"](spark, sf_dir))
    # map-side combine: two HashAggregate passes around one exchange
    assert plan.count("HashAggregate") >= 2


def test_q05_broadcasts_small_dims(spark, sf_dir):
    prof = query_profile(QUERIES["tpch_q05"](spark, sf_dir))
    assert prof["broadcast_joins"] >= 1


def test_q03_topk_take_ordered(spark, sf_dir):
    plan = formatted_plan(QUERIES["tpch_q03"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # reference sort_limit_hint.rs


def test_wholestage_codegen_everywhere(spark, sf_dir):
    for q in ["tpch_q01", "tpch_q06", "text_token_stats"]:
        df = QUERIES[q](spark, sf_dir)
        df.collect()  # AQE marks codegen stages only in the final plan
        prof = query_profile(df)
        assert prof["wholestage_codegen"] >= 1, q


def test_r2_query_plan_shapes(spark, sf_dir):
    """r2 families keep the plan invariants: dims broadcast, filters pushed,
    aggregation partial, no stray corpus-wide exchanges."""
    import re

    from glaredb_spark.plans import formatted_plan
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    plan = formatted_plan(QUERIES["tpcds_rollup_rank"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2  # customer + nation dims
    assert re.search(r"PushedFilters: \[[^\]]", plan)

    plan = formatted_plan(QUERIES["cb_filter_agg"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") <= 1  # one agg shuffle
    assert "PushedFilters" in plan

    plan = formatted_plan(QUERIES["knn_ivf_cosine"](spark, sf_dir))
    # centroid/query/probe sides all broadcast — corpus never broadcast-builds
    assert plan.count("BroadcastExchange") >= 3
    # r15: fused MapInArrow score+local-top-k phase 1 (was MapInPandas)
    assert "MapInArrow" in plan  # two-phase top-k reduction present


def test_prefix_jaccard_plan_no_cartesian(spark, sf_dir):
    """Blocking keeps the candidate join an equi-join: no cartesian/BNLJ
    anywhere, verification joins are hash joins on ids."""
    from glaredb_spark.plans import formatted_plan
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    plan = formatted_plan(QUERIES["dedup_ngram_jaccard"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_no_full_scored_window_exchange(spark, sf_dir):
    """VERDICT r1 done-criterion: no single exchange keyed only by query_id
    carrying the full scored set — phase 1 reduces via mapInPandas before
    any exchange; the only query_id-keyed exchange carries k*P candidates
    (post-reduction), and no Window over query_id exists at all."""
    from glaredb_spark.plans import formatted_plan
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    plan = formatted_plan(QUERIES["knn_bruteforce_cosine"](spark, sf_dir))
    assert "Window" not in plan
    assert "MapInArrow" in plan  # r15 fused phase-1 kernel
    # the scored set is produced by a broadcast join (corpus not shuffled)
    assert "BroadcastExchange" in plan


def test_profile_table_functions(spark, sf_dir):
    """Reference profile TVFs (functions/table/builtin/profile.rs):
    planning_profile / optimizer_profile / execution_profile over the most
    recent recorded query, via the SQL surface."""
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    sess.register_tables(sf_dir)
    df = sess.sql("SELECT count(*) AS n FROM lineitem WHERE l_quantity > 10")
    df.collect()

    planning = {r.step: r for r in sess.sql("SELECT * FROM planning_profile()").collect()}
    assert {"analysis", "optimization", "planning"} <= set(planning)
    assert all(r.duration_seconds >= 0 for r in planning.values())

    rules = sess.sql(
        "SELECT rule, invocations FROM optimizer_profile()"
    ).collect()
    assert rules and all(r.invocations >= 1 for r in rules)

    execu = sess.sql(
        "SELECT operator, metric, value FROM execution_profile() "
        "WHERE metric = 'numOutputRows'"
    ).collect()
    assert execu, "executed plan must expose SQLMetrics"
    # the aggregate's single output row must appear among operator metrics
    assert any(r.value >= 1 for r in execu)

    # profile queries are not self-recorded: the target stays the user query
    again = sess.sql("SELECT count(*) AS n FROM planning_profile()").collect()
    assert again[0].n >= 3


def test_per_partition_counts_in_execution_profile(spark, sf_dir):
    """SET per_partition_counts (config/session.rs:12-21): when on,
    execution_profile() carries one ResultOutput row per output
    partition; RESET turns it back off."""
    from glaredb_spark.session import GlareSession

    sess = GlareSession(spark)
    sess.register_tables(sf_dir, ("nation",))
    try:
        sess.sql("SET per_partition_counts TO true")
        df = sess.sql(
            "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1"
        )
        df.collect()
        rows = sess.sql(
            "SELECT metric, value FROM execution_profile() "
            "WHERE operator = 'ResultOutput'"
        ).collect()
        assert rows, "per-partition rows must appear when the var is set"
        assert all(r.metric.startswith("partition_") for r in rows)
        assert sum(r.value for r in rows) == df.count()

        sess.sql("RESET per_partition_counts")
        df2 = sess.sql("SELECT count(*) AS n FROM nation")
        df2.collect()
        rows2 = sess.sql(
            "SELECT 1 FROM execution_profile() "
            "WHERE operator = 'ResultOutput'"
        ).collect()
        assert not rows2
    finally:
        sess.reset_session_vars()


def test_iceberg_changes_plan_bounded(spark, tmp_path):
    """r10 changelog plan audit: a MoR-upsert snapshot's change
    derivation (visible-before EXCEPT ALL visible-after over candidate
    files) must plan with NO cartesian product and a bounded join count
    — the delete side broadcasts, the diff is anti-join shaped."""
    from glaredb_spark.sources.iceberg_native import (
        changes_iceberg_native,
        upsert_iceberg_native,
    )

    p = str(tmp_path / "chplan")
    upsert_iceberg_native(
        spark, p,
        spark.createDataFrame([(i, f"v{i}") for i in range(200)],
                              "id long, v string"),
        on=["id"],
    )
    upsert_iceberg_native(
        spark, p,
        spark.createDataFrame([(i, f"w{i}") for i in range(100, 300)],
                              "id long, v string"),
        on=["id"],
    )
    df = changes_iceberg_native(spark, p, 2, 2)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "CartesianProduct" not in optimized
    assert "Join Cross" not in optimized
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
    # 100 overwritten keys -> 100 deletes; 200 batch rows -> inserts
    assert df.count() == 300
