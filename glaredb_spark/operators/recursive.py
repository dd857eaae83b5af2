"""Recursive CTE emulation — iterative DataFrame fixpoint loop.

The reference declares WITH RECURSIVE surface but stubs it
(crates/glaredb_core/src/logical/binder/bind_query/mod.rs:117 "recursive CTEs
not yet supported"); SURVEY.md §2.1 commits to shipping it Spark-side as an
iterative loop. Semantics follow SQL UNION (distinct) recursion exactly as
DuckDB implements it — semi-naive evaluation: the working table each
iteration is only the rows NOT already in the accumulated result, and the
fixpoint is reached when an iteration adds nothing.

Scale notes: each iteration is one distinct + one left_anti join + one
union — all shuffle on the row key with AQE sizing. `localCheckpoint`
truncates lineage every iteration, so the plan stays O(1) deep instead of
O(iterations) (the classic iterative-Spark blowup); materialized partitions
live in executor storage (MEMORY_AND_DISK deserialized), the same
per-iteration materialization a native engine's recursive CTE does. The
driver-side loop adds one tiny job per iteration for the emptiness probe —
inherent to any fixpoint evaluation, independent of data width.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    *,
    union_all: bool = False,
    max_iter: int = 100,
) -> DataFrame:
    """Evaluate ``WITH RECURSIVE r AS (base UNION [ALL] step(r)) SELECT * FROM r``.

    UNION (default): semi-naive — new rows are deduplicated and anti-joined
    against everything seen, terminating at the fixpoint. UNION ALL: rows
    accumulate verbatim; terminates when an iteration yields no rows or at
    max_iter (raises if the frontier is still non-empty then, mirroring a
    runaway-recursion guard).
    """
    cols = base.columns
    acc = (base if union_all else base.distinct()).localCheckpoint(eager=True)
    frontier = acc
    for _ in range(max_iter):
        new = step(frontier)
        if not union_all:
            new = new.distinct().join(acc, on=cols, how="left_anti")
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            return acc
        acc = acc.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    # max_iter exhausted — probe once more to distinguish convergence from runaway
    new = step(frontier)
    if not union_all:
        new = new.distinct().join(acc, on=cols, how="left_anti")
    if not new.isEmpty():
        raise RuntimeError(f"recursive_cte did not converge in {max_iter} iterations")
    return acc


# ---------------------------------------------------------------------------
# fixture query: transitive closure over an orders-derived edge table
# edge: o_custkey -> (o_custkey * 7) % 1000; seeds: custkeys <= 4
# ---------------------------------------------------------------------------
@register_query(
    "rel_recursive_cte",
    oracle="""
WITH RECURSIVE e AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST((o_custkey * 7) % 1000 AS BIGINT) AS dst
  FROM orders),
reach(node) AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS node FROM orders WHERE o_custkey <= 4
  UNION
  SELECT e.dst AS node FROM reach r JOIN e ON r.node = e.src)
SELECT node FROM reach ORDER BY node
""",
)
def rel_recursive_cte(spark, sf_dir):
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    edges = (
        orders.select(
            F.col("o_custkey").cast("long").alias("src"),
            ((F.col("o_custkey") * 7) % 1000).cast("long").alias("dst"),
        ).distinct()
    )
    seeds = (
        orders.filter(F.col("o_custkey") <= 4)
        .select(F.col("o_custkey").cast("long").alias("node"))
        .distinct()
    )
    closure = recursive_cte(
        seeds,
        lambda frontier: frontier.join(
            edges, frontier["node"] == edges["src"]
        ).select(F.col("dst").alias("node")),
    )
    return closure.orderBy("node")
