"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator/query from SURVEY.md §2 registers here with a
Spark builder and (where SQL-expressible) a DuckDB oracle SQL string. The
driver's correctness gate runs both sides at sf=0.01 and compares row count,
schema, and order-insensitive value hashes — so builders alias every computed
column to the same name the oracle uses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register_query(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder, with an
    optional DuckDB oracle SQL equivalent."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import glaredb_spark.tpch  # noqa: F401
    import glaredb_spark.operators.relational  # noqa: F401
    import glaredb_spark.operators.relational2  # noqa: F401
    import glaredb_spark.operators.dedup  # noqa: F401
    import glaredb_spark.operators.similarity  # noqa: F401
    import glaredb_spark.operators.text  # noqa: F401
    import glaredb_spark.operators.events  # noqa: F401
    import glaredb_spark.operators.multimodal  # noqa: F401
    import glaredb_spark.operators.analytics  # noqa: F401
    import glaredb_spark.operators.asof  # noqa: F401
    import glaredb_spark.operators.recursive  # noqa: F401
    import glaredb_spark.operators.clickbench  # noqa: F401
    import glaredb_spark.functions.queries  # noqa: F401
