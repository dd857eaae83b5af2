"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the ``glaredb_spark`` package (registry pattern —
see glaredb_spark/registry.py); this module just re-exports them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q01 pricing summary) on /root/testdata/sf0.001."""
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    return QUERIES["tpch_q01"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from glaredb_spark.registry import QUERIES, load_all, ordered_names

    load_all()
    return {n: QUERIES[n] for n in ordered_names()}


def oracle_sql() -> dict[str, str]:
    from glaredb_spark.registry import ORACLES, load_all, ordered_names

    load_all()
    return {n: ORACLES[n] for n in ordered_names() if n in ORACLES}
