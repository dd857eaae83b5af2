"""Parallelism sweep — the Spark analog of the reference's
run_with_all_thread_configurations (test_bin/integration_slt.rs:27-60):
identical results across shuffle-partition counts and with AQE off.

Exactness across partitioning is the point: the decimal/integer determinism
contract means results are bit-identical no matter how work is partitioned.
"""

import pytest

from glaredb_spark.registry import QUERIES, load_all
from tests.oracle import compare_frames

load_all()

SWEEP_QUERIES = ["tpch_q01", "tpch_q05", "tpch_q18", "dedup_minhash_lsh",
                 "events_sessionize", "knn_bruteforce_cosine"]


@pytest.mark.parametrize("name", SWEEP_QUERIES)
def test_results_stable_across_parallelism(spark, sf_dir, name):
    base = QUERIES[name](spark, sf_dir).toPandas()
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    orig_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        for parts, aqe in [("1", "true"), ("4", "false"), ("8", "true")]:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            got = QUERIES[name](spark, sf_dir).toPandas()
            errs = compare_frames(got, base)
            assert not errs, f"{name} parts={parts} aqe={aqe}: {errs}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)
        spark.conf.set("spark.sql.adaptive.enabled", orig_aqe)
