import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Full-suite single-process runs (~1,400 tests, one shared JVM session)
# have been observed to die with CPython 3.11's "AST constructor
# recursion depth mismatch" SystemError: a RecursionError raised inside
# compile() corrupts the compiler's recursion bookkeeping, and pytest's
# FAILURE-REPORT rendering (ast.parse of the test source) then crashes
# the whole run — masking which test actually failed. Headroom over the
# default 1000 keeps marginal deep-recursion paths (py4j error chains,
# pytest assertion rendering over very long literal lines) from tripping
# the bug, so a failing test reports as a failing test.
sys.setrecursionlimit(max(10_000, sys.getrecursionlimit()))

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from glaredb_spark.session import get_spark
    from glaredb_spark.functions.register import register_all

    s = get_spark(master="local[8]", app_name="glaredb_spark_tests")
    register_all(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return SF_ORACLE
