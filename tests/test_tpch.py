"""TPC-H q01–q22 parity vs the DuckDB oracle (driver-gate mirror).

Runs at sf0.001 by default for speed; the full sf0.01 sweep (what the
driver actually runs) is in test_oracle_parity.py.
"""

import pytest

from tests.oracle import assert_parity

TPCH = [f"tpch_q{i:02d}" for i in range(1, 23)]


@pytest.mark.parametrize("name", TPCH)
def test_tpch_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)
