"""Full driver-gate mirror: every registered query with an oracle is run at
the local fixture scale (sf0.001 — the driver runs the same comparison at
sf0.01) and compared bit-exactly.

Slow (~2-3 min for the whole suite) — this is the main correctness gate.
"""

import pytest

from glaredb_spark.registry import ORACLES, QUERIES, load_all
from tests.oracle import assert_parity

load_all()
NON_TPCH = sorted(n for n in QUERIES if not n.startswith("tpch_"))


@pytest.mark.parametrize("name", NON_TPCH)
def test_parity_sf001(spark, sf_dir, name):
    """All non-TPC-H queries at sf0.001 (TPC-H covered in test_tpch)."""
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver's
    else:
        assert_parity(spark, name, sf_dir)
