#!/usr/bin/env python3
"""Driver simulation — run before round end.

Mimics the driver's verify exactly: a PLAIN SparkSession (none of the
engine's session defaults), entry() smoke check, then every queries()
entry at sf0.01 with its DuckDB oracle row count. The full value-hash
parity lives in tests/test_oracle_parity.py; this catches
plain-session-only failures (missing dynamic confs, timezone drift,
driver-session assumptions) that the pytest session would mask.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("driver_sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    print("entry rows:", df.count(), "cols:", len(df.columns))
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    print("queries:", len(qs), "oracles:", len(osql))

    import duckdb

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name, fn in qs.items():
        try:
            sn = fn(spark, sf).count()
            if name in osql:
                on = len(con.execute(osql[name]).fetchall())
                if sn != on:
                    bad.append((name, sn, on))
        except Exception as e:  # noqa: BLE001
            bad.append((name, "ERR", str(e)[:200]))
    print("row-count mismatches/errors:", bad if bad else "NONE")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
