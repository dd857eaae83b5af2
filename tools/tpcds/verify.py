#!/usr/bin/env python3
"""Verify the synthesized TPC-DS micro-dataset against the reference SLT
goldens with DuckDB — both the 10 newly-filled files and the previously
allowlisted files whose goldens must STAY empty.
Usage: python tools/tpcds/verify.py
"""
import math
import os
import re
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/clickbench")

from verify import load_records, values_match, fmt  # noqa: E402

SLT_DIR = "/root/reference/slt/tpcds"
ROOT = "/root/repo/tests/fixtures/tpcds_slt"

# q14/q22 are excluded from the DuckDB cross-check only: DuckDB emits the
# ROLLUP grand-total row for empty input even with ALL tables empty (the
# reference and Spark both yield zero rows); verified not a fixture
# artifact. They stay in the Spark SLT allowlist where the real gate runs.
ALLOWLISTED = ["q01.slt", "q08.slt", "q09.slt", "q10.slt",
               "q21.slt", "q30.slt", "q37.slt", "q43.slt",
               "q59.slt", "q65.slt", "q69.slt", "q72.slt", "q74.slt",
               "q76.slt", "q78.slt", "q81.slt", "q82.slt"]


def main():
    import duckdb

    from glaredb_spark import tpcds_fixture as tf
    from glaredb_spark.sources.parquet_testing import (
        ensure_fixtures, tpcds_schemas,
    )

    paths = tf.ensure_tables(ROOT)
    empty_base = os.path.join(ensure_fixtures(), "testdata", "tpcds_sf0.1")
    con = duckdb.connect()
    # the reference's default null ordering (order_by_nulls.slt):
    # ASC → NULLS LAST, DESC → NULLS FIRST
    con.execute(
        "SET default_null_order='nulls_last_on_asc_first_on_desc'")
    for table in tpcds_schemas():
        p = paths.get(table, os.path.join(empty_base, f"{table}.parquet"))
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{p}')")

    n_ok = n_bad = 0
    for fname in tf.FILLED_FILES + ALLOWLISTED:
        for sql, golden, ordered in load_records(
                os.path.join(SLT_DIR, fname)):
            try:
                rows = con.execute(sql).fetchall()
            except Exception as exc:  # noqa: BLE001
                print(f"{fname}: EXEC ERROR {str(exc)[:200]}")
                n_bad += 1
                continue
            actual = [[fmt(v) for v in row] for row in rows]
            expected = [g.split() for g in golden]
            acts = [" ".join(r).split() for r in actual]
            if not ordered:
                acts.sort()
                expected.sort()
            ok = len(acts) == len(expected) and all(
                len(er) == len(ar)
                and all(values_match(e, a) for e, a in zip(er, ar))
                for er, ar in zip(expected, acts))
            if ok:
                n_ok += 1
            else:
                n_bad += 1
                print(f"{fname}: MISMATCH rows exp={len(expected)} "
                      f"act={len(acts)}  {sql[:110]}")
                for i, (er, ar) in enumerate(zip(expected, acts)):
                    if er != ar and not all(
                            values_match(e, a) for e, a in zip(er, ar)):
                        print(f"  row{i} exp={er[:12]}")
                        print(f"  row{i} act={ar[:12]}")
                        break
                if len(expected) != len(acts):
                    for r in acts[:4]:
                        print(f"    act: {r[:12]}")
    print(f"\ntpcds: {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
