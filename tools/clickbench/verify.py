#!/usr/bin/env python3
"""Verify the synthesized ClickBench fixture against the reference SLT
goldens using DuckDB (fast iteration loop; the real gate is the Spark SLT
harness). Usage: python tools/clickbench/verify.py [single|partitioned]
"""
import math
import os
import re
import sys

sys.path.insert(0, "/root/repo")

SUITE = sys.argv[1] if len(sys.argv) > 1 else "single"
SLT_DIR = f"/root/reference/slt/clickbench/{SUITE}"
ROOT = "/root/repo/tests/fixtures/clickbench_slt"


def load_records(path):
    """Yield (sql, golden_lines, ordered) for value-query records."""
    lines = open(path).read().splitlines()
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("query"):
            rowsort = "rowsort" in ln
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i] != "----":
                sql_lines.append(lines[i])
                i += 1
            i += 1  # skip ----
            golden = []
            while i < len(lines) and lines[i].strip():
                golden.append(lines[i])
                i += 1
            sql = " ".join(sql_lines).strip().rstrip(";")
            if sql.upper().startswith("DESCRIBE"):
                continue
            ordered = (not rowsort) and bool(
                re.search(r"\bORDER\s+BY\b", sql, re.I))
            yield sql, golden, ordered
        else:
            i += 1


def translate(sql):
    # epoch(bigint) → DuckDB to_timestamp returns TIMESTAMPTZ; cast back
    sql = re.sub(r"\bepoch\(EventTime\)",
                 "CAST(to_timestamp(EventTime) AT TIME ZONE 'UTC' AS TIMESTAMP)",
                 sql, flags=re.I)
    sql = re.sub(r"\boctet_length\(", "strlen(", sql, flags=re.I)
    return sql


def values_match(e, a):
    if e == a:
        return True
    if e == "(empty)" and a == "":
        return True
    try:
        ef, af = float(e), float(a)
        return math.isclose(ef, af, rel_tol=1e-5, abs_tol=1e-12)
    except ValueError:
        return False


def fmt(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    import datetime
    if isinstance(v, datetime.datetime):
        s = str(v)
        return s[:-3].rstrip(":. ") if s.endswith(":00") else s
    s = str(v)
    return s if s else "(empty)"


def main():
    import duckdb

    from glaredb_spark import clickbench_fixture as cf

    if SUITE == "single":
        p = cf.ensure_single(ROOT)
        view = (f"CREATE VIEW hits AS SELECT * REPLACE "
                f"(DATE '1970-01-01' + CAST(EventDate AS INT) AS EventDate) "
                f"FROM read_parquet('{p}')")
    else:
        paths = cf.ensure_partitioned(ROOT)
        repl = ["DATE '1970-01-01' + CAST(EventDate AS INT) AS EventDate"] + [
            f"decode({c}) AS {c}" for c, k in cf.SCHEMA if k == "str"]
        view = (f"CREATE VIEW hits AS SELECT * REPLACE ({', '.join(repl)}) "
                f"FROM read_parquet('{os.path.dirname(paths[0])}/*.parquet')")
    con = duckdb.connect()
    con.execute(view)

    n_ok = n_bad = 0
    for fname in sorted(os.listdir(SLT_DIR)):
        if not fname.endswith(".slt") or fname == "describe.slt":
            continue
        for sql, golden, ordered in load_records(os.path.join(SLT_DIR, fname)):
            try:
                rows = con.execute(translate(sql)).fetchall()
            except Exception as exc:  # noqa: BLE001
                print(f"{fname}: EXEC ERROR {exc}\n  {sql[:200]}")
                n_bad += 1
                continue
            actual = [[fmt(v) for v in row] for row in rows]
            expected = [g.split() for g in golden]
            acts = [" ".join(r).split() for r in actual]
            if not ordered:
                acts.sort()
                expected.sort()
            ok = len(acts) == len(expected)
            if ok:
                for er, ar in zip(expected, acts):
                    if len(er) != len(ar) or not all(
                            values_match(e, a) for e, a in zip(er, ar)):
                        ok = False
                        break
            if ok:
                n_ok += 1
            else:
                n_bad += 1
                print(f"{fname}: MISMATCH  {sql[:150]}")
                for i, (er, ar) in enumerate(zip(expected, acts)):
                    if er != ar:
                        print(f"  row{i} exp={er}")
                        print(f"  row{i} act={ar}")
                        if i > 6:
                            break
                if len(expected) != len(acts):
                    print(f"  rowcount exp={len(expected)} act={len(acts)}")
                    for r in acts[:5]:
                        print(f"    act: {r}")
    print(f"\n{SUITE}: {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
