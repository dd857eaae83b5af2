"""Property-based invariant for the catalog-routed lifecycle (r13):
under ANY random sequence of catalog operations — append, COW
DELETE/UPDATE, OPTIMIZE, ALTER ADD/RENAME COLUMN, VACUUM — the table
read through the catalog pointer must equal a driver-side shadow model,
after EVERY step. Every mutation publishes through optimistic
commitTable against the live loopback emulator; nothing touches the
filesystem version hint."""

import os
import threading

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glaredb_spark.sources import iceberg_rest as rest
from glaredb_spark.sources.iceberg_native import (
    _metadata_path,
    write_iceberg_native,
)
from glaredb_spark.sources.iceberg_rest_emulator import IcebergRestEmulator

op = st.one_of(
    st.tuples(st.just("append"),
              st.integers(min_value=1, max_value=5)),
    st.tuples(st.just("delete"),
              st.integers(min_value=2, max_value=5)),
    st.tuples(st.just("update"),
              st.integers(min_value=1, max_value=9)),
    st.tuples(st.just("optimize"), st.none()),
    st.tuples(st.just("vacuum"), st.none()),
    st.tuples(st.just("add_column"), st.none()),
    st.tuples(st.just("rename"), st.none()),
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=st.lists(op, min_size=1, max_size=5))
def test_catalog_lifecycle_matches_shadow(spark, tmp_path_factory, ops):
    base = str(tmp_path_factory.mktemp("catprop"))
    emu = IcebergRestEmulator(os.path.join(base, "wh"), prefix="w1")
    endpoint = emu.start()
    try:
        loc = os.path.join(base, "wh", "m", "t")
        write_iceberg_native(
            spark.range(10).selectExpr("id", "id * 2 AS v").coalesce(1),
            loc, format_version=2,
        )
        emu.add_namespace("m")
        emu.register("m", "t", _metadata_path(loc))
        # shadow model: id -> {col: value}
        shadow = {i: {"id": i, "v": i * 2} for i in range(10)}
        cols = ["id", "v"]
        next_id = 100
        vcol = "v"
        for step, (kind, arg) in enumerate(ops, start=1):
            if kind == "append":
                new = list(range(next_id, next_id + arg))
                next_id += arg
                ddl = ", ".join(
                    f"{c} string" if c == "note" else f"{c} long"
                    for c in cols
                )
                df = spark.createDataFrame(
                    [tuple(i if c == "id" else
                           (i * 2 if c == vcol else None)
                           for c in cols) for i in new],
                    ddl,
                )
                rest.append_table(spark, endpoint, "m", "t", df)
                for i in new:
                    shadow[i] = {
                        c: (i if c == "id" else
                            (i * 2 if c == vcol else None))
                        for c in cols
                    }
            elif kind == "delete":
                rest.delete_table_rows(
                    spark, endpoint, "m", "t", f"id % {arg} = 1",
                    strategy="cow",
                )
                shadow = {i: r for i, r in shadow.items()
                          if i % arg != 1}
            elif kind == "update":
                rest.update_table_rows(
                    spark, endpoint, "m", "t",
                    {vcol: f"{vcol} + {arg}"}, f"id % 3 = 0",
                    strategy="cow",
                )
                for i, r in shadow.items():
                    if i % 3 == 0 and r[vcol] is not None:
                        r[vcol] = r[vcol] + arg
            elif kind == "optimize":
                rest.optimize_table(spark, endpoint, "m", "t")
            elif kind == "vacuum":
                rest.vacuum_table(
                    spark, endpoint, "m", "t", retention_hours=0.0,
                )
            elif kind == "add_column" and "note" not in cols:
                rest.alter_add_column(endpoint, "m", "t", "note",
                                      "string")
                cols.append("note")
                for r in shadow.values():
                    r["note"] = None
            elif kind == "rename" and vcol == "v":
                rest.alter_rename_column(endpoint, "m", "t", "v", "val")
                # DML on a dirty renamed table is refused by contract
                # until OPTIMIZE physically normalizes the files —
                # normalize through the catalog, exercising the
                # selective rewrite on the routed path
                rest.optimize_table(spark, endpoint, "m", "t")
                vcol = "val"
                cols[cols.index("v")] = "val"
                for r in shadow.values():
                    r["val"] = r.pop("v")
            got = sorted(
                tuple(row[c] for c in cols)
                for row in rest.read_table(
                    spark, endpoint, "m", "t"
                ).select(*cols).collect()
            )
            want = sorted(
                tuple(r[c] for c in cols) for r in shadow.values()
            )
            assert got == want, (
                f"diverged after step {step} ({kind} {arg!r})"
            )
    finally:
        emu.stop()
        rest._PREFIX_CACHE.clear()
