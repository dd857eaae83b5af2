"""Property-based invariant for incremental MV maintenance: under ANY
random sequence of upstream DML (inserts, predicate updates, predicate
deletes), consuming the change feed batch-by-batch into the aggregate
maintainer must leave the MV equal to a from-scratch GROUP BY recompute
of the upstream state — after EVERY step, not just at the end.

Drives the foreachBatch writer directly over table_changes_delta_native
chunks (the streaming-engine plumbing around the same composition is
covered by tests/test_streaming_incremental.py end-to-end)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

op = st.one_of(
    st.tuples(
        st.just("insert"),
        st.lists(
            st.tuples(
                st.integers(min_value=100, max_value=130),  # id
                st.integers(min_value=0, max_value=3),      # group
                st.integers(min_value=-50, max_value=50),   # v
            ),
            min_size=1, max_size=4, unique_by=lambda t: t[0],
        ),
    ),
    st.tuples(
        st.just("update"),
        st.builds(
            lambda col, m: f"{col} % {m} = 0",
            st.sampled_from(["id", "v"]),
            st.integers(min_value=2, max_value=5),
        ),
    ),
    st.tuples(
        st.just("delete"),
        st.one_of(
            st.builds(lambda m: f"id % {m} = 1",
                      st.integers(min_value=2, max_value=5)),
            st.builds(lambda g: f"g = 'g{g}'",
                      st.integers(min_value=0, max_value=3)),
        ),
    ),
)


def _expected(spark, up):
    from glaredb_spark.sources.delta_native import read_delta_native

    return sorted(
        (r["g"], r["total"], r["n_rows"])
        for r in read_delta_native(spark, up).groupBy("g").agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
        ).collect()
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=st.lists(op, min_size=1, max_size=4))
def test_mv_equals_recompute_under_random_dml(spark, tmp_path_factory,
                                              ops):
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        read_delta_native,
        table_changes_delta_native,
        update_delta_native,
        write_delta_native,
        _latest_version,
    )
    import os

    from glaredb_spark.streaming.incremental import delta_mv_writer

    base = str(tmp_path_factory.mktemp("mvprop"))
    up, mv = os.path.join(base, "up"), os.path.join(base, "mv")
    rows = [(i, "g%d" % (i % 4), i * 3 - 10) for i in range(12)]
    write_delta_native(
        spark.createDataFrame(rows, "id long, g string, v long"),
        up, enable_cdf=True,
    )
    w = delta_mv_writer(mv, "prop", ["g"], {"total": "v"})
    consumed = -1

    def drain(batch_id):
        nonlocal consumed
        latest = _latest_version(os.path.join(up, "_delta_log"))
        if latest is None or latest <= consumed:
            return
        w(table_changes_delta_native(spark, up, consumed + 1, latest),
          batch_id)
        consumed = latest

    drain(0)
    next_id = 1000  # distinct insert ids across steps
    for step, (kind, arg) in enumerate(ops, start=1):
        if kind == "insert":
            batch = [(next_id + i, f"g{g}", v)
                     for i, (_id, g, v) in enumerate(arg)]
            next_id += len(arg)
            write_delta_native(
                spark.createDataFrame(batch, "id long, g string, v long"),
                up, mode="append",
            )
        elif kind == "update":
            update_delta_native(spark, up, {"v": "v + 7"}, arg)
        else:
            delete_delta_native(spark, up, arg)
        drain(step)
        got = sorted(
            (r["g"], r["total"], r["n_rows"])
            for r in read_delta_native(spark, mv).collect()
        ) if os.path.isdir(os.path.join(mv, "_delta_log")) else []
        assert got == _expected(spark, up), (
            f"diverged after step {step} ({kind} {arg!r})"
        )


def _expected_minmax(spark, up):
    from glaredb_spark.sources.delta_native import read_delta_native

    return sorted(
        (r["g"], r["total"], r["n_rows"], r["v_min"], r["v_max"])
        for r in read_delta_native(spark, up).groupBy("g").agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        ).collect()
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=st.lists(op, min_size=1, max_size=4))
def test_mv_minmax_equals_recompute_under_random_dml(
    spark, tmp_path_factory, ops
):
    """MIN/MAX maintenance via bounded group re-scan (r13, VERDICT r12
    #4): MV == recompute after EVERY random DML step, extremes
    included — retractions of a group's extreme resolve through the
    semi-join re-aggregation, inserts through least/greatest."""
    from glaredb_spark.sources.delta_native import (
        delete_delta_native,
        read_delta_native,
        table_changes_delta_native,
        update_delta_native,
        write_delta_native,
        _latest_version,
    )
    import os

    from glaredb_spark.streaming.incremental import delta_mv_writer

    base = str(tmp_path_factory.mktemp("mvprop_mm"))
    up, mv = os.path.join(base, "up"), os.path.join(base, "mv")
    rows = [(i, "g%d" % (i % 4), i * 3 - 10) for i in range(12)]
    write_delta_native(
        spark.createDataFrame(rows, "id long, g string, v long"),
        up, enable_cdf=True,
    )
    w = delta_mv_writer(
        mv, "propmm", ["g"], {"total": "v"},
        mins={"v_min": "v"}, maxs={"v_max": "v"},
        upstream_fn=lambda s: read_delta_native(s, up),
    )
    consumed = -1

    def drain(batch_id):
        nonlocal consumed
        latest = _latest_version(os.path.join(up, "_delta_log"))
        if latest is None or latest <= consumed:
            return
        w(table_changes_delta_native(spark, up, consumed + 1, latest),
          batch_id)
        consumed = latest

    drain(0)
    next_id = 1000
    for step, (kind, arg) in enumerate(ops, start=1):
        if kind == "insert":
            batch = [(next_id + i, f"g{g}", v)
                     for i, (_id, g, v) in enumerate(arg)]
            next_id += len(arg)
            write_delta_native(
                spark.createDataFrame(
                    batch, "id long, g string, v long"
                ),
                up, mode="append",
            )
        elif kind == "update":
            update_delta_native(spark, up, {"v": "v + 7"}, arg)
        else:
            delete_delta_native(spark, up, arg)
        drain(step)
        got = sorted(
            (r["g"], r["total"], r["n_rows"], r["v_min"], r["v_max"])
            for r in read_delta_native(spark, mv).collect()
        ) if os.path.isdir(os.path.join(mv, "_delta_log")) else []
        assert got == _expected_minmax(spark, up), (
            f"diverged after step {step} ({kind} {arg!r})"
        )
