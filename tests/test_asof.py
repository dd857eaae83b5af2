"""asof_join operator semantics: backward inclusive match, null on no
match, per-key isolation."""

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    from glaredb_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "L1"),
            (1, _ts("2024-01-01T12:00:00"), "L2"),
            (2, _ts("2024-01-01T09:00:00"), "L3"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "L4"),  # key with no right rows
        ],
        "k int, ts timestamp_ntz, lbl string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "R_eq"),   # equal ts → matches (<=)
            (1, _ts("2024-01-01T11:30:00"), "R_mid"),
            (2, _ts("2024-01-01T09:30:00"), "R_late"),
        ],
        "k int, ts timestamp_ntz, val string",
    )
    got = {
        r.lbl: (r.asof_val, r.asof_ts)
        for r in asof_join(left, right, on="k").collect()
    }
    assert got["L1"][0] == "R_eq"  # inclusive: equal timestamp matches
    assert got["L2"][0] == "R_mid"  # latest prior, not the first
    assert got["L3"] == (None, None)  # right row is in the future
    assert got["L4"] == (None, None)  # no right rows for key


def test_asof_join_single_shuffle(spark):
    """The plan must shuffle once on the key — no cross/range join."""
    from glaredb_spark.operators.asof import asof_join
    from glaredb_spark.plans import formatted_plan

    left = spark.range(10).select(
        F.col("id").alias("k"),
        F.timestamp_micros(F.col("id") * 1000000).cast("timestamp_ntz").alias("ts"),
    )
    right = left.withColumn("v", F.col("k") * 2)
    plan = formatted_plan(asof_join(left, right.select("k", "ts", "v"), on="k"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_asof_join_null_right_columns_carry_wholesale(spark):
    """ADVICE r1: when the latest right row has a NULL column, the output must
    keep that NULL — never back-fill the column from an OLDER right row."""
    from glaredb_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "L")],
        "k int, ts timestamp_ntz, lbl string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "old_val", 7),
            (1, _ts("2024-01-01T11:00:00"), None, None),  # latest: both NULL
        ],
        "k int, ts timestamp_ntz, val string, num int",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row.asof_ts == _ts("2024-01-01T11:00:00")
    assert row.asof_val is None  # not back-filled with "old_val"
    assert row.asof_num is None  # not back-filled with 7
