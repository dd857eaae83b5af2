"""Conditional matched-UPDATE in MERGE (r15, VERDICT r14 #2):
``WHEN MATCHED AND <cond> THEN UPDATE SET`` on both native writers,
composed with the existing delete/insert arms — the full delta-spark /
Iceberg-Spark MERGE clause surface (clause-order contract: DELETE wins
over UPDATE; rows failing every matched arm keep their values)."""

import pytest

from glaredb_spark.session import GlareSession
from glaredb_spark.sources.delta_native import (
    read_delta_native,
    write_delta_native,
)
from glaredb_spark.sources.iceberg_native import (
    read_iceberg_native,
    write_iceberg_native,
)


def _src(spark):
    # keys 0..3 match the target; 10 is new. v chosen so the update
    # condition (s.v > t.v) selects only ids 1 and 3.
    return spark.createDataFrame(
        [(0, -5), (1, 50), (2, 3), (3, 70), (10, 99)], "id bigint, v bigint"
    )


def _target(spark):
    return spark.range(5).selectExpr("id", "id * 10 AS v")


def _check(sess, spark, loc, reader):
    n = sess.sql(
        f"MERGE INTO '{loc}' t USING src s ON t.id = s.id "
        f"WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v "
        f"WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0].Count
    # 2 updated (ids 1, 3) + 1 inserted (10): matched rows failing the
    # condition (0, 2) keep their values and do NOT count
    assert n == 3
    got = {r.id: r.v for r in reader(spark, loc).collect()}
    assert got == {0: 0, 1: 50, 2: 20, 3: 70, 4: 40, 10: 99}


def test_conditional_update_iceberg_path(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_iceberg_native(_target(spark), loc)
    _src(spark).createOrReplaceTempView("src")
    _check(GlareSession(spark), spark, loc, read_iceberg_native)


def test_conditional_update_delta_path(spark, tmp_path):
    loc = str(tmp_path / "t")
    write_delta_native(_target(spark), loc)
    _src(spark).createOrReplaceTempView("src")
    _check(GlareSession(spark), spark, loc, read_delta_native)


@pytest.mark.parametrize("fmt", ["iceberg", "delta"])
def test_all_three_arms_composed(spark, tmp_path, fmt):
    """delete-cond + update-cond + insert-cond in one statement, any
    clause order; delete wins over update when both select a row."""
    loc = str(tmp_path / "t")
    writer = (
        write_iceberg_native if fmt == "iceberg" else write_delta_native
    )
    reader = read_iceberg_native if fmt == "iceberg" else read_delta_native
    writer(_target(spark), loc)
    spark.createDataFrame(
        # id=1: delete AND update conds both true -> deleted.
        # id=2: update cond only -> updated. id=3: neither -> kept.
        # id=10 passes the insert cond; id=11 fails it.
        [(1, 999), (2, 888), (3, -1), (10, 5), (11, -5)],
        "id bigint, v bigint",
    ).createOrReplaceTempView("src3")
    sess = GlareSession(spark)
    n = sess.sql(
        f"MERGE INTO '{loc}' t USING src3 s ON t.id = s.id "
        f"WHEN MATCHED AND s.v > 900 THEN DELETE "
        f"WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v "
        f"WHEN NOT MATCHED AND s.v > 0 THEN INSERT *"
    ).collect()[0].Count
    # affected matched = 2 (1 deleted, 2 updated; 3 untouched) + 1 insert
    assert n == 3
    got = {r.id: r.v for r in reader(spark, loc).collect()}
    assert got == {0: 0, 2: 888, 3: 30, 4: 40, 10: 5}


def test_unconditional_update_counts_unchanged(spark, tmp_path):
    """No update condition -> the r14 behavior (every matched row
    counts and rewrites) is untouched."""
    loc = str(tmp_path / "t")
    write_iceberg_native(_target(spark), loc)
    _src(spark).createOrReplaceTempView("src")
    n = GlareSession(spark).sql(
        f"MERGE INTO '{loc}' t USING src s ON t.id = s.id "
        f"WHEN MATCHED THEN UPDATE SET v = s.v "
        f"WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0].Count
    assert n == 5  # 4 matched + 1 inserted
    got = {r.id: r.v for r in read_iceberg_native(spark, loc).collect()}
    assert got == {0: -5, 1: 50, 2: 3, 3: 70, 4: 40, 10: 99}


def test_delta_cdf_images_respect_update_condition(spark, tmp_path):
    """CDF pre/post images only cover rows the gated update arm
    actually changed."""
    from glaredb_spark.sources.delta_native import (
        merge_delta_native,
        table_changes_delta_native,
    )

    loc = str(tmp_path / "t")
    write_delta_native(_target(spark), loc, enable_cdf=True)
    merge_delta_native(
        spark, loc, _src(spark), ["id"],
        when_matched_update={"v": "s.v"},
        when_matched_update_condition="s.v > t.v",
    )
    ch = table_changes_delta_native(spark, loc, 1, 1)
    pre = {
        r.id for r in ch.filter("_change_type = 'update_preimage'").collect()
    }
    assert pre == {1, 3}
