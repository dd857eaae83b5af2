"""Plan cache + parquet metadata cache contracts (r15 optimization).

Two properties matter:
- NO result caching: a cached plan re-executed after the underlying files
  change without fingerprint-visible mutation still reads from disk every
  run (the plan is lazy; only construction is memoized), and
  ``spark.catalog.clearCache()`` leaves nothing stale behind.
- Invalidation: any fingerprint change (overwrite, member add/remove,
  schema change) rebuilds the plan / re-infers the schema.
"""

import os
import shutil
import time

import pytest

from glaredb_spark.plancache import _CACHE, _dir_fingerprint, plan_cached
from glaredb_spark.sources.files import clear_parquet_meta_cache, read_parquet


@pytest.fixture(scope="module")
def sess(spark):
    return spark


def test_meta_cache_speeds_reads_and_invalidates(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(10).write.mode("overwrite").parquet(p)
    df1 = read_parquet(spark, p)
    assert df1.columns == ["id"]
    # cache hit returns the SAME lazy handle (no new analysis)
    assert read_parquet(spark, p) is df1
    # overwrite with a different schema -> fingerprint change -> fresh read
    time.sleep(0.02)
    spark.range(3).selectExpr("id", "id * 2 AS dbl").write.mode(
        "overwrite"
    ).parquet(p)
    df2 = read_parquet(spark, p)
    assert df2 is not df1
    assert df2.columns == ["id", "dbl"]
    assert df2.count() == 3


def test_plan_cache_reuses_plan_not_results(spark, tmp_path):
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    spark.range(100).write.mode("overwrite").parquet(
        os.path.join(d, "tbl.parquet")
    )
    calls = []

    @plan_cached("pc_test_query")
    def q(s, sf_dir):
        calls.append(1)
        return read_parquet(s, os.path.join(sf_dir, "tbl.parquet")).selectExpr(
            "sum(id) AS s"
        )

    assert q(spark, d).collect()[0][0] == 4950
    assert q(spark, d) is q(spark, d)  # plan handle reused
    assert len(calls) == 1
    # results are NOT cached: executing the cached plan re-reads the files.
    # Overwrite with identical schema/row-count via a direct file rewrite
    # is fingerprint-visible too — prove the stronger property instead:
    # clearCache (what bench.py runs between samples) leaves the cached
    # plan recomputing from disk.
    spark.catalog.clearCache()
    assert q(spark, d).collect()[0][0] == 4950
    assert len(calls) == 1
    # fingerprint change (new data) -> rebuilt plan, fresh results
    time.sleep(0.02)
    clear_parquet_meta_cache()  # path differs per tmp_path; just be explicit
    spark.range(10).write.mode("overwrite").parquet(
        os.path.join(d, "tbl.parquet")
    )
    assert q(spark, d).collect()[0][0] == 45
    assert len(calls) == 2


def test_plan_cache_keys_on_directory(spark, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    for d, n in ((d1, 5), (d2, 7)):
        os.makedirs(d)
        spark.range(n).write.mode("overwrite").parquet(
            os.path.join(d, "tbl.parquet")
        )

    @plan_cached("pc_test_dirs")
    def q(s, sf_dir):
        return read_parquet(s, os.path.join(sf_dir, "tbl.parquet")).selectExpr(
            "count(*) AS c"
        )

    assert q(spark, d1).collect()[0][0] == 5
    assert q(spark, d2).collect()[0][0] == 7


def test_dir_fingerprint_sees_one_level_of_subdirs(tmp_path):
    d = str(tmp_path)
    sub = tmp_path / "tbl.parquet"
    sub.mkdir()
    (sub / "part-0.parquet").write_bytes(b"x")
    fp1 = _dir_fingerprint(d)
    assert fp1 is not None
    time.sleep(0.02)
    (sub / "part-1.parquet").write_bytes(b"y")
    assert _dir_fingerprint(d) != fp1


def test_headline_queries_are_plan_cached(spark):
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    for name in ("tpch_q01", "dedup_minhash_lsh", "cb_groupby_highcard"):
        a = QUERIES[name](spark, sf)
        assert QUERIES[name](spark, sf) is a
