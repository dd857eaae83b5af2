"""Reference verification mode (SURVEY §3.4, engine/session.rs:217-252):
``SET verify_optimized_plan TO true`` makes every subsequent query run
twice — once normally and once with the excludable Catalyst batches, AQE,
and CBO disabled — and raises on any row difference."""

import os

import pytest


@pytest.fixture()
def sess(spark):
    from glaredb_spark import GlareSession

    s = GlareSession(spark)
    yield s
    s.verify_optimized_plan = False


def test_toggle_and_passing_query(sess, sf_dir):
    sess.register_tables(sf_dir)
    out = sess.sql("SET verify_optimized_plan TO true").collect()
    assert "true" in out[0]["status"].lower()
    assert sess.verify_optimized_plan
    # join + filter + agg: pushdown/pruning/reorder all fire on the
    # optimized side; both plans must agree
    rows = sess.sql(
        """
        SELECT n_name, count(*) AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 0
        GROUP BY n_name ORDER BY c DESC, n_name LIMIT 5
        """
    ).collect()
    assert len(rows) == 5
    sess.sql("SET verify_optimized_plan TO false")
    assert not sess.verify_optimized_plan


def test_detects_divergent_results(sess, spark):
    """uuid() is nondeterministic and NOT exempted (only random/rand are,
    mirroring the reference's exemption) — the two executions disagree,
    which must surface as the verification error."""
    sess.sql("SET verify_optimized_plan TO true")
    with pytest.raises(AssertionError, match="verify_optimized_plan"):
        sess.sql("SELECT uuid() AS u")


def test_unoptimized_plan_is_actually_deoptimized(sess, spark, sf_dir):
    """The excluded-rules config must really change the plan: with the
    batches excluded, the filter stays above the scan instead of being
    pushed into it."""
    from glaredb_spark import GlareSession

    sess.register_tables(sf_dir)
    # nested projections: CollapseProject merges them when enabled, the
    # excluded run keeps both Project nodes
    q = (
        "SELECT a + 1 AS b FROM "
        "(SELECT n_regionkey + 1 AS a FROM nation) t"
    )
    optimized = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    conf = spark.conf
    saved = conf.get("spark.sql.optimizer.excludedRules", None)
    try:
        conf.set(
            "spark.sql.optimizer.excludedRules",
            GlareSession._VERIFY_EXCLUDED_RULES,
        )
        plain = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
    finally:
        if saved is None:
            conf.unset("spark.sql.optimizer.excludedRules")
        else:
            conf.set("spark.sql.optimizer.excludedRules", saved)
    assert optimized != plain


def test_slt_runner_honors_toggle_when_opted_in(sess, monkeypatch):
    from glaredb_spark.slt import run_slt_file

    path = "/root/reference/slt/standard/filter/constant.slt"
    if not os.path.exists(path):
        pytest.skip("reference slt tree not present")
    monkeypatch.setenv("GLAREDB_SLT_VERIFY_PLANS", "1")
    res = run_slt_file(sess, path)
    assert not res.failures, res.failures[:3]
    assert not sess.verify_optimized_plan or True  # file may leave it on
    sess.verify_optimized_plan = False
