"""Registry invariants the driver contract depends on."""

import inspect


def test_every_oracle_has_query():
    from glaredb_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 70


def test_bench_headline_names_registered():
    import bench
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    for name in bench.HEADLINE:
        assert name in QUERIES, name


def test_query_callables_take_spark_and_sfdir():
    from glaredb_spark.registry import QUERIES, load_all

    load_all()
    for name, fn in QUERIES.items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, name


def test_entry_module_contract():
    import __spark_entry__ as em

    qs, os_ = em.queries(), em.oracle_sql()
    assert set(os_) <= set(qs)
    assert "tpch_q01" in qs
