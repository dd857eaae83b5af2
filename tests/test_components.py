"""Connected components (dedup cluster IDs): exact labels on a known graph,
partition-invariance, and chain convergence."""

import pytest


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        (1, 2), (2, 3),          # chain -> component 1
        (10, 11),                # pair -> component 10
        (20, 21), (21, 22), (20, 22),  # triangle -> component 20
        (30, 31), (33, 31),      # out-of-order ids -> component 30
    ]
    return spark.createDataFrame(rows, "doc1 long, doc2 long")


def test_components_exact(spark, edges):
    from glaredb_spark.operators.components import connected_components

    got = {
        (r.n, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
        (30, 30), (31, 30), (33, 30),
    }


def test_components_long_chain(spark):
    from glaredb_spark.operators.components import connected_components

    n = 40  # diameter 40 chain — exercises multi-round convergence
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc1 long, doc2 long"
    )
    comp = connected_components(chain).collect()
    assert {r.component for r in comp} == {0}
    assert len(comp) == n + 1


def test_components_partition_invariant(spark, edges):
    from glaredb_spark.operators.components import connected_components

    a = sorted(map(tuple, connected_components(edges.repartition(1)).collect()))
    b = sorted(map(tuple, connected_components(edges.repartition(7)).collect()))
    assert a == b
