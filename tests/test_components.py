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


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc1 long, doc2 long")


def _labels(df):
    return {r.n: r.component for r in df.collect()}


def test_star_matches_propagation_random(spark):
    """Star contraction and min-label propagation agree on random graphs."""
    import random

    from glaredb_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(300)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = _pairs_df(spark, pairs)
    assert _labels(connected_components_star(df)) == _labels(
        connected_components(df)
    )


def test_star_handles_long_path(spark):
    """A 400-node path (diameter 399): propagation would need 399 rounds
    and raises at max_iter; star contraction converges in O(log n)."""
    import pytest

    from glaredb_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    path = [(i, i + 1) for i in range(399)]
    df = _pairs_df(spark, path)
    got = _labels(connected_components_star(df))
    assert got == {i: 0 for i in range(400)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=5)


def test_star_disjoint_cliques(spark):
    from glaredb_spark.operators.components import connected_components_star

    cliques = []
    for base in (0, 100, 200):
        ids = [base + i for i in range(5)]
        cliques += [(a, b) for a in ids for b in ids if a < b]
    got = _labels(connected_components_star(_pairs_df(spark, cliques)))
    for base in (0, 100, 200):
        for i in range(5):
            assert got[base + i] == base
