"""Connected components over near-duplicate pairs — dedup CLUSTER IDs.

A production dedup pipeline keeps one representative per duplicate
CLUSTER, not per pair: near-dup relations are not transitive, so pairs
(a,b),(b,c) must collapse into one component {a,b,c} with a canonical
representative (min doc_id). This operator closes that gap on top of any
pair producer (MinHash-LSH, SimHash, embedding-cosine).

Algorithm: min-label propagation — every node starts labeled with its own
id; each round every node takes the min of its label and its neighbors'
labels; fixpoint = components labeled by their minimum member. Rounds ∝
graph diameter; near-dup clusters are short chains (diameter is small by
construction — every member pair was within the similarity threshold of a
shared neighbor), so a handful of rounds suffice. Each round is one
equi-join + one min-aggregate (two bounded shuffles), with localCheckpoint
truncating the growing lineage like operators/recursive.py.

At 100 TB scale the same loop holds (labels/edges are id-pairs, shuffles
are bounded by |E|); for adversarially long chains the alternating
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond") ships as ``connected_components_star`` — O(log n)
rounds on any graph shape, equivalence-tested in
tests/test_components.py.

Oracle: DuckDB WITH RECURSIVE transitive closure + MIN per node — exact
same components, engine-independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glaredb_spark.registry import register_query


def connected_components(
    edges: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node id
    of the connected component (undirected)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("n"))
        .distinct()
        .withColumn("component", F.col("n"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["n"])
            .groupBy("a")
            .agg(F.min("component").alias("_nbr"))
        )
        new = (
            labels.join(nbr_min, labels["n"] == nbr_min["a"], "left")
            .select(
                "n",
                F.least(
                    F.col("component"), F.coalesce("_nbr", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("x")
            .join(labels.alias("y"), "n")
            .filter(F.col("x.component") != F.col("y.component"))
            .limit(1)
            .count()
        )
        labels = new
        if not changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter — raise max_iter, or use "
        "star-contraction for adversarially long chains)"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "doc1",
    dst: str = "doc2",
    max_iter: int = 30,
) -> DataFrame:
    """(n, component) via alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the scale path for adversarially long chains.

    Each round: large-star points every strictly-larger neighbor at the
    neighborhood minimum, small-star points every smaller-or-equal
    neighbor (and the node) at it. Component diameter collapses
    geometrically, so rounds are O(log n) REGARDLESS of graph shape —
    min-label propagation (connected_components) needs O(diameter) rounds
    and gives up on long paths. Per round: two grouped mins + two
    equi-joins, all shuffles bounded by |E|; convergence is an edge-set
    checksum (count + hash sum), one tiny aggregate.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def checksum(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.sum(F.hash("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return row.c, row.h

    prev = None
    for _ in range(max_iter):
        # large-star over the symmetric neighborhood
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        e1 = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the (u >= v)-oriented edges
        o = (
            e1.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mins2 = o.groupBy("u").agg(F.min("v").alias("m"))
        e2 = (
            o.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = checksum(e2)
        e = e2
        if prev == cur:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds"
        )
    # converged edges are stars (node -> component min); roots self-map
    members = e.select("u").distinct()
    roots = e.select(F.col("v").alias("u")).distinct().join(
        members, "u", "left_anti"
    )
    return (
        e.select(F.col("u").alias("n"), F.col("v").alias("component"))
        .unionByName(
            roots.select(F.col("u").alias("n"), F.col("u").alias("component"))
        )
        .groupBy("n")
        .agg(F.min("component").alias("component"))
    )


def _minhash_pairs_cte() -> str:
    """The dedup_minhash_lsh oracle pipeline as a reusable WITH-body."""
    from glaredb_spark.operators.dedup import (
        BANDS,
        MINHASH_JACCARD_MIN,
        O_HASHED_SETS,
        O_SHINGLES,
        O_TOK,
        _o_band_key,
        _o_hash64,
        _o_minhash_cols,
    )

    bands_sql = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_o_band_key(b)} AS band_key FROM sigs"
        for b in range(BANDS)
    )
    return f"""
tok AS ({O_TOK}),
sets AS (SELECT doc_id, list_distinct({O_SHINGLES}) AS s FROM tok),
posting AS (SELECT DISTINCT doc_id, unnest(s) AS sh FROM sets),
hashed AS (SELECT doc_id, {_o_hash64('sh')} AS h FROM posting),
sigs AS (SELECT doc_id, {_o_minhash_cols()} FROM hashed GROUP BY doc_id),
bands AS ({bands_sql}),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key
          AND a.doc_id < b.doc_id),
hsets AS ({O_HASHED_SETS}),
pairs AS (
  SELECT doc1, doc2 FROM cand
  JOIN hsets x ON doc1 = x.doc_id JOIN hsets y ON doc2 = y.doc_id
  WHERE CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
          / len(list_distinct(x.hs || y.hs)) >= {MINHASH_JACCARD_MIN})
"""


@register_query(
    "dedup_components",
    oracle=None,  # set below — needs the module-level helper
)
def dedup_components(spark, sf_dir):
    """Duplicate clusters over MinHash-LSH pairs: (doc_id, component_id,
    cluster_size) for every doc in at least one near-dup pair."""
    from glaredb_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir)
    comp = connected_components(pairs, "doc1", "doc2")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("n").alias("doc_id"),
            F.col("component").cast("long").alias("component_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
        .orderBy("doc_id")
    )


@register_query("dedup_components_star", oracle=None)  # oracle set below
def dedup_components_star(spark, sf_dir):
    """Same duplicate clusters via star contraction — identical output to
    dedup_components (component = min member), different algorithm
    (O(log n) rounds vs O(diameter)); both share the DuckDB
    recursive-closure oracle."""
    from glaredb_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir)
    comp = connected_components_star(pairs, "doc1", "doc2")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("n").alias("doc_id"),
            F.col("component").cast("long").alias("component_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
        .orderBy("doc_id")
    )


# recursive-closure oracle: same pairs, transitive closure, min per node
from glaredb_spark.registry import ORACLES  # noqa: E402

ORACLES["dedup_components"] = f"""
WITH RECURSIVE {_minhash_pairs_cte()},
edges AS (SELECT doc1 AS a, doc2 AS b FROM pairs
          UNION SELECT doc2, doc1 FROM pairs),
reach AS (
  SELECT a AS n, a AS m FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
comp AS (SELECT n, MIN(m) AS component_id FROM reach GROUP BY n),
sized AS (SELECT component_id, COUNT(*) AS cluster_size FROM comp
          GROUP BY component_id)
SELECT comp.n AS doc_id,
       CAST(comp.component_id AS BIGINT) AS component_id,
       CAST(sized.cluster_size AS BIGINT) AS cluster_size
FROM comp JOIN sized USING (component_id)
ORDER BY doc_id
"""

# the star variant computes the same (min-labeled) components — share the
# transitive-closure oracle
ORACLES["dedup_components_star"] = ORACLES["dedup_components"]
