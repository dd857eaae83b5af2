"""Structural invariants for the k-means + SemDeDup family (oracle parity
is covered in test_oracle_parity; these assert the algorithmic properties
the oracle can't see)."""

from pyspark.sql import functions as F

from glaredb_spark.operators import semantic as S
from glaredb_spark.sources.files import load_wide


def test_assignment_partition_invariant(spark, sf_dir):
    """The scaled-int distance discipline makes the argmin identical no
    matter how the corpus is partitioned."""
    emb = load_wide(spark, sf_dir, "embeddings")
    cent = S.seed_centroids(emb)
    base = {
        r["vec_id"]: r["cid"]
        for r in S.assign_clusters(emb, cent).collect()
    }
    skewed = {
        r["vec_id"]: r["cid"]
        for r in S.assign_clusters(emb.repartition(7), cent).collect()
    }
    assert base == skewed and len(base) > 0


def test_lloyds_inertia_nonincreasing(spark, sf_dir):
    """One update+reassign step cannot raise total inertia (textbook
    Lloyd's monotonicity) — a real algorithmic check on both steps."""
    emb = load_wide(spark, sf_dir, "embeddings")
    cent = S.seed_centroids(emb)
    a1 = S.assign_clusters(emb, cent)
    i1 = a1.agg(F.sum("d2")).collect()[0][0]
    a2 = S.assign_clusters(emb, S.update_centroids(emb, a1))
    i2 = a2.agg(F.sum("d2")).collect()[0][0]
    # scaled-int rounding perturbs each squared-distance term by < 1e-12
    # relatively; allow that epsilon rather than exact monotonicity
    assert i2 <= i1 * (1 + 1e-9)


def test_semdedup_pairs_subset_of_global(spark, sf_dir):
    """Every SemDeDup pair is a true near-dup pair (precision = 1); the
    clustering only ever *drops* cross-cluster candidates (recall trade)."""
    from glaredb_spark.functions import vector as V

    sem = {
        (r["keep_id"], r["dup_id"])
        for r in S.dedup_semdedup(spark, sf_dir).collect()
    }
    emb = load_wide(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a, b = emb.alias("a"), emb.alias("b")
    full = {
        (r["v1"], r["v2"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            V.cosine_arrow(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
        .filter(F.col("cos") >= S.SEMDEDUP_MIN_COS)
        .collect()
    }
    assert sem <= full
