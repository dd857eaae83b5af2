"""Semantic clustering + SemDeDup-style embedding dedup.

Training-data pipeline family (BASELINE.json north star): k-means
clustering over the embedding column, then *within-cluster* pairwise
cosine dedup — the SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540):
global O(N²) pair comparison is replaced by clustering (O(N·K·iters))
followed by pairwise checks only inside each cluster (O(Σ n_c²)).

Scale design (100 TB of vectors):
- Assignment is a broadcast of the K-row centroid table against the
  corpus — one map-side pass, no corpus shuffle. The argmin is a
  groupBy(vec_id) min over K candidate rows produced map-side; with AQE
  partial aggregation the shuffle carries ≤ |corpus| rows of 3 scalars.
- The centroid update shuffles (cid, dim) partial sums — K·dim·partitions
  rows after map-side combine, independent of |corpus|.
- SemDeDup's pairwise stage shuffles once on cid; at real scale K is
  chosen ∝ N/target_cluster_size (the paper uses ~100k clusters for
  billions of docs), keeping per-cluster pair counts bounded. Pair
  scoring uses the Arrow-batched numpy kernel (vector.py), not per-row
  Python.

Determinism (cross-engine, partition-invariant): Lloyd's iterations are a
fixed count from a fixed seed (centroids = embeddings of the K smallest
vec_ids); every distance/centroid-mean goes through the scaled-integer
discipline of glaredb_spark.functions.vector — float products/squares in
exact double, round(·×1e12) to BIGINT, integer (associative) sums, one
final double division. Argmin ties break on smallest cid in both engines.

Reference seed: the reference ships l2_distance
(crates/glaredb_core/src/functions/scalar/builtin/similarity/l2_distance.rs)
but no clustering; this module is the Spark-first extension of that
surface to the operation a real corpus-prep pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from glaredb_spark.functions import vector as V
from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_wide

K = 8  # clusters (fixture-scale; real runs size K ~ N / target cluster size)
ITERS = 2  # fixed Lloyd's iterations (determinism: no convergence test)
DIM = 64  # fixture embedding dimensionality (oracle-side range bound)
SCALE = 1e12
SEMDEDUP_MIN_COS = 0.35  # same dup threshold as operators.dedup


def _d2_long(a, c):
    """Scaled squared L2 distance as an exact BIGINT (argmin-safe: the
    sqrt is monotone, so comparisons on the integer sum are identical to
    comparisons on the real distance)."""
    x = lambda v: v.cast("double")  # noqa: E731
    diff2 = F.zip_with(
        a, c, lambda p, q: F.round((x(p) - x(q)) * (x(p) - x(q)) * F.lit(SCALE)).cast("long")
    )
    return F.aggregate(diff2, F.lit(0).cast("long"), lambda s, v: s + v)


def _o_d2(a: str, c: str) -> str:
    """DuckDB oracle twin of _d2_long (index-based, identical numerics)."""
    xi = f"CAST(list_extract({a}, i) AS DOUBLE)"
    ci = f"CAST(list_extract({c}, i) AS DOUBLE)"
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), i -> "
        f"CAST(round(({xi} - {ci}) * ({xi} - {ci}) * 1e12) AS BIGINT)))"
    )


def seed_centroids(emb: DataFrame, k: int = K) -> DataFrame:
    """Deterministic init: centroids = the embeddings of the k smallest
    vec_ids (k-means++ would need a seeded RNG; a fixed pick keeps the
    whole pipeline partition- and engine-invariant)."""
    return emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda v: v.cast("double")).alias("cent"),
    )


def assign_clusters(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """One assignment step: nearest centroid per vector (ties → min cid).

    Broadcast the K-row centroid table; argmin via min(struct(d2, cid))
    — lexicographic struct min is exactly (min distance, then min cid).
    """
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", _d2_long(F.col("embedding"), F.col("cent")).alias("d2")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2"))
    )


def update_centroids(emb: DataFrame, assign: DataFrame) -> DataFrame:
    """One update step: per-cluster per-dimension mean via exact integer
    partial sums (posexplode → map-side combine on (cid, pos) → K·dim
    groups), reassembled into ordered arrays."""
    per_dim = (
        emb.join(assign.select("vec_id", "cid"), "vec_id")
        .select("cid", F.posexplode("embedding").alias("pos", "xval"))
        .groupBy("cid", "pos")
        .agg(
            F.sum(F.round(F.col("xval").cast("double") * F.lit(SCALE)).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "cid", "pos", (F.col("s").cast("double") / F.col("n") / F.lit(SCALE)).alias("v")
        )
    )
    return (
        per_dim.groupBy("cid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "v"))), lambda p: p["v"]
            ).alias("cent")
        )
    )


def kmeans_assignments(
    spark: SparkSession, sf_dir: str, k: int = K, iters: int = ITERS
) -> DataFrame:
    """Full deterministic Lloyd's run: returns (vec_id, cid, d2) for the
    final assignment (d2 = scaled-int squared distance to the centroid)."""
    emb = load_wide(spark, sf_dir, "embeddings")
    cent = seed_centroids(emb, k)
    assign = assign_clusters(emb, cent)
    for _ in range(iters - 1):
        cent = update_centroids(emb, assign)
        assign = assign_clusters(emb, cent)
    return assign


def _oracle_kmeans_ctes(k: int = K, iters: int = ITERS) -> str:
    """CTE chain replaying the exact iteration structure in DuckDB."""
    parts = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        f"c1 AS (SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent "
        f"FROM e WHERE vec_id < {k})",
    ]
    for it in range(1, iters + 1):
        parts += [
            f"d{it} AS (SELECT e.vec_id, c.cid, {_o_d2('e.embedding', 'c.cent')} AS d2 "
            f"FROM e CROSS JOIN c{it} c)",
            f"m{it} AS (SELECT vec_id, min(d2) AS md FROM d{it} GROUP BY vec_id)",
            f"a{it} AS (SELECT d{it}.vec_id, min(d{it}.cid) AS cid, min(d{it}.d2) AS d2 "
            f"FROM d{it} JOIN m{it} ON d{it}.vec_id = m{it}.vec_id AND d{it}.d2 = m{it}.md "
            f"GROUP BY d{it}.vec_id)",
        ]
        if it < iters:
            parts += [
                f"s{it} AS (SELECT a{it}.cid, t.i AS pos, "
                f"sum(CAST(round(CAST(list_extract(e.embedding, t.i) AS DOUBLE) * 1e12) AS BIGINT)) AS s, "
                f"count(*) AS n "
                f"FROM e JOIN a{it} USING (vec_id) CROSS JOIN range(1, {DIM + 1}) AS t(i) "
                f"GROUP BY a{it}.cid, t.i)",
                f"c{it + 1} AS (SELECT cid, list(CAST(s AS DOUBLE) / n / 1e12 ORDER BY pos) AS cent "
                f"FROM s{it} GROUP BY cid)",
            ]
    return "WITH " + ",\n".join(parts)


@register_query(
    "emb_kmeans_assign",
    oracle=f"""
{_oracle_kmeans_ctes()}
SELECT vec_id, cid, CAST(d2 AS DOUBLE) / 1e12 AS dist_sq
FROM a{ITERS} ORDER BY vec_id
""",
)
def emb_kmeans_assign(spark, sf_dir):
    """K-means cluster assignment after a fixed 2-iteration Lloyd's run
    (K=8, deterministic seed + numerics — see module docstring)."""
    assign = kmeans_assignments(spark, sf_dir)
    return assign.select(
        "vec_id", "cid", (F.col("d2").cast("double") / F.lit(SCALE)).alias("dist_sq")
    ).orderBy("vec_id")


@register_query(
    "emb_kmeans_sizes",
    oracle=f"""
{_oracle_kmeans_ctes()}
SELECT cid, count(*) AS n,
       CAST(sum(d2) AS DOUBLE) / count(*) / 1e12 AS mean_dist_sq
FROM a{ITERS} GROUP BY cid ORDER BY cid
""",
)
def emb_kmeans_sizes(spark, sf_dir):
    """Cluster cardinality + mean squared distance to centroid (inertia
    per cluster) — the quality summary a pipeline monitors per batch.
    Exact: the mean divides an integer sum of scaled-int distances."""
    assign = kmeans_assignments(spark, sf_dir)
    return (
        assign.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("d2").cast("double") / F.count(F.lit(1)) / F.lit(SCALE)).alias(
                "mean_dist_sq"
            ),
        )
        .orderBy("cid")
    )


@register_query(
    "dedup_semdedup",
    oracle=f"""
{_oracle_kmeans_ctes()}
SELECT a.vec_id AS keep_id, b.vec_id AS dup_id, x.cid,
       {V.o_cosine('a.embedding', 'b.embedding')} AS cos
FROM a{ITERS} x
JOIN a{ITERS} y ON x.cid = y.cid AND x.vec_id < y.vec_id
JOIN e a ON a.vec_id = x.vec_id
JOIN e b ON b.vec_id = y.vec_id
WHERE {V.o_cosine('a.embedding', 'b.embedding')} >= {SEMDEDUP_MIN_COS}
ORDER BY keep_id, dup_id
""",
)
def dedup_semdedup(spark, sf_dir):
    """SemDeDup: near-duplicate pairs found ONLY within k-means clusters
    (cos ≥ 0.35, keep = smaller vec_id). The candidate set is the union
    of per-cluster pair sets — Σ n_c² comparisons instead of N²; recall
    is traded at cluster boundaries exactly as in the paper.

    r15 BLOCKED verification (guide §2.2/§4): the old plan materialized
    the within-cluster pair JOIN (Σ n_c² rows each carrying two 64-dim
    arrays) and scored each pair with the per-pair Arrow cosine UDF —
    which also recomputed both norms per pair (3 scaled dots/pair). Now
    each vector ships once into its cluster's collect_list bucket and one
    mapInArrow kernel per cluster computes the all-pairs scaled-int dot
    matrix, norms once per VECTOR, filters (keep_id < dup_id, cos ≥
    threshold) in-kernel and emits only survivors. Numerics bit-identical
    (same per-element rounding, same sqrt, same d/(na·nb) op order —
    vector.scaled_cross_dots / scaled_self_norms); clusters are disjoint
    so no pair-dedup stage is needed. Per-task state is one cluster's
    matrix — the SemDeDup regime sizes K ∝ N/target_cluster_size, which
    bounds it by design."""
    emb = load_wide(spark, sf_dir, "embeddings")
    assign = kmeans_assignments(spark, sf_dir).select("vec_id", "cid")
    tagged = emb.join(assign, "vec_id").select("vec_id", "cid", "embedding")
    clusters = tagged.groupBy("cid").agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("rows")
    )
    id_type = tagged.schema["vec_id"].dataType.simpleString()
    cid_type = tagged.schema["cid"].dataType.simpleString()
    thr = float(SEMDEDUP_MIN_COS)

    def gen(batches):
        import numpy as np

        import pyarrow as pa
        import pyarrow.compute  # noqa: F401 — pa.compute needs the explicit import in workers

        from glaredb_spark.functions.vector import (
            flat_matrix,
            scaled_cross_dots,
            scaled_self_norms,
        )

        for b in batches:
            cids = b.column(b.schema.get_field_index("cid"))
            col = b.column(b.schema.get_field_index("rows"))
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lens = pa.compute.list_value_length(col).to_numpy(
                zero_copy_only=False
            )
            flat = col.flatten()
            ids = flat.field("vec_id").to_numpy(zero_copy_only=False)
            mat, _ = flat_matrix(flat.field("embedding"))
            nrm = scaled_self_norms(mat)
            keeps, dups, outc, cos = [], [], [], []
            s = 0
            for bi, ln in enumerate(lens):
                e = s + int(ln)
                bid = ids[s:e]
                D = scaled_cross_dots(mat[s:e], mat[s:e])
                C = D / np.outer(nrm[s:e], nrm[s:e])
                keep = (bid[:, None] < bid[None, :]) & (C >= thr)
                s = e
                ai, bj = np.nonzero(keep)
                if len(ai):
                    keeps.append(bid[ai])
                    dups.append(bid[bj])
                    outc.append(np.full(len(ai), cids[bi].as_py()))
                    cos.append(C[ai, bj])
            if keeps:
                id_pa = flat.field("vec_id").type
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(keeps), id_pa),
                        pa.array(np.concatenate(dups), id_pa),
                        pa.array(np.concatenate(outc), cids.type),
                        pa.array(np.concatenate(cos), pa.float64()),
                    ],
                    ["keep_id", "dup_id", "cid", "cos"],
                )

    return clusters.mapInArrow(
        gen, f"keep_id {id_type}, dup_id {id_type}, cid {cid_type}, cos double"
    ).orderBy("keep_id", "dup_id")
