"""Similarity search over embedding columns (ANN / top-k).

North-star operator family (BASELINE.json): brute-force cosine top-k as the
correctness baseline, and a sign-LSH-bucketed variant as the scale path.

Scale design (100 TB of vectors):
- Brute force is a broadcast-join of the (small) query set against the full
  vector corpus — one pass, no shuffle of the corpus.
- Top-k is TWO-PHASE (VERDICT r1 fix): a partition-local bounded top-k
  (mapInPandas over just (query_id, neighbor_id, cosine) — three scalar
  columns through Arrow) reduces each input batch to ≤ k rows per query
  BEFORE any exchange; the final merge shuffles only the ~k·P candidate
  rows on query_id and re-ranks them JVM-side (sort_array + slice). A
  plain row_number window would shuffle the ENTIRE |corpus|×|queries|
  scored set into |queries| tasks — a parallelism collapse at 100 TB.
  Correctness: per-batch top-k under the total order (cosine DESC,
  neighbor_id ASC) is a superset of the global top-k under the same
  order, so the merge result is exact and partition-invariant.
- LSH variant buckets both sides on sign-hyperplane bits; the join
  becomes an equi-join on bucket id (shuffle ∝ bucket sizes, not |corpus|²).
  More hyperplanes → smaller buckets; recall traded via multi-probe.
- Distances use the deterministic scaled-integer kernels in
  glaredb_spark.functions.vector (bit-identical across engines/partitions).

Reference seed: l2_distance
(crates/glaredb_core/src/functions/scalar/builtin/similarity/l2_distance.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glaredb_spark.functions import vector as V
from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def topk_per_key(
    scored: "DataFrame",
    k: int,
    key: str = "query_id",
    score: str = "cosine",
    ident: str = "neighbor_id",
) -> "DataFrame":
    """Exact per-key top-k without a full-data window shuffle.

    Phase 1 (exchange-free): mapInPandas keeps only the top-k rows per key
    within each Arrow batch — output ≤ k·|keys| rows per batch, bounded
    memory, no shuffle. Phase 2: the surviving candidates (k·|keys|·P rows,
    tiny) shuffle once on `key`; sort_array over (-score, ident) structs +
    slice + posexplode produce the exact global top-k with rank.

    Total order is (score DESC, ident ASC); `ident` must be unique per key
    for a deterministic, partition-invariant result.
    """
    from pyspark.sql.types import StructType

    cols = [key, ident, score]
    schema = StructType([scored.schema[c] for c in cols])
    narrow = scored.select(*cols)

    def local_topk(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values([score, ident], ascending=[False, True])
                    .groupby(key, sort=False)
                    .head(k)
                )

    cand = narrow.mapInPandas(local_topk, schema=schema)
    merged = (
        cand.groupBy(key)
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col(score)).alias("_neg"),
                            F.col(ident).alias(ident),
                            F.col(score).alias(score),
                        )
                    )
                ),
                1,
                k,
            ).alias("_top")
        )
        .select(key, F.posexplode("_top").alias("_pos", "_t"))
        .select(
            key,
            F.col(f"_t.{ident}").alias(ident),
            (F.col("_pos") + 1).cast("long").alias("rank"),
            F.col(f"_t.{score}").alias(score),
        )
    )
    return merged


@register_query(
    "knn_bruteforce_cosine",
    oracle=f"""
WITH n AS (SELECT vec_id, embedding,
                  sqrt({V.o_norm_sq('embedding')}) AS nrm FROM embeddings),
q AS (SELECT vec_id, embedding, nrm FROM n WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {V.o_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM q JOIN n c ON q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
def knn_bruteforce_cosine(spark, sf_dir):
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # norms once per vector (not per pair) — cosine = dot / (nrm_q * nrm_c)
    n = emb.select(
        "vec_id", "embedding", F.sqrt(V.norm_sq(F.col("embedding"))).alias("nrm")
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                V.dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    return (
        topk_per_key(scored, TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — sign bits of the leading 6 dimensions form the bucket;
# candidates limited to the query's bucket (the 100 TB-scale path).
# ---------------------------------------------------------------------------
N_PLANES = 6
_O_BUCKET = " + ".join(
    f"(CASE WHEN list_extract(embedding, {d + 1}) > 0 THEN {2**d} ELSE 0 END)"
    for d in range(N_PLANES)
)


def _bucket():
    return sum(
        [
            F.when(F.element_at("embedding", d + 1) > 0, F.lit(2**d)).otherwise(F.lit(0))
            for d in range(N_PLANES)
        ],
        F.lit(0),
    ).cast("long")


@register_query(
    "knn_lsh_cosine",
    oracle=f"""
WITH b AS (SELECT vec_id, embedding, CAST({_O_BUCKET} AS BIGINT) AS bucket,
                  sqrt({V.o_norm_sq('embedding')}) AS nrm
           FROM embeddings),
q AS (SELECT vec_id, embedding, bucket, nrm FROM b WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {V.o_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
def knn_lsh_cosine(spark, sf_dir):
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    b = emb.select(
        "vec_id",
        "embedding",
        _bucket().alias("bucket"),
        F.sqrt(V.norm_sq(F.col("embedding"))).alias("nrm"),
    )
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        b.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                V.dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    return (
        topk_per_key(scored, TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# pairwise L2 distance — reference l2_distance parity surface
# ---------------------------------------------------------------------------
@register_query(
    "similarity_l2_pairs",
    oracle=f"""
SELECT a.vec_id AS v1, b.vec_id AS v2,
       {V.o_l2('a.embedding', 'b.embedding')} AS l2_dist,
       {V.o_dot('a.embedding', 'b.embedding')} AS dot
FROM embeddings a, embeddings b
WHERE a.vec_id < 20 AND b.vec_id < 20 AND a.vec_id < b.vec_id
ORDER BY v1, v2
""",
)
def similarity_l2_pairs(spark, sf_dir):
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    a = emb.filter(F.col("vec_id") < 20).alias("a")
    b = emb.filter(F.col("vec_id") < 20).alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            V.l2_distance(F.col("a.embedding"), F.col("b.embedding")).alias("l2_dist"),
            V.dot(F.col("a.embedding"), F.col("b.embedding")).alias("dot"),
        )
        .orderBy("v1", "v2")
    )
