"""Similarity search over embedding columns (ANN / top-k).

North-star operator family (BASELINE.json): brute-force cosine top-k as the
correctness baseline, and a sign-LSH-bucketed variant as the scale path.

Scale design (100 TB of vectors):
- Brute force is a broadcast-join of the (small) query set against the full
  vector corpus — one pass, no shuffle of the corpus.
- Top-k is TWO-PHASE (VERDICT r1 fix): a partition-local bounded top-k
  reduces each input batch to ≤ k rows per query BEFORE any exchange;
  the final merge shuffles only the ~k·P candidate rows on query_id and
  re-ranks them JVM-side (sort_array + slice). A plain row_number window
  would shuffle the ENTIRE |corpus|×|queries| scored set into |queries|
  tasks — a parallelism collapse at 100 TB. r15: phase 1 is FUSED with
  scoring — one mapInArrow kernel flattens the pair batch, computes the
  scaled-int cosines in numpy and keeps the per-batch top-k, replacing
  the interpreted HOF dot projection + mapInPandas pair of stages
  (_fused_cosine_topk; bit-identical output, test_blocked_verify.py).
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
from glaredb_spark.sources.files import load_wide

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
    return _topk_merge(cand, k, key=key, score=score, ident=ident)


def _topk_merge(
    cand: "DataFrame",
    k: int,
    key: str = "query_id",
    score: str = "cosine",
    ident: str = "neighbor_id",
) -> "DataFrame":
    """Phase 2 of the two-phase top-k: one shuffle of the ≤ k·|keys|·P
    surviving candidates on `key`, exact re-rank JVM-side."""
    return (
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


def _fused_cosine_topk(joined: "DataFrame", k: int) -> "DataFrame":
    """Fused phase 1 for cosine top-k (guide §4): score AND locally
    pre-top-k each Arrow batch in ONE mapInArrow kernel.

    The unfused plan evaluated the dot as an INTERPRETED zip_with/
    aggregate HOF per pair (~40 µs × |pairs| — measured 0.67 s of
    knn_bruteforce's 1.07 s at sf0.1) and then ran a SECOND python stage
    (mapInPandas) for the local top-k. Here the pre-joined pair batches
    (query_id, neighbor_id, q_emb, embedding, q_nrm, nrm) flow through
    one kernel: zero-copy flatten of both array columns, the module's
    scaled-int row dots, cosine = dot/(q_nrm·nrm) in the same op order,
    then per-batch top-k under the total order (cosine DESC, neighbor_id
    ASC). Exactness: a per-batch top-k is a superset of the global top-k
    under the same total order for ANY batching, so _topk_merge returns
    the identical rows the unfused plan produced (bit-identical cosines
    — tests/test_blocked_verify.py).

    Scale: identical two-phase shape — phase 1 stays exchange-free and
    emits ≤ k rows per key per batch; only the kernel's constant factor
    changed."""
    key_t = joined.schema["query_id"].dataType.simpleString()
    id_t = joined.schema["neighbor_id"].dataType.simpleString()

    def gen(batches):
        import numpy as np

        import pyarrow as pa

        from glaredb_spark.functions.vector import flat_matrix, scaled_row_dots

        for b in batches:
            if b.num_rows == 0:
                continue
            qid = b.column(b.schema.get_field_index("query_id"))
            nid = b.column(b.schema.get_field_index("neighbor_id"))
            qv = qid.to_numpy(zero_copy_only=False)
            nv = nid.to_numpy(zero_copy_only=False)
            A, _ = flat_matrix(b.column(b.schema.get_field_index("q_emb")))
            B, _ = flat_matrix(b.column(b.schema.get_field_index("embedding")))
            qn = b.column(b.schema.get_field_index("q_nrm")).to_numpy(
                zero_copy_only=False
            )
            nn = b.column(b.schema.get_field_index("nrm")).to_numpy(
                zero_copy_only=False
            )
            cos = scaled_row_dots(A, B) / (qn * nn)
            # group by key, then (score DESC, ident ASC) inside each group
            order = np.lexsort((nv, -cos, qv))
            qs = qv[order]
            starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
            sizes = np.diff(np.r_[starts, len(qs)])
            rank_in_group = np.arange(len(qs)) - np.repeat(starts, sizes)
            keep = order[rank_in_group < k]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qv[keep], qid.type),
                    pa.array(nv[keep], nid.type),
                    pa.array(cos[keep], pa.float64()),
                ],
                ["query_id", "neighbor_id", "cosine"],
            )

    return joined.mapInArrow(
        gen, f"query_id {key_t}, neighbor_id {id_t}, cosine double"
    )


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
    cache_plan=True,
)
def knn_bruteforce_cosine(spark, sf_dir):
    emb = load_wide(spark, sf_dir, "embeddings")
    # norms once per vector (not per pair) — cosine = dot / (nrm_q * nrm_c)
    n = emb.select(
        "vec_id", "embedding", F.sqrt(V.norm_sq(F.col("embedding"))).alias("nrm")
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "q_emb",
        "embedding",
        "q_nrm",
        "nrm",
    )
    return (
        _topk_merge(_fused_cosine_topk(joined, TOP_K), TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Banded multi-probe sign-LSH (VERDICT r1 fix: knobs are corpus/regime-driven,
# not a fixed 2^6 bucket count).
#
# Bit d of band b = sign of dimension b*r + d (coordinate hyperplanes —
# exact and engine-identical; equivalent to random hyperplanes for isotropic
# embeddings). Two vectors are candidates iff their r-bit codes agree in ANY
# of L bands; 1-bit multi-probe on the probing side widens each band to
# Hamming≤1. lsh_params() picks (r, L): r from corpus size (pruning — bucket
# ≈ N/2^r per band) capped by what the recall target allows at the caller's
# similarity floor; L from the residual recall requirement. At a near-dup
# threshold (cos ≥ 0.85) this prunes hard; at a weak floor (cos ≈ 0.3) the
# math degrades toward brute force — that is fundamental to LSH, and the
# formula makes the trade explicit instead of hiding it (see SCALE.md).
# ---------------------------------------------------------------------------
import math


def lsh_params(
    n_rows: int,
    cos_min: float,
    recall: float = 0.9,
    dim: int = 64,
    target_bucket: int = 256,
) -> tuple[int, int]:
    """Choose (r bits-per-band, L bands) for banded 1-bit-multi-probe
    sign-LSH so that pairs with cosine >= cos_min are recalled with
    probability >= recall, with the most pruning the corpus size allows."""
    s = 1.0 - math.acos(max(-1.0, min(1.0, cos_min))) / math.pi  # P(bit agree)
    r_prune = max(1, round(math.log2(max(2.0, n_rows / target_bucket))))
    r_feasible = 1
    for r in range(1, min(16, dim) + 1):
        if _bands_for(s, r, recall) * r <= dim:
            r_feasible = r  # largest r whose band count still fits in dim
    r = min(r_prune, r_feasible)
    return r, min(_bands_for(s, r, recall), dim // r)


def _bands_for(s: float, r: int, recall: float) -> int:
    p_band = s**r + r * (s ** (r - 1)) * (1 - s)  # 1-bit multi-probe collision
    if p_band >= 1.0:
        return 1
    if p_band <= 0.0:  # cos_min = -1: no band ever collides; caller's dim cap
        return 1 << 30
    return max(1, math.ceil(math.log(1.0 - recall) / math.log(1.0 - p_band)))


def band_code_cols(emb: str, n_bands: int, r: int) -> list:
    """One r-bit integer code Column per band (bit d = sign of dim b*r+d)."""
    codes = []
    for b in range(n_bands):
        code = F.lit(0)
        for d in range(r):
            code = code + F.when(
                F.element_at(emb, b * r + d + 1) > 0, F.lit(1 << d)
            ).otherwise(F.lit(0))
        codes.append(code.cast("long"))
    return codes


def probe_code_arrays(codes: list, r: int) -> list:
    """Per band: the code plus its r 1-bit flips (multi-probe)."""
    return [
        F.array(code, *[code.bitwiseXOR(F.lit(1 << d)).cast("long") for d in range(r)])
        for code in codes
    ]


def o_band_code(emb: str, b: int, r: int) -> str:
    """DuckDB SQL for the same band code (bit-identical sign tests)."""
    return (
        "("
        + " + ".join(
            f"(CASE WHEN list_extract({emb}, {b * r + d + 1}) > 0"
            f" THEN {1 << d} ELSE 0 END)"
            for d in range(r)
        )
        + ")"
    )


# Registered-query knobs: the oracle SQL is a static string, so the fixture
# query pins (r, L) to lsh_params(n_rows=500, cos_min=0.3) == (2, 2) with
# multi-probe — recall ≈ 0.97 at the fixture's weak neighbor similarity.
KNN_R = 2
KNN_BANDS = 2


_O_CASE_CODE = (
    "CASE band "
    + " ".join(
        f"WHEN {b} THEN {o_band_code('embedding', b, KNN_R)}"
        for b in range(KNN_BANDS)
    )
    + " END"
)
_O_PROBES = "[code" + "".join(f", xor(code, {1 << d})" for d in range(KNN_R)) + "]"


@register_query(
    "knn_lsh_cosine",
    oracle=f"""
WITH n AS (SELECT vec_id, embedding,
                  sqrt({V.o_norm_sq('embedding')}) AS nrm FROM embeddings),
bands AS (
  SELECT vec_id, band, CAST({_O_CASE_CODE} AS BIGINT) AS code
  FROM embeddings, (SELECT UNNEST(range({KNN_BANDS})) AS band) b),
qp AS (
  SELECT vec_id AS query_id, band, UNNEST({_O_PROBES}) AS code
  FROM bands WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id
  FROM qp JOIN bands c ON qp.band = c.band AND qp.code = c.code
  WHERE c.vec_id <> qp.query_id),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {V.o_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM cand JOIN n q ON q.vec_id = cand.query_id
            JOIN n c ON c.vec_id = cand.neighbor_id),
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
    """Banded multi-probe sign-LSH ANN over the embeddings fixture — thin
    wrapper over ann_cosine_topk with the oracle-pinned (r, L) knobs."""
    emb = load_wide(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return (
        ann_cosine_topk(emb, queries, TOP_K, r=KNN_R, n_bands=KNN_BANDS)
        .orderBy("query_id", "rank")
    )


def ann_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    r: int | None = None,
    n_bands: int | None = None,
    n_rows: int | None = None,
    cos_min: float = 0.3,
    recall: float = 0.9,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors via banded multi-probe sign-LSH.

    Knobs (r bits/band, L bands) default to lsh_params(|corpus|, cos_min,
    recall) — corpus-size-driven pruning under a recall guarantee for
    neighbors with cosine >= cos_min. Candidates = corpus rows whose r-bit
    band code is within Hamming 1 of the query's in ANY band; exact cosine
    rescoring; exact two-phase top-k over candidates.

    Plan shape at scale: corpus is scanned once and broadcast-joined against
    the exploded query probes (no corpus self-join, no |corpus|² shuffle);
    the distinct + rescore join shuffle on candidate ids only.
    """
    if r is None or n_bands is None:
        if n_rows is None:
            n_rows = corpus.count()
        r, n_bands = lsh_params(n_rows, cos_min, recall, dim)
    codes = band_code_cols(emb_col, n_bands, r)
    n = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("embedding"),
        F.sqrt(V.norm_sq(F.col(emb_col))).alias("nrm"),
    )
    bands = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.array(*codes)).alias("band", "code"),
    )
    qp = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.posexplode(F.array(*probe_code_arrays(codes, r))).alias(
                "band", "probes"
            ),
        )
        .select("query_id", "band", F.explode("probes").alias("code"))
    )
    cand = (
        bands.join(F.broadcast(qp), ["band", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.sqrt(V.norm_sq(F.col(emb_col))).alias("q_nrm"),
    )
    joined = (
        cand.join(n, cand.neighbor_id == n.vec_id)
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", "q_emb", "embedding", "q_nrm", "nrm")
    )
    return _topk_merge(_fused_cosine_topk(joined, k), k).select(
        "query_id", "neighbor_id", "rank", "cosine"
    )


# ---------------------------------------------------------------------------
# IVF-style ANN — the second scale path next to sign-LSH (SURVEY north-star:
# "an IVF or LSH-bucketed variant"). Cells come from k deterministic seed
# vectors (stride-selected corpus rows — no RNG, so the DuckDB oracle can
# replicate them); every vector is assigned to its nearest centroid
# (arg-min over an exact L2 kernel), queries probe the `nprobe` nearest
# cells, candidates are rescored with exact cosine and top-k'd two-phase.
#
# Scale shape: the centroid table is tiny (k rows) and broadcast; cell
# assignment is a map-side broadcast-join + argmin (one pass over the
# corpus, no shuffle); the candidate join shuffles only cell-matched pairs.
# nprobe/k trade recall vs candidates; nprobe == k degrades to exact brute
# force (asserted in tests/test_lsh_recall.py).
# ---------------------------------------------------------------------------
IVF_CENT_IDS = [10, 72, 134, 196, 258, 320, 382, 444]  # exist at every SF
IVF_NPROBE = 3


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    centroid_ids: list[int] = IVF_CENT_IDS,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    cents = corpus.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col(id_col).alias("cid"), F.col(emb_col).alias("cemb")
    )
    base = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("embedding"),
        F.sqrt(V.norm_sq(F.col(emb_col))).alias("nrm"),
    )
    # nearest cell per vector: broadcast the k centroids, argmin via
    # min(struct(d, cid)) — map-side, no shuffle of the corpus
    cell_scores = base.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        V.l2_distance(F.col("embedding"), F.col("cemb")).alias("d"),
    )
    cells = cell_scores.groupBy("vec_id").agg(
        F.min(F.struct("d", "cid")).getField("cid").alias("cid")
    )
    # probe cells come from the QUERY embeddings scored against the
    # centroids directly (not from corpus cell_scores keyed by vec_id) —
    # a query vector absent from the corpus still probes its nprobe
    # nearest cells instead of silently returning zero neighbors
    q_probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "cid",
            V.l2_distance(F.col("q_emb"), F.col("cemb")).alias("d"),
        )
        .groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("d", "cid"))), 1, nprobe
            ).alias("probes")
        )
        .select("query_id", F.explode("probes.cid").alias("cid"))
    )
    cand = (
        cells.join(F.broadcast(q_probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.sqrt(V.norm_sq(F.col(emb_col))).alias("q_nrm"),
    )
    joined = (
        cand.join(base, cand.neighbor_id == base.vec_id)
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", "q_emb", "embedding", "q_nrm", "nrm")
    )
    return _topk_merge(_fused_cosine_topk(joined, k), k).select(
        "query_id", "neighbor_id", "rank", "cosine"
    )


_O_CENTS = ", ".join(str(i) for i in IVF_CENT_IDS)


@register_query(
    "knn_ivf_cosine",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings
  WHERE vec_id IN ({_O_CENTS})),
n AS (SELECT vec_id, embedding,
             sqrt({V.o_norm_sq('embedding')}) AS nrm FROM embeddings),
cell_scores AS (
  SELECT e.vec_id, c.cid, {V.o_l2('e.embedding', 'c.cemb')} AS d
  FROM embeddings e CROSS JOIN cents c),
cells AS (
  SELECT vec_id, cid FROM cell_scores
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
q_probes AS (
  SELECT vec_id AS query_id, cid FROM cell_scores
  WHERE vec_id < {N_QUERIES}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid)
            <= {IVF_NPROBE}),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM q_probes p JOIN cells c ON p.cid = c.cid
  WHERE c.vec_id <> p.query_id),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {V.o_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM cand JOIN n q ON q.vec_id = cand.query_id
            JOIN n c ON c.vec_id = cand.neighbor_id),
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
def knn_ivf_cosine(spark, sf_dir):
    emb = load_wide(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf_cosine_topk(emb, queries, TOP_K).orderBy("query_id", "rank")


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
    emb = load_wide(spark, sf_dir, "embeddings")
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


@register_query(
    "emb_unit_quantize",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt({V.o_norm_sq('embedding')}) AS nrm FROM embeddings)
SELECT vec_id, nrm,
       array_to_string(list_transform(embedding[1:4], x ->
         CAST(round(CAST(x AS DOUBLE) / nrm * 127) AS INT)), ',') AS q4,
       CAST(list_sum(list_transform(range(1, len(embedding) + 1), i ->
         CAST(round(abs(CAST(list_extract(embedding, i) AS DOUBLE) / nrm
           - CAST(round(CAST(list_extract(embedding, i) AS DOUBLE) / nrm * 127)
             AS DOUBLE) / 127) * 1e9) AS BIGINT))) AS BIGINT) AS err_ppb
FROM n
ORDER BY vec_id
""",
)
def emb_unit_quantize(spark, sf_dir):
    """Embedding preprocessing for training pipelines: unit-normalize and
    int8-quantize (q = round(x/|v| * 127)), reporting the total
    reconstruction error per vector as a scaled integer (ppb, exact and
    order-independent). Map-only — no shuffle at any scale; numerics are
    the deterministic scaled-int discipline (round() is half-away in both
    engines; |v| comes from the integer-sum norm kernel). The q4 preview
    column is serialized to a comma-joined string on both engine and
    oracle sides: the driver's row canonicalizer cannot sort array cells
    (r3 ADVICE), and tests/oracle.py now rejects top-level arrays."""
    from glaredb_spark.sources.files import load_wide

    emb = load_wide(spark, sf_dir, "embeddings")
    nrm = F.sqrt(V.norm_sq(F.col("embedding")))
    x = lambda c: c.cast("double")  # noqa: E731
    unit = lambda c: x(c) / F.col("nrm")  # noqa: E731
    q = lambda c: F.round(unit(c) * 127).cast("int")  # noqa: E731
    err = lambda c: F.round(  # noqa: E731
        F.abs(unit(c) - q(c).cast("double") / 127) * 1e9
    ).cast("long")
    return (
        emb.withColumn("nrm", nrm)
        .select(
            "vec_id",
            "nrm",
            F.concat_ws(
                ",",
                F.transform(F.slice("embedding", 1, 4), lambda c: q(c).cast("string")),
            ).alias("q4"),
            F.aggregate(
                F.transform("embedding", err),
                F.lit(0).cast("long"),
                lambda a, b: a + b,
            ).alias("err_ppb"),
        )
        .orderBy("vec_id")
    )
