"""Parity proofs for the r15 blocked-verification kernels.

dedup_embedding_cosine and dedup_semdedup now verify candidates per
LSH-bucket / per-cluster with one numpy matrix kernel per block
(vector.scaled_cross_dots / scaled_self_norms) instead of exploding the
candidate PAIRS through joins and a per-pair Arrow UDF. Oracle parity is
covered in test_oracle_parity; these tests pin the two properties the
rewrite leans on:

- the in-place chunked rounding in scaled_cross_dots is bit-identical to
  the module's documented sign*floor(abs+0.5) discipline, and
- the blocked plans emit exactly the rows the old pair-join plans did
  (same pair set, same cosine bits), reconstructed inline here.
"""

import numpy as np
from pyspark.sql import functions as F

from glaredb_spark.functions import vector as V
from glaredb_spark.operators import dedup as D
from glaredb_spark.operators import semantic as S
from glaredb_spark.sources.files import load_wide


def test_scaled_cross_dots_matches_reference():
    rng = np.random.default_rng(7)
    P = rng.standard_normal((37, 16))
    M = rng.standard_normal((23, 16))
    # plant sign / zero / exact-half edge cases the in-place form must hit
    P[0, :] = 0.0
    P[1, :] = -P[2, :]
    M[0, 0] = 0.5e-12  # product lands exactly on a rounding boundary scale
    prods = P[:, None, :] * M[None, :, :] * V.SCALE
    ref = (
        (np.sign(prods) * np.floor(np.abs(prods) + 0.5))
        .astype(np.int64)
        .sum(axis=2)
        / V.SCALE
    )
    # chunking must not change values either — force many chunks
    got = V.scaled_cross_dots(P, M, chunk_elems=64)
    assert np.array_equal(ref, got)
    nrm_ref = np.sqrt(
        np.diagonal(
            (lambda q: (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64))(
                P[:, None, :] * P[None, :, :] * V.SCALE
            ).sum(axis=2)
        )
        / V.SCALE
    )
    assert np.array_equal(nrm_ref, V.scaled_self_norms(P))


def _pair_join_reference(emb, threshold, r, n_bands):
    """The pre-r15 plan: explode candidate pairs, join both embeddings
    back, score per pair with the Arrow dot UDF."""
    cand = D.lsh_candidate_pairs(emb, r, n_bands)
    e = emb.select(
        F.col("vec_id"),
        F.col("embedding"),
        F.sqrt(V.norm_sq(F.col("embedding"))).alias("nrm"),
    )
    cos = V.dot_arrow(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        cand.join(
            e.select(
                F.col("vec_id").alias("v1"),
                F.col("embedding").alias("e1"),
                F.col("nrm").alias("n1"),
            ),
            "v1",
        )
        .join(
            e.select(
                F.col("vec_id").alias("v2"),
                F.col("embedding").alias("e2"),
                F.col("nrm").alias("n2"),
            ),
            "v2",
        )
        .select("v1", "v2", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def test_embedding_dup_pairs_matches_pair_join(spark, sf_dir):
    emb = load_wide(spark, sf_dir, "embeddings")
    blocked = sorted(
        tuple(r)
        for r in D.embedding_dup_pairs(
            emb, D.COSINE_DUP_MIN, r=D.DEDUP_R, n_bands=D.DEDUP_BANDS
        ).collect()
    )
    ref = sorted(
        tuple(r)
        for r in _pair_join_reference(
            emb, D.COSINE_DUP_MIN, D.DEDUP_R, D.DEDUP_BANDS
        ).collect()
    )
    assert len(blocked) > 0
    assert blocked == ref  # same pairs, same cosine bits


def test_simhash_kernel_matches_expression_form(spark, sf_dir):
    """The map-only simhash Arrow kernel must reproduce the exploded
    expression pipeline bit for bit, weighted and unweighted (same md5
    hash identity, same ±1 votes, same ≥ 0 tie rule)."""
    from glaredb_spark.operators.dedup import _hash64, _simhash_df, _tokens_df

    for weighted in (False, True):
        col = F.col("t") if weighted else F.array_distinct("t")
        toks = _tokens_df(spark, sf_dir).select(
            "doc_id", F.explode(col).alias("w")
        )
        hashed = toks.select("doc_id", _hash64(F.col("w")).alias("h"))
        bit_sums = hashed.groupBy("doc_id").agg(
            *[
                F.sum(
                    F.when(
                        (F.col("h") / F.lit(2**i)).cast("long") % 2 == 1, 1
                    ).otherwise(-1)
                ).alias(f"s{i}")
                for i in range(32)
            ]
        )
        simhash = sum(
            [
                F.when(F.col(f"s{i}") >= 0, F.lit(2**i)).otherwise(F.lit(0))
                for i in range(32)
            ],
            F.lit(0),
        ).cast("long")
        ref = sorted(
            tuple(r)
            for r in bit_sums.select("doc_id", simhash.alias("simhash")).collect()
        )
        got = sorted(
            tuple(r) for r in _simhash_df(spark, sf_dir, weighted).collect()
        )
        assert len(got) > 0
        assert got == ref


def test_verify_pairs_arrow_matches_jvm(spark, sf_dir):
    """The vectorized batch-intersection kernel (arrow=True) must emit
    exactly the rows of the JVM array_intersect form — same pairs, same
    jaccard bits — on the real ngram candidate stream."""
    from glaredb_spark.operators.dedup import (
        DF_MAX,
        NGRAM_JACCARD_MIN,
        _hashed_shingle_sets,
        _verify_pairs,
    )

    sets = _hashed_shingle_sets(spark, sf_dir).select(
        "doc_id", "hs", F.size("hs").alias("n")
    )
    pfx_len = (
        F.col("n") - F.ceil(F.lit(NGRAM_JACCARD_MIN) * F.col("n")) + 1
    ).cast("int")
    pfx = sets.select(
        "doc_id", "n", F.explode(F.slice("hs", F.lit(1), pfx_len)).alias("h")
    )
    rare = (
        pfx.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(2, DF_MAX))
        .select("h")
    )
    p = pfx.join(rare, "h")
    cand = (
        p.alias("a")
        .join(p.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
    )
    hsets = sets.select("doc_id", "hs")
    jvm = sorted(
        tuple(r)
        for r in _verify_pairs(
            cand, hsets, NGRAM_JACCARD_MIN, arrow=False
        ).collect()
    )
    vec = sorted(
        tuple(r)
        for r in _verify_pairs(
            cand, hsets, NGRAM_JACCARD_MIN, arrow=True
        ).collect()
    )
    assert len(vec) > 0
    assert vec == jvm


def test_fused_cosine_topk_matches_hof_plan(spark, sf_dir):
    """knn's fused mapInArrow score+local-top-k kernel must reproduce the
    HOF-scored + mapInPandas two-stage phase 1 exactly (any-batching
    superset property + bit-identical cosines)."""
    from glaredb_spark.operators import similarity as K

    emb = load_wide(spark, sf_dir, "embeddings")
    n = emb.select(
        "vec_id", "embedding", F.sqrt(V.norm_sq(F.col("embedding"))).alias("nrm")
    )
    q = n.filter(F.col("vec_id") < K.N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    ref = sorted(
        tuple(r)
        for r in K.topk_per_key(
            joined.select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (
                    V.dot(F.col("q_emb"), F.col("embedding"))
                    / (F.col("q_nrm") * F.col("nrm"))
                ).alias("cosine"),
            ),
            K.TOP_K,
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in K._topk_merge(
            K._fused_cosine_topk(
                joined.select(
                    "query_id",
                    F.col("vec_id").alias("neighbor_id"),
                    "q_emb",
                    "embedding",
                    "q_nrm",
                    "nrm",
                ),
                K.TOP_K,
            ),
            K.TOP_K,
        ).collect()
    )
    assert len(got) == K.N_QUERIES * K.TOP_K
    assert got == ref
    # partition-invariance of the fused phase 1 (total order breaks ties)
    got7 = sorted(
        tuple(r)
        for r in K._topk_merge(
            K._fused_cosine_topk(
                joined.select(
                    "query_id",
                    F.col("vec_id").alias("neighbor_id"),
                    "q_emb",
                    "embedding",
                    "q_nrm",
                    "nrm",
                ).repartition(7),
                K.TOP_K,
            ),
            K.TOP_K,
        ).collect()
    )
    assert got7 == ref


def test_semdedup_blocked_matches_pair_join(spark, sf_dir):
    emb = load_wide(spark, sf_dir, "embeddings")
    assign = S.kmeans_assignments(spark, sf_dir).select("vec_id", "cid")
    tagged = emb.join(assign, "vec_id").select("vec_id", "cid", "embedding")
    a, b = tagged.alias("a"), tagged.alias("b")
    ref = sorted(
        tuple(r)
        for r in a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("keep_id"),
            F.col("b.vec_id").alias("dup_id"),
            F.col("a.cid").alias("cid"),
            V.cosine_arrow(F.col("a.embedding"), F.col("b.embedding")).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= S.SEMDEDUP_MIN_COS)
        .collect()
    )
    got = sorted(tuple(r) for r in S.dedup_semdedup(spark, sf_dir).collect())
    assert len(got) > 0
    assert got == ref


def test_ngram_blocked_matches_pair_join(spark, sf_dir):
    """dedup_ngram_jaccard's blocked per-bucket verification must emit
    exactly the rows of the old candidate-self-join + pair-attached
    `_verify_pairs` plan — same pairs, same jaccard bits — reconstructed
    inline here."""
    from glaredb_spark.operators.dedup import (
        DF_MAX,
        NGRAM_JACCARD_MIN,
        _hashed_shingle_sets,
        _verify_pairs,
    )

    sets = _hashed_shingle_sets(spark, sf_dir).select(
        "doc_id", "hs", F.size("hs").alias("n")
    )
    pfx_len = (
        F.col("n") - F.ceil(F.lit(NGRAM_JACCARD_MIN) * F.col("n")) + 1
    ).cast("int")
    pfx = sets.select(
        "doc_id", "n", F.explode(F.slice("hs", F.lit(1), pfx_len)).alias("h")
    )
    rare = (
        pfx.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(2, DF_MAX))
        .select("h")
    )
    p = pfx.join(rare, "h")
    cand = (
        p.alias("a")
        .join(p.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            F.least("a.n", "b.n")
            >= F.lit(NGRAM_JACCARD_MIN) * F.greatest("a.n", "b.n")
        )
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
    )
    ref = sorted(
        tuple(r)
        for r in _verify_pairs(
            cand, sets.select("doc_id", "hs"), NGRAM_JACCARD_MIN, arrow=True
        )
        .groupBy("doc1", "doc2")
        .agg(F.min("jaccard").alias("jaccard"))
        .collect()
    )
    got = sorted(
        tuple(r) for r in D.dedup_ngram_jaccard(spark, sf_dir).collect()
    )
    assert len(got) > 0
    assert got == ref
