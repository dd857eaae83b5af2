"""Recall + pruning guarantees for banded multi-probe sign-LSH (VERDICT r1
'Next round' #5): knobs from lsh_params must deliver >= 0.9 recall vs exact
brute force, with real candidate pruning in the high-similarity regime."""

import numpy as np
import pytest


def test_lsh_params_shapes():
    from glaredb_spark.operators.similarity import lsh_params

    # high-similarity near-dup regime at scale: deep codes, few bands
    r_hi, b_hi = lsh_params(10**6, 0.9, recall=0.97)
    assert r_hi >= 8 and b_hi * r_hi <= 64
    # weak-similarity regime at small N: shallow codes (little pruning possible)
    r_lo, b_lo = lsh_params(500, 0.3, recall=0.9)
    assert r_lo <= 2
    # more corpus -> deeper codes (more pruning) at the same similarity floor
    assert lsh_params(10**7, 0.9, recall=0.9)[0] >= lsh_params(10**3, 0.9, recall=0.9)[0]


def _planted_corpus(n_base=500, n_dups=60, dim=64, seed=7):
    """Random gaussian corpus + planted near-dup partners (cosine ~0.92+)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    partners = base[:n_dups] + 0.28 * rng.standard_normal((n_dups, dim))
    vecs = np.vstack([base, partners])
    return vecs


def _true_pairs(vecs, threshold):
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    n = len(vecs)
    iu = np.triu_indices(n, k=1)
    mask = cos[iu] >= threshold
    return {(int(a), int(b)) for a, b in zip(iu[0][mask], iu[1][mask])}


def test_dedup_recall_and_pruning_high_sim(spark):
    """Production near-dup regime: knobs for (N=1e6, cos>=0.9, recall 0.97)
    must find >=90% of true pairs while generating <=5% of all pairs as
    candidates — sub-quadratic for real, not a fixed 2^8 bucket."""
    from glaredb_spark.operators.dedup import embedding_dup_pairs, lsh_candidate_pairs
    from glaredb_spark.operators.similarity import lsh_params

    vecs = _planted_corpus()
    truth = _true_pairs(vecs, 0.9)
    assert len(truth) >= 40  # sanity: the plant worked

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    r, n_bands = lsh_params(10**6, 0.9, recall=0.97)  # scale knobs, not N=560
    found = {
        (row.v1, row.v2)
        for row in embedding_dup_pairs(df, 0.9, r=r, n_bands=n_bands).collect()
    }
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} with (r={r}, L={n_bands})"

    n = len(vecs)
    n_cand = lsh_candidate_pairs(df, r, n_bands).count()
    frac = n_cand / (n * (n - 1) / 2)
    assert frac <= 0.05, f"candidate fraction {frac:.3f} — no pruning"


def test_knn_recall_vs_bruteforce_fixture(spark, sf_dir):
    """ANN with formula knobs must recall >=0.9 of the exact top-5 on the
    real embeddings fixture (weak-similarity regime: cos ~0.3-0.5)."""
    from glaredb_spark.operators.similarity import (
        ann_cosine_topk,
        knn_bruteforce_cosine,
        lsh_params,
    )
    from glaredb_spark.sources.files import load_tables
    from pyspark.sql import functions as F

    exact = {
        (row.query_id, row.neighbor_id)
        for row in knn_bruteforce_cosine(spark, sf_dir).collect()
    }
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    r, n_bands = lsh_params(500, 0.3, recall=0.97, target_bucket=32)
    approx = {
        (row.query_id, row.neighbor_id)
        for row in ann_cosine_topk(
            emb,
            emb.filter(F.col("vec_id") < 10),
            5,
            r=r,
            n_bands=n_bands,
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} with (r={r}, L={n_bands})"


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    """nprobe == n_cells degrades IVF to exact brute force — same top-k."""
    from glaredb_spark.operators.similarity import (
        IVF_CENT_IDS,
        ivf_cosine_topk,
        knn_bruteforce_cosine,
    )
    from glaredb_spark.sources.files import load_tables
    from pyspark.sql import functions as F

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    full = ivf_cosine_topk(emb, queries, 5, nprobe=len(IVF_CENT_IDS))
    exact = knn_bruteforce_cosine(spark, sf_dir)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, exact.collect()))


def test_ivf_partial_probe_recall_and_pruning(spark, sf_dir):
    from glaredb_spark.operators.similarity import (
        ivf_cosine_topk,
        knn_bruteforce_cosine,
    )
    from glaredb_spark.sources.files import load_tables
    from pyspark.sql import functions as F

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce_cosine(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_cosine_topk(emb, queries, 5, nprobe=3).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"ivf nprobe=3 recall {recall:.3f}"
