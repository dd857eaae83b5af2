"""Deterministic sampling: stability under repartitioning, salt
independence, disjoint splits, and approximate rate accuracy."""

from pyspark.sql import functions as F

from glaredb_spark.operators.sampling import (
    DENOM,
    deterministic_sample,
    stratified_sample,
    train_test_split,
)
from glaredb_spark.sources.files import load_tables


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def test_membership_stable_under_repartition(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    a = _ids(deterministic_sample(docs, "doc_id", 2000))
    b = _ids(deterministic_sample(docs.repartition(13), "doc_id", 2000))
    assert a == b and len(a) > 0


def test_split_is_partition_of_rows(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tagged = train_test_split(docs, "doc_id", 1000)
    n = docs.count()
    n_test = tagged.filter(F.col("split") == "test").count()
    n_train = tagged.filter(F.col("split") == "train").count()
    assert n_test + n_train == n
    # 10% ±5pp at n=500: hash uniformity, not a statistical test
    assert 0.05 * n < n_test < 0.15 * n


def test_nested_sample_subset_property(spark, sf_dir):
    # rate monotonicity: the 10% sample is a subset of the 20% sample
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    s10 = set(_ids(deterministic_sample(docs, "doc_id", 1000)))
    s20 = set(_ids(deterministic_sample(docs, "doc_id", 2000)))
    assert s10 < s20


def test_salts_give_independent_dimensions(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    a = set(_ids(deterministic_sample(docs, "doc_id", 3000, salt="x")))
    b = set(_ids(deterministic_sample(docs, "doc_id", 3000, salt="y")))
    assert a != b  # different dimensions
    n = docs.count()
    # independence: |a∩b|/n ≈ 0.09 — allow wide tolerance at n=500
    overlap = len(a & b) / n
    assert 0.02 < overlap < 0.20


def test_stratified_rates_apply_per_stratum(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sampled = stratified_sample(
        docs, "doc_id", "lang", {"en": DENOM}, default_bp=0
    )
    langs = {r[0] for r in sampled.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert sampled.count() == n_en  # rate DENOM keeps every en row
