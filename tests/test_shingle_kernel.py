"""The Arrow shingle+hash kernel (r15) must be value-identical to the JVM
expression form it replaced: same tokenization, same 3-gram construction,
same md5-derived int64 hashes, same distinct+sort — including the edge
documents (< 3 tokens, empty text, repeated shingles)."""

import pytest
from pyspark.sql import functions as F

from glaredb_spark.operators.dedup import (
    _hash64,
    _hashed_shingle_sets,
    _shingles_df,
)


def _jvm_sets(spark, sf_dir):
    """The pre-r15 expression pipeline: split → transform 3-grams →
    distinct → md5-hash → distinct → sort."""
    return (
        _shingles_df(spark, sf_dir)
        .select("doc_id", F.array_distinct("shingles").alias("s"))
        .select(
            "doc_id",
            F.sort_array(
                F.array_distinct(F.transform("s", lambda x: _hash64(x)))
            ).alias("hs"),
        )
    )


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_kernel_matches_jvm_expression_form(spark, sf_dir):
    arrow = {r.doc_id: r.hs for r in _hashed_shingle_sets(spark, sf_dir).collect()}
    jvm = {r.doc_id: r.hs for r in _jvm_sets(spark, sf_dir).collect()}
    assert arrow.keys() == jvm.keys()
    assert arrow == jvm


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_kernel_sigs_match_expression_aggregates(spark, sf_dir):
    """with_sigs=True: the in-kernel 16 MinHash minima must equal the
    expression form (explode hs → groupBy doc_id → 16 MIN aggregates),
    including the absence of rows for shingle-less documents."""
    from glaredb_spark.operators.dedup import (
        NUM_HASHES,
        _minhash_aggs,
        _hashed_shingle_sets,
    )

    with_sig = _hashed_shingle_sets(spark, sf_dir, with_sigs=True)
    kernel = {
        r.doc_id: list(r.sig)
        for r in with_sig.filter(F.size("hs") > 0).collect()
    }
    expr = {
        r.doc_id: [r[f"mh{j}"] for j in range(NUM_HASHES)]
        for r in _hashed_shingle_sets(spark, sf_dir)
        .select("doc_id", F.explode("hs").alias("h"))
        .groupBy("doc_id")
        .agg(*_minhash_aggs())
        .collect()
    }
    assert kernel.keys() == expr.keys()
    assert kernel == expr
    # shingle-less docs carry a null sig and are filtered by size(hs) > 0
    empties = with_sig.filter(F.size("hs") == 0).collect()
    assert all(r.sig is None for r in empties)


def test_kernel_edge_documents(spark, tmp_path):
    p = str(tmp_path / "documents.parquet")
    rows = [
        (1, "a b c d"),        # two shingles
        (2, "a b"),            # < 3 tokens -> empty set
        (3, ""),               # empty text
        (4, "x  y z"),         # double space -> empty token rides the split
        (5, "a b c a b c a b c a b c"),  # repeated shingles -> distinct
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(p)
    arrow = {
        r.doc_id: r.hs for r in _hashed_shingle_sets(spark, str(tmp_path)).collect()
    }
    jvm = {r.doc_id: r.hs for r in _jvm_sets(spark, str(tmp_path)).collect()}
    assert arrow == jvm
    assert arrow[2] == [] and arrow[3] == []
    assert len(arrow[5]) == 3  # a-b-c, b-c-a, c-a-b
