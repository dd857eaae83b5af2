"""Python UDTF surface: FROM-clause and LATERAL calling conventions, and
equality of the UDTF n-gram path with the JVM shingle expression."""

import pytest
from pyspark.sql import functions as F

from glaredb_spark.functions.udtf import register_udtfs


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register_udtfs(spark)


def test_series_udtf_in_from(spark):
    rows = spark.sql(
        "SELECT * FROM py_generate_series(1, 10, 3)"
    ).collect()
    assert [r[0] for r in rows] == [1, 4, 7, 10]
    rows = spark.sql("SELECT * FROM py_generate_series(5, 1, -2)").collect()
    assert [r[0] for r in rows] == [5, 3, 1]


def test_ngrams_udtf_lateral(spark):
    df = spark.sql(
        """
        SELECT t.id, g.pos, g.ngram
        FROM VALUES (1, 'a b c d'), (2, 'x y') AS t(id, txt),
             LATERAL token_ngrams(t.txt, 2) g
        ORDER BY t.id, g.pos
        """
    )
    got = [tuple(r) for r in df.collect()]
    assert got == [
        (1, 0, "a b"),
        (1, 1, "b c"),
        (1, 2, "c d"),
        (2, 0, "x y"),
    ]


def test_ngrams_udtf_matches_jvm_shingles(spark, sf_dir):
    # same trigram set as the dedup family's JVM expression
    from glaredb_spark.operators.dedup import _SHINGLE_EXPR
    from glaredb_spark.sources.files import load_tables

    docs = (
        load_tables(spark, sf_dir, "documents")["documents"]
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text", F.split("text", " ").alias("t"))
    )
    jvm = (
        docs.select("doc_id", F.explode(F.expr(_SHINGLE_EXPR)).alias("ngram"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("ngram")).alias("g"))
    )
    docs.createOrReplaceTempView("__udtf_docs")
    py = spark.sql(
        """
        SELECT d.doc_id, g.ngram
        FROM __udtf_docs d, LATERAL token_ngrams(d.text, 3) g
        """
    ).groupBy("doc_id").agg(F.sort_array(F.collect_list("ngram")).alias("g"))
    j = {r["doc_id"]: r["g"] for r in jvm.collect()}
    p = {r["doc_id"]: r["g"] for r in py.collect()}
    assert j == p
