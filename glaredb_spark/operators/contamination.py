"""Benchmark-contamination detection — exact 13-gram collision check.

The standard decontamination step for training corpora (popularized by the
GPT-3 appendix): a training document is contaminated if it shares any
exact 13-gram with a held-out benchmark/eval set. Exact n-gram collision
needs no LSH — it is a plain inverted-index equi-join on hashed n-grams:

    corpus 13-grams  ⋈  benchmark 13-grams   (equi-join on int64 hash)

Shuffle volume ∝ posting lists (distinct n-grams per doc), never |corpus|
× |benchmark|; the benchmark side is typically small enough to broadcast
at any scale. Hashes are the md5→int64 kernel shared with the dedup
family (identical in Spark and DuckDB → the gate checks exact membership).

The registered query treats doc_id % 50 == 0 documents (~2%) as the
"benchmark set" and reports, per contaminated corpus doc, how many
distinct 13-grams collide and the smallest benchmark doc hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glaredb_spark.operators.dedup import _hash64, _o_hash64
from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_wide

NGRAM_N = 13


def _ngram_expr(n: int) -> str:
    parts = ", ".join(f"element_at(t, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size(t) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(t) - {n - 1}), i -> "
        f"concat_ws(' ', {parts})) END"
    )


def _o_ngram_expr(n: int) -> str:
    parts = ", ".join(f"t[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len(t) < {n} THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(range(1, len(t) - {n - 2}), i -> "
        f"concat_ws(' ', {parts})) END"
    )


def ngram_postings(docs: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """(doc_id, h) — distinct hashed word n-grams per document. Map-side
    explode; distinct-per-doc comes free from array_distinct."""
    return docs.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(F.expr(_ngram_expr(n)), lambda x: _hash64(x))
            )
        ).alias("h"),
    )


def contamination_check(
    corpus: DataFrame, benchmark: DataFrame, n: int = NGRAM_N
) -> DataFrame:
    """(doc_id, n_shared_ngrams, first_benchmark_doc) for every corpus doc
    sharing >= 1 exact n-gram with any benchmark doc."""
    c = ngram_postings(corpus, n)
    b = ngram_postings(benchmark, n).select(
        F.col("doc_id").alias("bench_doc"), "h"
    )
    return (
        c.join(b, "h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_shared_ngrams"),
            F.min("bench_doc").alias("first_benchmark_doc"),
        )
    )


@register_query(
    "text_contamination_13gram",
    oracle=f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, {_o_hash64('g')} AS h FROM (
    SELECT doc_id, unnest(list_distinct({_o_ngram_expr(NGRAM_N)})) AS g
    FROM tok)),
bench AS (SELECT doc_id AS bench_doc, h FROM grams WHERE doc_id % 50 = 0),
corp AS (SELECT doc_id, h FROM grams WHERE doc_id % 50 <> 0)
SELECT corp.doc_id,
       COUNT(DISTINCT corp.h) AS n_shared_ngrams,
       MIN(bench.bench_doc) AS first_benchmark_doc
FROM corp JOIN bench USING (h)
GROUP BY corp.doc_id
ORDER BY corp.doc_id
""",
)
def text_contamination_13gram(spark, sf_dir):
    docs = load_wide(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_check(corpus, bench).orderBy("doc_id")
