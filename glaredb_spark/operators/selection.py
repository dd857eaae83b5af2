"""Data-selection operators — corpus-statistics quality signals and
DSIR-style importance weighting for choosing what to train on.

- ``text_mean_word_freq``: per-document mean corpus term frequency
  (the CCNet-style "how common are this doc's words" signal used to
  split head/middle/tail quality buckets).
- ``dsir_importance``: Data Selection with Importance Resampling (Xie
  et al. 2023) over hashed unigram features. The target distribution is
  the English subcorpus; every document scores by how target-like its
  hashed-feature mass is. Weights here are exact scaled-integer ratios
  ``(target_b * 100000) div source_b`` rather than log-ratios so both
  engines agree bit-for-bit (ln differs by 1 ulp across libms; the
  ordering of documents — which is what resampling consumes — is
  preserved for the monotone per-bucket transform).

Scale: tokenization is a map-only explode; the feature table is 256
hash buckets (64K for bigrams would be the knob) aggregated with
map-side combine, then BROADCAST back onto the token stream — no
shuffle of the corpus itself. The per-doc reduce shuffles once on
doc_id. At 100 TB: same plan, bucket table still tiny, the doc_id
shuffle is the single unavoidable exchange.

Cross-engine determinism: the feature hash is two hex chars of md5
(identical everywhere) → ascii-folded to a 0..65535 bucket id; all
weights/scores are integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables


@register_query(
    "text_mean_word_freq",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(c) AS BIGINT) AS sum_tf,
       CAST(sum(c) AS DOUBLE) / count(*) AS mean_tf
FROM tok JOIN tf USING (w)
GROUP BY tok.doc_id
ORDER BY tok.doc_id
""",
)
def text_mean_word_freq(spark, sf_dir):
    """Per-document mean corpus term frequency. The vocabulary aggregate
    is map-side combined and the resulting (word, count) table is
    broadcast — the corpus token stream is never shuffled by word."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    tf = tok.groupBy("w").agg(F.count("*").alias("c"))
    return (
        tok.join(F.broadcast(tf), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("c").alias("sum_tf"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_tf",
            (F.col("sum_tf").cast("double") / F.col("n_tokens")).alias(
                "mean_tf"
            ),
        )
        .orderBy("doc_id")
    )


# 2 hex chars of md5 → 0..65535 bucket (ascii() is identical in Spark
# and DuckDB; md5 is byte-identical)
_BUCKET_SQL = (
    "ascii(substr(md5(w), 1, 1)) * 256 + ascii(substr(md5(w), 2, 1))"
)


def _bucket_spark(w):
    m = F.md5(w)
    return (
        F.ascii(F.substring(m, 1, 1)) * 256 + F.ascii(F.substring(m, 2, 1))
    ).cast("long")


@register_query(
    "dsir_importance",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
b AS (
  SELECT doc_id, lang,
         CAST({_BUCKET_SQL} AS BIGINT) AS bucket
  FROM tok
),
wt AS (
  SELECT bucket,
         CAST(count(*) AS BIGINT) AS s,
         CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS t
  FROM b GROUP BY bucket
),
scored AS (
  SELECT b.doc_id,
         any_value(b.lang) AS lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum((t * 100000) // s) AS BIGINT) AS score
  FROM b JOIN wt USING (bucket)
  GROUP BY b.doc_id
)
SELECT doc_id, lang, n_tokens, score,
       score // n_tokens AS mean_weight
FROM scored
ORDER BY doc_id
""",
)
def dsir_importance(spark, sf_dir):
    """DSIR-style importance weights: hashed-unigram bucket statistics of
    the target (English) subcorpus vs the whole corpus, folded back onto
    every document as an exact integer score. The 65536-row bucket table
    broadcasts; only the final per-doc reduce shuffles."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    b = tok.select(
        "doc_id", "lang", _bucket_spark(F.col("w")).alias("bucket")
    )
    wt = b.groupBy("bucket").agg(
        F.count("*").alias("s"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t"),
    )
    wt = wt.withColumn("w8", F.expr("(t * 100000) div s"))
    scored = (
        b.join(F.broadcast(wt.select("bucket", "w8")), "bucket")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("lang")).alias("lang"),
            F.count("*").alias("n_tokens"),
            F.sum("w8").alias("score"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        "score",
        F.expr("score div n_tokens").alias("mean_weight"),
    ).orderBy("doc_id")
