"""End-to-end training-data preparation pipeline as ONE lazy DataFrame DAG.

Composes the individually-gated stages the way a real 100 TB corpus prep
job would: quality filter → exact dedup → MinHash-LSH near-dup removal →
per-source corpus stats. Nothing materializes on the driver; every stage
is the same scale-safe plan shape its standalone query uses (map-only
scoring, digest-keyed exact dedup, banded LSH with no cross join), so the
composite inherits each stage's 100 TB properties. Catalyst sees the whole
chain at once — the quality filter prunes the corpus BEFORE any shingle
explosion, the single biggest cost lever in real pipelines.

Keep-policy for a verified near-dup pair: keep the lower doc_id
(deterministic, the standard min-id survivor rule).

Cross-engine notes: quality_score reuses text_quality_score's arithmetic
(hash-gated green — bit-identical doubles), so thresholding at 0.45
selects identical rows in both engines; exact dedup keeps min(doc_id) per
md5; near-dup Jaccard reuses dedup's md5-derived integer machinery.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from glaredb_spark.operators.dedup import (
    _SHINGLE_EXPR,
    _hash64,
    _minhash_aggs,
    _band_key,
    _o_band_key,
    _o_hash64,
    _o_minhash_cols,
    _verify_pairs,
    BANDS,
    MINHASH_JACCARD_MIN,
    O_HASHED_SETS,
    O_SHINGLES,
)
from glaredb_spark.operators.text import STOP_EN, _count_in, _sql_count_in
from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_wide

QUALITY_MIN = 0.45

_O_SCORE = (
    f"0.4 * (CAST({_sql_count_in(STOP_EN)} AS DOUBLE)"
    " / len(string_split(text, ' ')))"
    " + 0.3 * (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.0 END)"
    " + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
    " / len(string_split(text, ' ')))"
)


@register_query(
    "pipeline_corpus_clean",
    oracle=f"""
WITH quality AS (
  SELECT * FROM documents WHERE {_O_SCORE} >= {QUALITY_MIN}),
exact AS (
  SELECT * FROM quality
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM exact),
sets AS (SELECT doc_id, list_distinct({O_SHINGLES}) AS s FROM tok),
posting AS (SELECT DISTINCT doc_id, unnest(s) AS sh FROM sets),
hashed AS (SELECT doc_id, {_o_hash64('sh')} AS h FROM posting),
sigs AS (SELECT doc_id, {_o_minhash_cols()} FROM hashed GROUP BY doc_id),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_o_band_key(b)} AS band_key FROM sigs" for b in range(BANDS))}
),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key
          AND a.doc_id < b.doc_id),
hsets AS ({O_HASHED_SETS}),
neardup AS (
  SELECT DISTINCT doc2 FROM (
    SELECT doc1, doc2,
           CAST(len(list_intersect(x.hs, y.hs)) AS DOUBLE)
             / len(list_distinct(x.hs || y.hs)) AS jaccard
    FROM cand JOIN hsets x ON doc1 = x.doc_id JOIN hsets y ON doc2 = y.doc_id)
  WHERE jaccard >= {MINHASH_JACCARD_MIN}),
survivors AS (
  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc2 FROM neardup))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars_total,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM survivors
GROUP BY source
ORDER BY source
""",
)
def pipeline_corpus_clean(spark, sf_dir):
    docs = load_wide(spark, sf_dir, "documents")

    # stage 1: quality filter (map-only; prunes before any explosion)
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    score = (
        F.lit(0.4) * (_count_in(toks, STOP_EN).cast("double") / n_tokens)
        + F.lit(0.3)
        * F.when(F.col("n_chars").between(100, 500), F.lit(1.0)).otherwise(0.0)
        + F.lit(0.3)
        * (F.size(F.array_distinct(toks)).cast("double") / n_tokens)
    )
    quality = docs.filter(score >= QUALITY_MIN)

    # stage 2: exact dedup — min doc_id per content digest (digest shuffle)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .persist(StorageLevel.MEMORY_AND_DISK)  # feeds LSH + stats branches
    )

    # stage 3: MinHash-LSH near-dup pairs on the surviving set (banded
    # equi-join — identical machinery to dedup_minhash_lsh). r15 note:
    # routing this stage through the shared Arrow shingle kernel
    # (hashed_sets_of, the d0bd262 win for the STANDALONE dedup queries)
    # was tried and measured as a 15-20% regression here — interleaved
    # A/B at sf0.1, 9/9 alternating pairs slower in both orderings (old
    # min 1.96-2.25 s vs new 2.44-2.55 s). The quality+exact-dedup
    # stages shrink the corpus before stage 3, so the per-doc HOF saving
    # no longer covers the extra python stage behind the dedup window
    # (the same overhead class the knn per-pair-UDF revert pinned). The
    # JVM expression form is kept deliberately.
    sets = exact.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select("doc_id", F.array_distinct(F.expr(_SHINGLE_EXPR)).alias("s"))
    sets = sets.select(
        "doc_id",
        "s",
        F.array_distinct(F.transform("s", lambda x: _hash64(x))).alias("hs"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hashed = (
        sets.select("doc_id", F.explode("s").alias("sh"))
        .distinct()
        .select("doc_id", _hash64(F.col("sh")).alias("h"))
    )
    sigs = hashed.groupBy("doc_id").agg(*_minhash_aggs())
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[_band_key(b) for b in range(BANDS)])).alias(
            "band", "band_key"
        ),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    dup_ids = (
        _verify_pairs(cand, sets.select("doc_id", "hs"), MINHASH_JACCARD_MIN)
        .select(F.col("doc2").alias("doc_id"))
        .distinct()
    )

    # stage 4: drop near-dup higher ids (anti join) + per-source stats
    survivors = exact.join(dup_ids, "doc_id", "left_anti")
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
            F.sum(F.length("text")).cast("long").alias("n_chars_total"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source")
    )


@register_query(
    "pipeline_quality_quantile",
    oracle=f"""
SELECT doc_id, source,
       percent_rank() OVER (PARTITION BY source
                            ORDER BY {_O_SCORE} DESC, doc_id) AS pct_rank
FROM documents
QUALIFY pct_rank <= 0.5
ORDER BY doc_id
""",
)
def pipeline_quality_quantile(spark, sf_dir):
    """Per-source quality-quantile pruning: keep each source's top half by
    quality score (window percent_rank with doc_id tiebreaker — fully
    deterministic). One shuffle on source; at scale sources are few and
    large, so the window sort is the cost — for heavy skew, pre-aggregate
    an approximate per-source threshold instead (documented trade)."""
    from pyspark.sql import Window

    docs = load_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    score = (
        F.lit(0.4) * (_count_in(toks, STOP_EN).cast("double") / n_tokens)
        + F.lit(0.3)
        * F.when(F.col("n_chars").between(100, 500), F.lit(1.0)).otherwise(0.0)
        + F.lit(0.3)
        * (F.size(F.array_distinct(toks)).cast("double") / n_tokens)
    )
    w = Window.partitionBy("source").orderBy(F.desc("q_score"), "doc_id")
    return (
        docs.withColumn("q_score", score)
        .withColumn("pct_rank", F.percent_rank().over(w))
        .filter(F.col("pct_rank") <= 0.5)
        .select("doc_id", "source", "pct_rank")
        .orderBy("doc_id")
    )


@register_query(
    "pipeline_pack_sequences",
    oracle="""
WITH tok AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM tok
)
SELECT source, doc_id, n_tokens, start_offset,
       start_offset // 2048 AS first_bin,
       (start_offset + n_tokens - 1) // 2048 AS last_bin,
       CAST(start_offset // 2048 != (start_offset + n_tokens - 1) // 2048 AS BOOLEAN)
         AS straddles
FROM packed
ORDER BY source, doc_id
""",
)
def pipeline_pack_sequences(spark, sf_dir):
    """Sequence packing for LM training: per source, documents are
    concatenated in doc_id order and chopped into fixed 2048-token
    bins (the GPT-style concat-and-chunk recipe). Each document gets its
    stream offset, first/last bin, and a boundary-straddle flag — the
    exact assignment a downstream tokenizer shard needs, computed as one
    window cumsum.

    Scale: one shuffle (window partition by source, order by doc_id) —
    the packing ORDER is the operator's definition, so the sort is
    irreducible. Sources pack independently → partition-parallel at any
    corpus size; a single giant source would move to a range-partitioned
    parallel prefix-sum over doc_id ranges (same arithmetic, the offsets
    are associative)."""
    docs = load_wide(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cap = 2048
    tok = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = tok.withColumn(
        "start_offset",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
    )
    return packed.select(
        "source",
        "doc_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {cap}").alias("first_bin"),
        F.expr(f"(start_offset + n_tokens - 1) div {cap}").alias("last_bin"),
        (
            F.expr(f"start_offset div {cap}")
            != F.expr(f"(start_offset + n_tokens - 1) div {cap}")
        ).alias("straddles"),
    ).orderBy("source", "doc_id")
