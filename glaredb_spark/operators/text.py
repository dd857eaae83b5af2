"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference surface (BASELINE.json north star): language ID
(stopword-hit heuristic), quality scoring (length/stopword/type-token
ratios), token counting, and document fingerprinting (md5-derived 64-bit
hashes — the cross-engine-deterministic stand-in for a rolling hash).

All computations stay JVM-side (built-in functions, no Python UDFs) and are
embarrassingly parallel per document — at 100 TB this is a map-only pipeline
with zero shuffles (aggregate summaries shuffle only the tiny grouped
result).

Determinism: counts are integers; ratios are single double divisions of
exact integers; hashes go through md5 (identical across engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glaredb_spark.registry import register_query
# deliberately load_tables, NOT load_wide: these are single-pass map-agg
# pipelines whose per-row work (a few regex/split ops) is cheaper than the
# widening exchange — measured 0.45s plain vs 0.82s widened at sf0.1. At
# scale the scan arrives pre-split, so nothing is lost.
from glaredb_spark.sources.files import load_tables

# fixture vocabulary is lowercase space-separated words; a stopword set for
# the heuristic scorers (fixture vocab includes common SQL-ish terms)
STOP_EN = ("the", "data", "value", "table", "row", "key")
STOP_DE = ("der", "die", "und", "batch", "scan")
STOP_FR = ("le", "la", "et", "join", "filter")


def _tokens():
    return F.split(F.col("text"), " ")


def _count_in(tokens_col, words: tuple[str, ...]):
    """# tokens ∈ words (with multiplicity) — JVM higher-order filter."""
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(lit_arr, t)))


def _sql_count_in(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return (
        "len(list_filter(string_split(text, ' '), t -> t IN (" + inlist + ")))"
    )


# ---------------------------------------------------------------------------
# token counting + basic stats
# ---------------------------------------------------------------------------
@register_query(
    "text_token_stats",
    oracle="""
SELECT doc_id, lang,
       CAST(length(text) AS BIGINT) AS text_len,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_word_chars,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS type_token_ratio
FROM documents
ORDER BY doc_id
""",
    cache_plan=True,
)
def text_token_stats(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = _tokens()
    n_tokens = F.size(toks).cast("long")
    n_unique = F.size(F.array_distinct(toks)).cast("long")
    n_word_chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("text_len"),
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        n_word_chars.alias("n_word_chars"),
        (n_word_chars.cast("double") / n_tokens).alias("avg_token_len"),
        (n_unique.cast("double") / n_tokens).alias("type_token_ratio"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# quality scoring — deterministic weighted components
# ---------------------------------------------------------------------------
@register_query(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
       CAST({_sql_count_in(STOP_EN)} AS DOUBLE)
         / len(string_split(text, ' ')) AS stopword_ratio,
       CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.0 END AS len_ok,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS ttr,
       0.4 * (CAST({_sql_count_in(STOP_EN)} AS DOUBLE)
              / len(string_split(text, ' ')))
       + 0.3 * (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1.0 ELSE 0.0 END)
       + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' '))) AS quality_score
FROM documents
ORDER BY doc_id
""",
)
def text_quality_score(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = _tokens()
    n_tokens = F.size(toks)
    stop_ratio = _count_in(toks, STOP_EN).cast("double") / n_tokens
    len_ok = F.when(F.col("n_chars").between(100, 500), F.lit(1.0)).otherwise(0.0)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    return docs.select(
        "doc_id",
        stop_ratio.alias("stopword_ratio"),
        len_ok.alias("len_ok"),
        ttr.alias("ttr"),
        (F.lit(0.4) * stop_ratio + F.lit(0.3) * len_ok + F.lit(0.3) * ttr).alias(
            "quality_score"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# language ID — stopword-hit argmax with fixed tie order (en > de > fr)
# ---------------------------------------------------------------------------
@register_query(
    "text_lang_id",
    oracle=f"""
SELECT lang,
       CASE WHEN {_sql_count_in(STOP_EN)} >= {_sql_count_in(STOP_DE)}
             AND {_sql_count_in(STOP_EN)} >= {_sql_count_in(STOP_FR)} THEN 'en'
            WHEN {_sql_count_in(STOP_DE)} >= {_sql_count_in(STOP_FR)} THEN 'de'
            ELSE 'fr' END AS pred_lang,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def text_lang_id(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = _tokens()
    en, de, fr = (
        _count_in(toks, STOP_EN),
        _count_in(toks, STOP_DE),
        _count_in(toks, STOP_FR),
    )
    pred = (
        F.when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# document fingerprinting — md5-derived 64-bit content hash (exact-dup key)
# (reference similarity/hash surface: functions/scalar/builtin/string/md5.rs)
# ---------------------------------------------------------------------------
@register_query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       substr(md5(text), 1, 16) AS fingerprint,
       CAST(concat('0x', substr(md5(lower(trim(text))), 1, 15)) AS BIGINT)
         AS content_hash64
FROM documents
ORDER BY doc_id
""",
)
def text_fingerprint(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fingerprint"),
        F.conv(F.substring(F.md5(F.lower(F.trim(F.col("text")))), 1, 15), 16, 10)
        .cast("long")
        .alias("content_hash64"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# BPE-ish token counting — GPT-2-style pre-tokenizer segments + a
# deterministic subword estimate (ceil(len/4) per segment, integer math)
# ---------------------------------------------------------------------------
_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


@register_query(
    "text_bpe_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT) AS n_pretokens,
       CAST(list_sum(list_transform(regexp_extract_all(text, '{_BPE_PAT}'),
                                    s -> (strlen(s) + 3) // 4)) AS BIGINT)
         AS est_bpe_tokens
FROM documents
WHERE text <> ''
ORDER BY doc_id
""",
)
def text_bpe_token_count(spark, sf_dir):
    """Pre-tokenizer segmentation (letter runs / digit runs / punctuation
    runs — the GPT-2 regex shape) plus a ceil(len/4) subword estimate:
    the standard cheap proxy for LLM token budgets over a 100 TB corpus.
    Map-only JVM pipeline — regexp + higher-order aggregate, no Python."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    segs = F.expr(f"regexp_extract_all(text, '{_BPE_PAT}', 0)")
    est = F.aggregate(
        F.transform(segs, lambda s: (F.length(s) + 3).cast("long") / F.lit(4)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v.cast("long"),
    )
    return (
        docs.filter(F.col("text") != "")
        .select(
            "doc_id",
            F.size(segs).cast("long").alias("n_pretokens"),
            est.alias("est_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# repetition metrics — the Gopher/MassiveText repetition filter family
# ---------------------------------------------------------------------------
@register_query(
    "text_repetition_metrics",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS grams
      FROM t)
SELECT doc_id,
       CAST(list_max(list_transform(list_distinct(toks),
              w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
         / len(toks) AS top_word_frac,
       CASE WHEN len(grams) > 0
            THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
            ELSE 0.0 END AS dup_2gram_frac,
       CASE WHEN len(grams) > 0
            THEN CAST(list_max(list_transform(list_distinct(grams),
                   w -> len(list_filter(grams, x -> x = w)))) AS DOUBLE)
                   / len(grams)
            ELSE 0.0 END AS top_2gram_frac
FROM g
ORDER BY doc_id
""",
)
def text_repetition_metrics(spark, sf_dir):
    """Gopher-style repetition features per document (Rae et al. 2021,
    MassiveText quality filters): most-frequent-word fraction, duplicate
    2-gram fraction, most-frequent-2-gram fraction. Documents dominated by
    a repeated token or phrase are boilerplate/spam and get filtered
    before training.

    All-JVM higher-order functions (no Python), map-only per document —
    zero shuffles at any scale. The per-doc mode count is
    O(unique·tokens) inside one task, bounded by document length.
    Fractions are single divisions of exact integer counts — bit-equal
    across engines."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        docs.withColumn("toks", F.expr("split(text, ' ')"))
        .withColumn(
            "grams",
            # guard: Spark's sequence(1, 0) DESCENDS instead of returning
            # empty, so a 1-token doc would index element_at(toks, 0)
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) "
                "ELSE array() END"
            ),
        )
        .select(
            "doc_id",
            F.expr(
                "CAST(array_max(transform(array_distinct(toks), "
                "w -> size(filter(toks, x -> x = w)))) AS DOUBLE) / size(toks)"
            ).alias("top_word_frac"),
            F.expr(
                "CASE WHEN size(grams) > 0 THEN 1.0D - "
                "CAST(size(array_distinct(grams)) AS DOUBLE) / size(grams) "
                "ELSE 0.0D END"
            ).alias("dup_2gram_frac"),
            F.expr(
                "CASE WHEN size(grams) > 0 THEN "
                "CAST(array_max(transform(array_distinct(grams), "
                "w -> size(filter(grams, x -> x = w)))) AS DOUBLE) / size(grams) "
                "ELSE 0.0D END"
            ).alias("top_2gram_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gopher quality rules — the MassiveText document-level filter battery
# ---------------------------------------------------------------------------
@register_query(
    "text_gopher_quality",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(toks, w -> strlen(w))) AS DOUBLE)
           / len(toks) AS mean_word_len,
         CAST(len(list_filter(toks, w -> regexp_full_match(w, '[a-z]+')))
              AS DOUBLE) / len(toks) AS frac_alpha,
         CAST(len(list_distinct(list_filter(toks,
              w -> w IN ({", ".join(f"'{w}'" for w in STOP_EN)}))))
              AS BIGINT) AS n_stop_hits
  FROM t
)
SELECT doc_id, n_words, mean_word_len, frac_alpha, n_stop_hits,
       (n_words BETWEEN 20 AND 90)
         AND (mean_word_len BETWEEN 3 AND 10)
         AND frac_alpha >= 0.8
         AND n_stop_hits >= 2 AS passes
FROM m
ORDER BY doc_id
""",
)
def text_gopher_quality(spark, sf_dir):
    """Gopher/MassiveText document-quality rules (Rae et al. 2021, Table A1
    — adapted thresholds for the fixture's word-soup scale): word count in
    [20, 90], mean word length in [3, 10], >= 80% alphabetic words, and at
    least 2 distinct stopword hits. Emits every rule input plus the
    combined pass flag so a pipeline can both filter and audit per-rule
    rejection rates.

    Map-only JVM pipeline (split + higher-order filters), zero shuffles at
    any scale; every fraction is one division of exact integer counts."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = _tokens()
    n_words = F.size(toks).cast("long")
    mean_len = (
        F.aggregate(
            F.transform(toks, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).cast("double")
        / n_words
    )
    frac_alpha = (
        F.size(F.filter(toks, lambda w: w.rlike("^[a-z]+$"))).cast("double") / n_words
    )
    stop_arr = F.array(*[F.lit(w) for w in STOP_EN])
    n_stop = F.size(F.array_distinct(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))).cast("long")
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha"),
        n_stop.alias("n_stop_hits"),
    )
    return m.select(
        "*",
        (
            F.col("n_words").between(20, 90)
            & F.col("mean_word_len").between(3, 10)
            & (F.col("frac_alpha") >= 0.8)
            & (F.col("n_stop_hits") >= 2)
        ).alias("passes"),
    ).orderBy("doc_id")
