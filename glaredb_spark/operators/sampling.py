"""Deterministic sampling / split operators for training-data pipelines.

``TABLESAMPLE`` / ``df.sample`` draw from engine-specific RNG streams —
unreproducible across engines, across Spark versions, and (for
per-partition RNG) across repartitions. Training pipelines need the
opposite: a row's split assignment must be a pure function of the row so
that train/held-out membership is stable run-over-run, engine-over-engine,
and under any repartitioning. Standard technique: hash a stable row key to
an integer in [0, D) and compare against rate thresholds (the same
md5→int64 machinery the dedup family uses — identical in Spark and
DuckDB, so the gate checks exact membership, not just counts).

Map-only (zero shuffle): at 100 TB a split is a filter fused into the
scan, never a sort/sample stage. Per-source rates enable mixture
weighting (sample web-crawl at 10%, books at 100%) with one broadcast-free
CASE expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from glaredb_spark.operators.dedup import _hash64, _o_hash64
from glaredb_spark.registry import register_query
from glaredb_spark.sources.files import load_tables

DENOM = 10_000  # basis points: rates are exact integers, no float compare


def split_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, DENOM) from a stable row key. ``salt``
    derives independent split dimensions from the same key (e.g. one salt
    for train/test, another for a dedup-holdout)."""
    return _hash64(F.concat(key.cast("string"), F.lit(salt))) % DENOM


def _o_split_bucket(key_expr: str, salt: str = "") -> str:
    return f"({_o_hash64(f'concat(CAST({key_expr} AS VARCHAR), ' + chr(39) + salt + chr(39) + ')')} % {DENOM})"


def deterministic_sample(
    df: DataFrame, key: str, rate_bp: int, *, salt: str = ""
) -> DataFrame:
    """Keep ~rate_bp/10000 of rows, membership a pure function of key."""
    return df.filter(split_bucket(F.col(key), salt) < rate_bp)


def train_test_split(
    df: DataFrame, key: str, test_bp: int, *, salt: str = ""
) -> DataFrame:
    """Adds a 'split' column ('test' for ~test_bp/10000 of rows)."""
    return df.withColumn(
        "split",
        F.when(split_bucket(F.col(key), salt) < test_bp, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates_bp: dict[str, int], *,
    default_bp: int = 0, salt: str = ""
) -> DataFrame:
    """Per-stratum rates (mixture weighting) as one CASE expression."""
    rate = F.lit(default_bp)
    for value, bp in sorted(rates_bp.items()):
        rate = F.when(F.col(stratum) == value, F.lit(bp)).otherwise(rate)
    return df.filter(split_bucket(F.col(key), salt) < rate)


@register_query(
    "pipeline_train_split",
    oracle=f"""
WITH tagged AS (
  SELECT source,
         CASE WHEN {_o_split_bucket('doc_id')} < 1000
              THEN 'test' ELSE 'train' END AS split,
         doc_id
  FROM documents)
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc
FROM tagged
GROUP BY source, split
ORDER BY source, split
""",
)
def pipeline_train_split(spark, sf_dir):
    """10% held-out split, membership hash-stable; the gate proves both
    engines assign every row to the same side."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        train_test_split(docs, "doc_id", 1000)
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "split")
    )


@register_query(
    "pipeline_mixture_sample",
    oracle=f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents
WHERE {_o_split_bucket('doc_id', 'mix')} <
      CASE WHEN lang = 'en' THEN 8000
           WHEN lang = 'de' THEN 4000
           ELSE 1500 END
GROUP BY lang
ORDER BY lang
""",
)
def pipeline_mixture_sample(spark, sf_dir):
    """Mixture weighting: sample en at 80%, de at 40%, rest at 15% — one
    map-only filter, exact cross-engine membership."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sampled = stratified_sample(
        docs, "doc_id", "lang", {"en": 8000, "de": 4000},
        default_bp=1500, salt="mix",
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
        )
        .orderBy("lang")
    )


TOKEN_BUDGET = 700  # per-source token budget for the registered query


def token_budget_take(
    df: DataFrame, *, group: str, order: str, tokens: Column, budget: int
) -> DataFrame:
    """Greedy per-group document selection under a token budget: take rows
    in `order` while the running token total stays <= budget.

    One shuffle on `group` (the window partition); the cumulative sum is
    computed inside each partition. Skew note for 100 TB: a single
    pathological group serializes in one task — but a budgeted take is
    inherently sequential per group (row k's admission depends on rows
    < k), and the scan stops mattering because the window reads only
    (group, order, n_toks)-projected columns. Real pipelines cap groups
    (sources/domains), not documents, so group count >> executor count."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_toks", tokens.cast("long"))
        .withColumn("cum_toks", F.sum("n_toks").over(w))
        .filter(F.col("cum_toks") <= budget)
    )


@register_query(
    "pipeline_token_budget",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
), c AS (
  SELECT source, doc_id, n_toks,
         CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
  FROM t
)
SELECT source, doc_id, n_toks, cum_toks
FROM c WHERE cum_toks <= {TOKEN_BUDGET}
ORDER BY source, doc_id
""",
)
def pipeline_token_budget(spark, sf_dir):
    """Per-source token-budget curation: admit documents (in stable
    doc_id order) until each source's running token count exceeds the
    budget — the 'cap every domain's contribution' step of corpus
    mixing (C4/Dolma-style per-source quotas). Exact integer cumsum, so
    both engines admit the identical document set."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    took = token_budget_take(
        docs,
        group="source",
        order="doc_id",
        tokens=F.size(F.split("text", " ")),
        budget=TOKEN_BUDGET,
    )
    return took.select("source", "doc_id", "n_toks", "cum_toks").orderBy(
        "source", "doc_id"
    )
