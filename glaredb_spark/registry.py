"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator/query from SURVEY.md §2 registers here with a
Spark builder and (where SQL-expressible) a DuckDB oracle SQL string. The
driver's correctness gate runs both sides at sf=0.01 and compares row count,
schema, and order-insensitive value hashes — so builders alias every computed
column to the same name the oracle uses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# The driver records CORRECTNESS rows for the FIRST 50 entries of
# __spark_entry__.queries(). Round-3 rotation (VERDICT r2 'Next round' #3):
# the 45 registered queries that have never had a driver row in ANY round
# (r1 ∪ r2 sampled 67 of 112) get the prefix, so by end of r3 every §2
# family has appeared green in some driver file. Five previously-green
# representatives are kept: fn_math_battery MUST re-run (the one red r2 row
# — sign() int-vs-double fix needs a green driver row to close it), plus one
# regression sentinel each for tpch / dedup / ANN / events. Every rotated-
# out query still runs in the local strict gate (tests/test_oracle_parity.py)
# every round.
GATE_PRIORITY: list[str] = [
    # the r2 red row, re-proving the sign() cast fix
    "fn_math_battery",
    # regression sentinels (green in r1+r2, kept to catch regressions)
    "tpch_q01",
    "dedup_minhash_lsh",
    "knn_bruteforce_cosine",
    "events_sessionize",
    # one representative per single-query module so every operator family
    # keeps a row in THIS round's driver file too (test_registry invariant)
    "rel_lateral",  # relational2 — r1-green only, re-proving
    "dedup_components",
    "text_contamination_13gram",
    "rel_recursive_cte",
    "asof_purchase_view",
    # —— the 45 never-driver-sampled queries ——
    "rel_window_frames",
    "rel_scalar_rows",
    "knn_ivf_cosine",
    "emb_unit_quantize",
    "emb_label_centroids",
    "dedup_simhash_weighted",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_bpe_token_count",
    "text_word_freq_topk",
    "events_tumbling_hourly",
    "events_daily_type_pivot",
    "events_retention_cohorts",
    "events_funnel",
    "events_json_props",
    "events_time_rollup",
    "multimodal_binary_meta",
    "multimodal_decode_wav",
    "multimodal_video_meta",
    "multimodal_frame_sample",
    "fn_like_battery",
    "fn_decimal_battery",
    "fn_percentile_battery",
    "fn_agg_stats_exact",
    "fn_list_struct_battery",
    "fn_native_approx",  # no oracle: rows-only driver check, by design
    "cb_filter_agg",
    "cb_groupby_highcard",
    "cb_groupby_distinct_topk",
    "cb_like_topk",
    "cb_filtered_daily_topk",
    "tpcds_moving_avg",
    "tpcds_over_avg_spend",
    "tpcds_order_buckets",
    "tpcds_multi_exists",
    "tpcds_tri_channel_intersect",
    "rel_skew_salted_agg",
    "pipeline_quality_quantile",
    "pipeline_mixture_sample",
]


def ordered_names() -> list[str]:
    """GATE_PRIORITY first (validated against the registry), then every
    remaining query in registration order."""
    missing = [n for n in GATE_PRIORITY if n not in QUERIES]
    assert not missing, f"GATE_PRIORITY names not registered: {missing}"
    prio = set(GATE_PRIORITY)
    return [*GATE_PRIORITY, *[n for n in QUERIES if n not in prio]]


def register_query(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder, with an
    optional DuckDB oracle SQL equivalent."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import glaredb_spark.tpch  # noqa: F401
    import glaredb_spark.operators.relational  # noqa: F401
    import glaredb_spark.operators.relational2  # noqa: F401
    import glaredb_spark.operators.dedup  # noqa: F401
    import glaredb_spark.operators.similarity  # noqa: F401
    import glaredb_spark.operators.text  # noqa: F401
    import glaredb_spark.operators.events  # noqa: F401
    import glaredb_spark.operators.multimodal  # noqa: F401
    import glaredb_spark.operators.analytics  # noqa: F401
    import glaredb_spark.operators.asof  # noqa: F401
    import glaredb_spark.operators.recursive  # noqa: F401
    import glaredb_spark.operators.clickbench  # noqa: F401
    import glaredb_spark.operators.tpcds  # noqa: F401
    import glaredb_spark.functions.queries  # noqa: F401
    import glaredb_spark.operators.skew  # noqa: F401
    import glaredb_spark.operators.pipeline  # noqa: F401
    import glaredb_spark.operators.sampling  # noqa: F401
    import glaredb_spark.operators.components  # noqa: F401
    import glaredb_spark.operators.contamination  # noqa: F401
