"""Skew-mitigation operators: salted joins and salted two-phase aggregation.

The reference is single-node and never shuffles, so key skew costs it
nothing (hash_join/mod.rs partitions only across local threads). On a
cluster, a shuffle join or aggregation keyed on a hot value funnels that
key's entire volume through one task — the classic 100 TB failure mode.
Two standard mitigations, both deterministic and result-identical to the
unsalted plan:

- ``salted_join(big, small, keys, n_salts)`` — append a deterministic
  salt in [0, n) to the big side's join key and replicate the small side
  n times, so one hot key spreads over n tasks. The salt derives from a
  hash of the big row (or a caller-named unique column) — NOT rand(),
  which breaks retry determinism (a re-executed task must salt rows
  identically or speculative execution duplicates/loses matches).
- ``salted_groupby(df, keys, specs, n_salts)`` — aggregate on
  (keys + salt) first, then combine partials on keys alone. Only
  algebraically decomposable aggregates are accepted (sum/count/min/max
  — avg callers compose sum/count), the same partial/final split Spark's
  own HashAggregate uses; the salt stage bounds ANY single task's state
  even when AQE's skew handling is off (AQE splits skewed JOIN
  partitions, not aggregation state).

Spark also ships AQE skew-join splitting (spark.sql.adaptive.skewJoin) —
that's the first line of defense and stays on engine-wide; these
operators are for the aggregation case and for joins whose skew AQE
can't see (e.g. post-explode fan-out, where stats lag the blowup).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__glaredb_salt"

_PARTIAL = {
    "sum": F.sum,
    # COUNT(col) skips NULLs like SQL; pass "*" for COUNT(*) row counting.
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(F.col(c)),
    "min": F.min,
    "max": F.max,
}
_FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _salt_col(df: DataFrame, n_salts: int, unique_col: str | None) -> Column:
    basis = [F.col(unique_col)] if unique_col else [F.col(c) for c in df.columns]
    return F.pmod(F.hash(*basis), F.lit(n_salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
    unique_col: str | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across ``n_salts``
    tasks. ``small`` is replicated n_salts times (only ever use a small
    dimension side — replication is the price of the spread).

    Only inner/left(-semi/-anti) joins are accepted: with how='right' or
    'full' every UNMATCHED small-side row would be emitted once per salt
    replica (n_salts duplicate rows), silently corrupting the result.
    """
    keys = list(keys)
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join how={how!r} unsupported: the replicated small side "
            "duplicates unmatched rows under right/full joins; use a plain "
            "join (AQE skew handling) for those"
        )
    big_s = big.withColumn(_SALT, _salt_col(big, n_salts, unique_col))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [*keys, _SALT], how).drop(_SALT)


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    specs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: partials on (keys + salt), final on keys.

    ``specs`` maps output column -> (agg, input column); agg in
    sum/count/min/max. Result is identical to a direct groupBy — the salt
    only bounds per-task state.
    """
    keys = list(keys)
    bad = [a for a, _ in specs.values() if a not in _PARTIAL]
    if bad:
        raise ValueError(
            f"non-decomposable aggregate(s) {bad}; salted_groupby supports "
            f"{sorted(_PARTIAL)} (compose avg from sum/count)"
        )
    partial = (
        df.withColumn(_SALT, _salt_col(df, n_salts, unique_col))
        .groupBy(*keys, _SALT)
        .agg(
            *[
                _PARTIAL[agg](F.col(col) if agg != "count" else col).alias(out)
                for out, (agg, col) in specs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _FINAL[agg](F.col(out)).alias(out)
            for out, (agg, _col) in specs.items()
        ]
    )


# ---------------------------------------------------------------------------
# registered queries — correctness gate proves salted == unsalted semantics
# ---------------------------------------------------------------------------
from glaredb_spark.registry import register_query  # noqa: E402
from glaredb_spark.sources.files import load_tables  # noqa: E402

_DIM = [
    ("click", 1),
    ("view", 2),
    ("purchase", 10),
    ("signup", 5),
    ("error", 0),
]


@register_query(
    "rel_skew_salted_join",
    oracle="""
WITH dim(event_type, weight) AS (
  VALUES ('click', 1), ('view', 2), ('purchase', 10), ('signup', 5),
         ('error', 0))
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT) * d.weight) AS BIGINT)
         AS weighted_cents
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def rel_skew_salted_join(spark, sf_dir):
    """events ⋈ 5-row dim on a 5-value key — every key is 'hot' by
    construction; the salted join spreads each over n_salts tasks. The
    gate proves result identity with the plain join (oracle is unsalted).
    Sums use integer cents (double accumulation is order-dependent and the
    salt changes accumulation order)."""
    events = load_tables(spark, sf_dir, "events")["events"]
    dim = spark.createDataFrame(_DIM, ["event_type", "weight"])
    joined = salted_join(
        events, dim, ["event_type"], n_salts=8, unique_col="event_id"
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents * F.col("weight")).cast("long").alias("weighted_cents"),
        )
        .orderBy("event_type")
    )


@register_query(
    "rel_skew_salted_agg",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def rel_skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation over the 5-value key; identical
    results to the direct GROUP BY the oracle runs."""
    events = load_tables(spark, sf_dir, "events")["events"]
    prepped = events.withColumn(
        "cents_in", F.round(F.col("value") * 100).cast("long")
    )
    out = salted_groupby(
        prepped,
        ["event_type"],
        {
            "n": ("count", "event_id"),
            "cents": ("sum", "cents_in"),
            "first_ts": ("min", "ts"),
            "last_ts": ("max", "ts"),
        },
        n_salts=8,
        unique_col="event_id",
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
        "first_ts",
        "last_ts",
    ).orderBy("event_type")
