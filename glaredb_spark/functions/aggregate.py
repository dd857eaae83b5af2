"""Aggregate function registry — reference aggregate surface under GlareDB
names (crates/glaredb_core/src/functions/aggregate/builtin/mod.rs:48-74).

All map to Spark's partial/final aggregation model — the same
partial-state + combine + finalize layout the reference implements
(functions/aggregate/simple.rs). approx_count_distinct is HLL on both sides
(reference statistics/hll.rs); approx_quantile is t-digest in the reference
(statistics/tdigest.rs) and a Greenwald-Khanna sketch in Spark — same
contract, different sketch (documented divergence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def string_agg(col, sep: str = ",", sort: bool = True) -> Column:
    """Reference string_agg (aggregate/builtin/string_agg.rs). Spark's
    collect_list order is nondeterministic, so results are sorted by value
    by default — pass sort=False for arrival order (single-partition only).
    """
    lst = F.collect_list(col)
    if sort:
        lst = F.array_sort(lst)
    return F.array_join(lst, sep)


agg: dict[str, object] = {
    "sum": F.sum,
    "avg": F.avg,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "first": F.first,
    "stddev_pop": F.stddev_pop,
    "stddev_samp": F.stddev_samp,
    "var_pop": F.var_pop,
    "var_samp": F.var_samp,
    "covar_pop": F.covar_pop,
    "covar_samp": F.covar_samp,
    "corr": F.corr,
    "regr_count": F.regr_count,
    "regr_avgx": F.regr_avgx,
    "regr_avgy": F.regr_avgy,
    "regr_r2": F.regr_r2,
    "regr_slope": F.regr_slope,
    "string_agg": string_agg,
    "bool_and": F.bool_and,
    "bool_or": F.bool_or,
    "bit_and": F.bit_and,
    "bit_or": F.bit_or,
    "approx_count_distinct": F.approx_count_distinct,
    "approx_quantile": lambda c, q=0.5: F.percentile_approx(c, q),
    # DISTINCT modifiers (distinct_aggregates.rs)
    "count_distinct": F.countDistinct,
    "sum_distinct": F.sum_distinct,
}
