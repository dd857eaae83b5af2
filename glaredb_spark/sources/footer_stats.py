"""Shared parquet-footer min/max accumulator for the lakehouse writers.

Both the Iceberg manifest bounds (iceberg_native._file_column_bounds)
and the Delta add-action stats (delta_native._file_stats_json) need the
same subtle per-column fold over row-group statistics: seed on the
first row group, merge while every row group has stats, and DROP the
column the moment any row group lacks them (an incomplete bound must
never be recorded — absent bounds mean "never skip", wrong bounds mean
wrong results)."""

from __future__ import annotations


def footer_minmax(pq_meta, nested: bool = False):
    """→ (mins, maxs, null_counts, complete_column_names) from a
    pyarrow parquet FileMetaData. Nested columns are skipped unless
    ``nested`` — then leaf stats come back under their dotted
    path_in_schema names ('info.score'); the caller owns filtering out
    list/map element paths (Delta's flat stats JSON keeps nested=False;
    Iceberg manifest bounds resolve dotted struct leaves by field id)."""
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    complete: set = set()
    for rg in range(pq_meta.num_row_groups):
        g = pq_meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name and not nested:
                continue
            st = col.statistics
            try:
                has = st is not None and st.has_min_max
                # force extraction here: pyarrow raises
                # ArrowNotImplementedError lazily on .min for types it
                # can't cast (e.g. some decimal physical layouts) — a
                # column with unreadable stats records NO bound, it
                # must not fail the write (r10)
                lo_hi = (st.min, st.max) if has else None
            except Exception:
                has, lo_hi = False, None
            if not has:
                mins.pop(name, None)
                maxs.pop(name, None)
                complete.discard(name)
                continue
            nulls[name] = nulls.get(name, 0) + int(st.null_count or 0)
            if rg == 0:
                mins[name], maxs[name] = lo_hi
                complete.add(name)
            elif name in complete:
                mins[name] = min(mins[name], lo_hi[0])
                maxs[name] = max(maxs[name], lo_hi[1])
    return mins, maxs, nulls, complete


def exact_epoch_micros(v, epoch) -> int:
    """Exact integer microseconds for a datetime difference —
    total_seconds()*1e6 loses a microsecond to float rounding for
    pre-1970 and far-future values."""
    td = v - epoch
    return (
        td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
    )


def range_excludes(lo, hi, op: str, w) -> bool:
    """True when the [lo, hi] bound/stats interval PROVES no value
    satisfies ``<op> w`` — the shared interval-exclusion check behind
    the Iceberg manifest-bounds pruner and the Delta stats pruner.
    Unknown operators never prune."""
    if op == "=":
        return w < lo or w > hi
    if op == ">":
        return hi <= w
    if op == ">=":
        return hi < w
    if op == "<":
        return lo >= w
    if op == "<=":
        return lo > w
    return False
