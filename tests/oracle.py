"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side by side, then compares
row count, column names, values exactly (column-name-sorted, row-sorted),
AND per-column dtype classes. The dtype-class check exists because the
driver's value hash FORMATS cells: an int -1 and a float -1.0 are
value-equal but hash-different (this is exactly how fn_math_battery slipped
through the r2 local gate while failing the driver — sign() is TINYINT in
DuckDB, DOUBLE in Spark). A query passes here only if both engines agree on
the class (int/float/bool/datetime/date/decimal/str/...) of every column.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import pandas as pd

from glaredb_spark.session import TPCH_TABLES


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TPCH_TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                (hasattr(v, "tolist") and not isinstance(v, str)) else v
            )
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (math.isnan(a) and math.isnan(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cell_eq(x, y) for x, y in zip(a, b))
    return a == b


def _col_class(s: pd.Series) -> str:
    """Dtype class of a column as the driver's value-formatter would see it.

    Classes deliberately distinguish int from float (-1 vs -1.0 formats
    differently) and date from datetime (2024-01-01 vs 2024-01-01 00:00:00),
    but not int8 from int64 (both format the same).
    """
    dt = s.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    nn = s.dropna()
    if nn.empty:
        return "empty"  # all-null: class unknowable, never flag
    v = nn.iloc[0]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, (_dt.datetime, pd.Timestamp)):
        return "datetime"
    if isinstance(v, _dt.date):
        return "date"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        return "array"
    return type(v).__name__


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return [f"column mismatch: spark={sc} oracle={oc}"]
    # The DRIVER's canonicalizer cannot sort array/struct cells (pandas
    # lexsort raises "unhashable type: 'list'" — exactly how
    # emb_unit_quantize erred in r3). Reject those shapes locally so a
    # driver-incompatible query fails here first; serialize nested output
    # to strings (concat_ws / array_to_string) or explode it instead.
    for col in sc:
        for df, side in ((spark_pdf, "spark"), (oracle_pdf, "oracle")):
            cls = _col_class(df[col])
            if cls in ("array", "dict", "ndarray") or cls == "tuple":
                errs.append(
                    f"col {col}: top-level {cls} output on {side} side is "
                    "driver-incompatible — serialize it to a string"
                )
    if errs:
        return errs
    if len(spark_pdf) != len(oracle_pdf):
        return [f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"]
    for col in sc:
        a, b = _col_class(spark_pdf[col]), _col_class(oracle_pdf[col])
        if a != b and "empty" not in (a, b):
            errs.append(f"col {col}: dtype-class mismatch spark={a} oracle={b}")
    if errs:
        return errs
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if not _cell_eq(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            errs.append(
                f"col {col}: {len(bad)}/{len(sv)} cells differ; first at row {i}: "
                f"spark={a!r} oracle={b!r}"
            )
    return errs


def assert_parity(spark, name: str, sf_dir: str) -> None:
    from glaredb_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    assert name in ORACLES, f"no oracle registered for {name}"
    oracle_pdf = duckdb_oracle(ORACLES[name], sf_dir)
    errs = compare_frames(spark_pdf, oracle_pdf)
    assert not errs, f"{name} parity failed: " + "; ".join(errs)
