"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side by side, then compares
row count, column names, and values exactly (column-name-sorted, row-sorted)
— stricter than any plausible driver hash, so passing here implies passing
the driver's CORRECTNESS check.
"""

from __future__ import annotations

import math

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


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return [f"column mismatch: spark={sc} oracle={oc}"]
    if len(spark_pdf) != len(oracle_pdf):
        return [f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"]
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
