"""Unit tests for functions/ident_binder.py — the reference's
case-insensitive identifier resolution over case-sensitive storage
(slt/standard/ident/case_sensitivity_ambiguous.slt)."""

import pytest

from glaredb_spark.functions.ident_binder import (
    AmbiguousColumnError,
    create_has_case_dup_columns,
    resolve_case_idents,
)


def test_create_case_dup_detection():
    assert create_has_case_dup_columns(
        'CREATE TABLE t1 (`Acolumn` INT, `Bcolumn` STRING, `bcolumn` STRING)'
    )
    assert not create_has_case_dup_columns(
        "CREATE TABLE t1 (a INT, b STRING, c STRING)"
    )
    assert not create_has_case_dup_columns("SELECT 1")
    # nested type parens don't confuse the column-list scan
    assert not create_has_case_dup_columns(
        "CREATE TABLE t (a DECIMAL(10,2), b INT)"
    )


class _FakeTable:
    def __init__(self, columns):
        self.columns = columns


class _FakeSpark:
    def __init__(self, tables):
        self._tables = tables

    def table(self, name):
        return _FakeTable(self._tables[name])


def test_resolve_unique_and_exact():
    spark = _FakeSpark({"t1": ["Acolumn", "Bcolumn", "bcolumn"]})
    out = resolve_case_idents("SELECT acolumn FROM t1 ORDER BY 1", spark)
    assert out == "SELECT `Acolumn` FROM t1 ORDER BY 1"
    # backtick-quoted (the rewritten double-quote form) stays exact
    out = resolve_case_idents("SELECT `bcolumn`, `Bcolumn` FROM t1", spark)
    assert out == "SELECT `bcolumn`, `Bcolumn` FROM t1"


def test_resolve_ambiguous_raises():
    spark = _FakeSpark({"t1": ["Bcolumn", "bcolumn"]})
    with pytest.raises(AmbiguousColumnError, match="bcolumn"):
        resolve_case_idents("SELECT bcolumn FROM t1", spark)


def test_resolve_skips_functions_and_literals():
    spark = _FakeSpark({"t1": ["Upper", "x"]})
    # upper( is a call, 'upper' is a literal — neither is the column
    out = resolve_case_idents("SELECT upper('upper'), x FROM t1", spark)
    assert out == "SELECT upper('upper'), x FROM t1"
