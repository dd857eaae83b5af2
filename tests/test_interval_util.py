"""Unit tests for functions/interval_util.py (reference single-interval
model: parse + Postgres display + SQL rewrites). End-to-end:
slt standard/cast/interval.slt."""

from glaredb_spark.functions.interval_util import (
    parse_interval_text,
    pg_format_interval,
    rewrite_intervals,
)


def test_parse_bare_number_is_seconds():
    assert parse_interval_text("1") == (0, 1_000_000)


def test_parse_mixed_units():
    m, us = parse_interval_text("2 centuries 4 months 8 hours 2 mins 1 second")
    assert m == 2404
    assert us == 8 * 3_600_000_000 + 2 * 60_000_000 + 1_000_000


def test_parse_milliseconds():
    m, us = parse_interval_text("5 second 289 milliseconds 1 hour")
    assert (m, us) == (0, 3_600_000_000 + 5_000_000 + 289_000)


def test_parse_rejects_non_interval():
    assert parse_interval_text("not an interval") is None
    assert parse_interval_text("") is None


def test_format_pg_styles():
    assert pg_format_interval(1, 0) == "1 mon"
    assert pg_format_interval(36, 0) == "3 years"
    assert pg_format_interval(2404, 8 * 3_600_000_000 + 2 * 60_000_000 + 1_000_000) == \
        "200 years 4 mons 08:02:01"
    assert pg_format_interval(0, 1_000_000) == "00:00:01"
    assert pg_format_interval(0, 3_600_000_000 + 5_289_000) == "01:00:05.289"
    assert pg_format_interval(0, 2 * 86_400_000_000) == "2 days"


def test_rewrite_mixed_literal_to_display_string():
    out = rewrite_intervals(
        "select interval '2 centuries 4 months 8 hours 2 mins 1 second'"
    )
    assert "'200 years 4 mons 08:02:01'" in out


def test_rewrite_pure_dt_multiunit_to_canonical():
    out = rewrite_intervals("select interval '5 second 289 milliseconds 1 hour'")
    assert "INTERVAL '0 01:00:05.289000' DAY TO SECOND" in out


def test_rewrite_bare_number_literal():
    out = rewrite_intervals("select INTERVAL '1'")
    assert "INTERVAL '0 00:00:01' DAY TO SECOND" in out


def test_single_unit_literal_untouched():
    sql = "select ts + INTERVAL '1 day' from t"
    assert rewrite_intervals(sql) == sql


def test_typed_literal_untouched():
    sql = "select INTERVAL '3' YEAR, INTERVAL '5 10:20:30' DAY TO SECOND"
    assert rewrite_intervals(sql) == sql


def test_column_quantity_becomes_make_interval():
    out = rewrite_intervals("select interval v day from s")
    assert "make_dt_interval(v, 0, 0, 0)" in out
    out = rewrite_intervals("select interval n months from s")
    assert "make_ym_interval(0, n)" in out


def test_numeric_quantity_untouched():
    sql = "select interval 3 years"
    assert rewrite_intervals(sql) == sql
