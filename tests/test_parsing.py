"""Unit + property tests for the scalar function library (SURVEY F1-F8).

Mirrors the reference's golden examples (ESPECIFICACIONES_FORMATOS.md:
dates '1/11/2025', amounts '$550.00'→550.0, '"$1,200.00"'→1200.0) and
its probarFormatos smoke (Code.gs:2200-2207), industrialized with
assertions + hypothesis round-trips.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.functions.parsing import (
    clean_string,
    coerce_checkbox,
    dates_equal,
    format_date_dmy,
    money_equal,
    parse_date_dmy,
    parse_money,
    spanish_month_name,
)


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1/11/2025", dt.date(2025, 11, 1)),
        ("15/11/2025", dt.date(2025, 11, 15)),
        ("2025-11-15", dt.date(2025, 11, 15)),
        ("31/2/2025", None),  # invalid date → NULL → dropped by P4
        ("garbage", None),
        ("", None),
    ],
)
def test_parse_date_golden(spark, raw, expected):
    assert one(spark, parse_date_dmy(F.lit(raw))) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("$550.00", 550.0),
        ('"$1,200.00"', 1200.0),
        ("  $1,234,567.89 ", 1234567.89),
        ("550", 550.0),
        (None, 0.0),
        ("N/A", 0.0),  # unparseable → 0, not NULL (Code.gs:176)
        ("", 0.0),
    ],
)
def test_parse_money_golden(spark, raw, expected):
    assert one(spark, parse_money(F.lit(raw))) == pytest.approx(expected)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ('"Platón Frías"', "Platón Frías"),
        ("  0-17850  ", "0-17850"),
        (None, ""),
        ('"quoted" not outer', '"quoted" not outer'),
    ],
)
def test_clean_string(spark, raw, expected):
    assert one(spark, clean_string(F.lit(raw))) == expected


def test_money_tolerance(spark):
    assert one(spark, money_equal(F.lit(100.0), F.lit(100.009)))
    assert not one(spark, money_equal(F.lit(100.0), F.lit(100.011)))


def test_dates_equal_null_safe(spark):
    assert one(spark, dates_equal(F.lit(None).cast("date"), F.lit(None).cast("date")))
    assert not one(spark, dates_equal(F.lit("2025-01-01").cast("date"), F.lit(None).cast("date")))


def test_format_date_no_padding(spark):
    assert one(spark, format_date_dmy(F.lit("2025-11-01").cast("date"))) == "1/11/2025"


def test_spanish_month(spark):
    assert one(spark, spanish_month_name(F.lit("2025-11-01").cast("date"))) == "Noviembre"
    assert one(spark, spanish_month_name(F.lit("2025-01-01").cast("date"))) == "Enero"


@pytest.mark.parametrize(
    "raw,expected",
    [("TRUE", True), ("true", True), ("SI", True), ("1", True), ("Sí", True),
     ("no", False), ("", False), (None, False), ("FALSE", False)],
)
def test_checkbox(spark, raw, expected):
    assert one(spark, coerce_checkbox(F.lit(raw))) == expected


@settings(max_examples=20, deadline=None)
@given(st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2100, 12, 31)))
def test_date_roundtrip_property(spark, d):
    """formatearFecha ∘ parsearFecha identity on valid dates (SURVEY §5.2)."""
    lit = F.lit(d.isoformat()).cast("date")
    assert one(spark, parse_date_dmy(format_date_dmy(lit))) == d


@settings(max_examples=20, deadline=None)
@given(st.floats(min_value=0, max_value=10_000_000, allow_nan=False).map(lambda x: round(x, 2)))
def test_money_roundtrip_property(spark, amount):
    """parsearMonto invariant under $/,-insertion (SURVEY §5.2)."""
    formatted = F.concat(F.lit("$"), F.format_number(F.lit(amount), 2))
    assert one(spark, parse_money(formatted)) == pytest.approx(amount)
