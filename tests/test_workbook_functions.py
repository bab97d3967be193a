"""Unit pins for the shared workbook-formula module
(functions/workbook.py): the blank-is-zero coercion, 2-dp display
rounding, and spine/lot key handling that BOTH the oracle-verified
xlsx2/xlsx3 queries and the render CLI depend on. The oracle parity
suite proves the composed queries; these pin the shared semantics
directly so a drive-by edit to the module fails here first, with a
readable case name."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.functions.workbook import (
    cuadra,
    daily_transfer_totals,
    lot_totals,
)


def test_cuadra_blank_is_zero_at_display_precision(spark):
    """E2 = IF(C2=D2,"✅","❌"): blanks compare as 0, both sides at the
    sheet's 2-dp display precision (Code.gs:500 + spreadsheet blank
    coercion)."""
    cases = [
        (None, None, "✅"),     # blank closure, no cards → 0 == 0
        (None, 0.0, "✅"),
        (0.0, None, "✅"),
        (10.0, 10.004, "✅"),   # equal at 2 dp
        (10.0, 10.006, "❌"),   # 10.01 at 2 dp
        (10.0, 9.996, "✅"),    # 9.996 → 10.00 at 2 dp
        (1500.0, 1500.0, "✅"),
        (None, 0.006, "❌"),    # 0.00 vs 0.01
    ]
    df = spark.createDataFrame(
        [(i, c, t) for i, (c, t, _) in enumerate(cases)],
        "i int, c double, t double",
    )
    out = {
        r["i"]: r["e"]
        for r in df.select(
            "i", cuadra(F.col("c"), F.col("t")).alias("e")
        ).collect()
    }
    for i, (c, t, want) in enumerate(cases):
        assert out[i] == want, (c, t, want, out[i])


def test_daily_totals_spine_semantics(spark):
    """One row per DISTINCT spine date; a date with no transfers shows
    0.00 (the SUMIFS over an empty range); null spine dates are
    outside the sheet's key space; transfer rows with null monto or
    null fecha do not contribute."""
    d1, d2, d3 = dt.date(2025, 1, 1), dt.date(2025, 1, 2), dt.date(2025, 1, 3)
    spine = spark.createDataFrame(
        [(d1,), (d1,), (d2,), (None,), (d3,)], "fecha date"
    )
    transfers = spark.createDataFrame(
        [(d1, 100.0), (d1, 23.456), (d2, None), (None, 99.0)],
        "fecha date, monto double",
    )
    rows = {
        r["fecha"]: r["transferencia"]
        for r in daily_transfer_totals(transfers, spine).collect()
    }
    assert rows == {d1: 123.46, d2: 0.0, d3: 0.0}


def test_lot_totals_excludes_blank_lots_and_zeroes_null_montos(spark):
    """SUMIF(Tarjetas!H:H, B2, Tarjetas!E:E): rows with no lot key are
    invisible to the sheet; a null monto sums as 0 (blank cell)."""
    cards = spark.createDataFrame(
        [("14", 100.0), ("14", None), ("", 50.0), (None, 60.0), ("15", 1.005)],
        "lote string, monto double",
    )
    rows = {r["lote"]: r["total_folios"] for r in lot_totals(cards).collect()}
    assert set(rows) == {"14", "15"}
    assert rows["14"] == 100.0
    # The money sum casts each row to DECIMAL(18,2) first: Spark's
    # double→decimal cast goes through Double.toString ("1.005") then
    # HALF_UP → 1.01. The oracle side embeds the same shortest-repr
    # digits as a DECIMAL literal, so its cast agrees (1.005 → 1.01);
    # the old ROUND(SUM(double), 2) form diverged here because DuckDB
    # ROUND works on the binary value (1.00499…) → 1.0. Real workbook
    # montos carry ≤2 dp, making the cast exact — this pins the
    # >2-dp corner.
    assert rows["15"] == 1.01
