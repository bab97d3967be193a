"""Spreadsheet-formula semantics of the reference workbook's computed
sheets, shared by the xlsx2/xlsx3 egress queries
(queries_workbook.py) and the ``render`` CLI verb (cli.py) so the
formula rules — blank-is-zero coercion, 2-dp rounding, the ✅/❌
balance check — live exactly once.

Reference provenance:

- ``totales!B2 = SUMIFS(Conciliacion_Transferencias!$F$2:$F1000,
  Conciliacion_Transferencias!$A$2:$A1000, $A2)`` — the shipped
  workbook's own sheet formula (sheet7.xml).
- ``Cierres_Lotes!D2 = SUMIF(Tarjetas!H:H, B2, Tarjetas!E:E)`` and
  ``E2 = IF(C2=D2,"✅","❌")`` — the formulas the reference CREATES
  for the lot-closure sheet (Code.gs:499-500).

Scale note: both aggregations are keyed groupBys with map-side
partial aggregation; output cardinality is #days / #lots —
dimension-grade at any input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: money displays at 2 decimal places everywhere in the workbook
ROUND_DP = 2

#: money is summed at an explicit fixed decimal precision (ADVICE r8):
#: the per-row cast is exact for 2-dp money values, the decimal SUM is
#: order-independent, and the final double cast of the same exact
#: decimal is deterministic — so Spark and the DuckDB oracle can never
#: diverge on a .xx5 rounding boundary the way ROUND(SUM(double), 2)
#: could when engines sum in different orders
MONEY = "decimal(18,2)"


def daily_transfer_totals(transfers: DataFrame, spine: DataFrame) -> DataFrame:
    """``totales!B`` — one row per spine date with the day's transfer
    SUMIFS, blank (no sales that day) coerced to 0.0, exact 2-dp money
    summation (``MONEY``). ``spine`` is any frame with a ``fecha``
    column (the sheet's Fecha rows, or a generated continuous day
    range); it is deduped here so a repeated spine date cannot
    double-count the join. Returns columns ``(fecha, transferencia)``."""
    per_day = (
        transfers
        .where(F.col("fecha").isNotNull() & F.col("monto").isNotNull())
        .groupBy("fecha")
        .agg(F.sum(F.col("monto").cast(MONEY)).alias("_sum"))
    )
    return (
        spine.select("fecha")
        .where(F.col("fecha").isNotNull())
        .distinct()
        .join(per_day, "fecha", "left")
        .select(
            "fecha",
            F.coalesce(F.col("_sum").cast("double"), F.lit(0.0)).alias(
                "transferencia"
            ),
        )
    )


def lot_totals(cards: DataFrame) -> DataFrame:
    """``Cierres_Lotes!D`` — per-lot SUMIF over the cards table
    (Code.gs:499), blank montos as zero, exact 2-dp money summation
    (``MONEY``). Rows with no lot are outside the sheet's key space
    and excluded. Returns columns ``(lote, total_folios)``."""
    return (
        cards
        .where(F.col("lote").isNotNull() & (F.col("lote") != ""))
        .groupBy("lote")
        .agg(
            F.sum(F.coalesce("monto", F.lit(0.0)).cast(MONEY))
            .cast("double")
            .alias("total_folios")
        )
    )


def cuadra(total_cierre: Column, total_folios: Column) -> Column:
    """``Cierres_Lotes!E2 = IF(C2=D2,"✅","❌")`` (Code.gs:500) under
    spreadsheet blank-is-zero semantics, comparing both sides at the
    sheet's 2-dp display precision."""
    return F.when(
        F.round(F.coalesce(total_cierre, F.lit(0.0)), ROUND_DP)
        == F.round(F.coalesce(total_folios, F.lit(0.0)), ROUND_DP),
        F.lit("✅"),
    ).otherwise(F.lit("❌"))
