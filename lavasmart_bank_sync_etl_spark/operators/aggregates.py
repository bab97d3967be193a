"""Aggregation views (SURVEY.md §2.7, A1-A4 and J4).

These are the reference's stored spreadsheet formulas re-expressed as
queries over the source of truth — recomputed, never materialized as
stale cell formulas (SURVEY S10). All are hash aggregates with map-side
partial aggregation; at 100 TB the shuffle carries only
(group_key, partial_sum) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sum_by_key(df: DataFrame, key: str, amount: str = "monto", alias: str = "total") -> DataFrame:
    """A1 — per-key SUM (the per-lot SUMIF, Code.gs:499)."""
    return df.groupBy(key).agg(F.round(F.sum(amount), 2).alias(alias))


def daily_totals(df: DataFrame, date_col: str = "sale_date", amount: str = "monto") -> DataFrame:
    """A3 — per-day totals (xlsx ``totales!B`` SUMIFS)."""
    return df.groupBy(date_col).agg(F.round(F.sum(amount), 2).alias("total"))


def lot_reconciliation(
    closures: DataFrame,
    cards: DataFrame,
    lot_col: str = "lote",
    amount: str = "monto",
    declared: str = "total_cierre",
) -> DataFrame:
    """J4 + A1 + A2 — lot reconciliation (Code.gs:499-500).

    ``total_folios`` = SUM of card amounts per lot; ``cuadra`` = ✅ iff
    declared total equals the computed sum **exactly** (the one place
    the reference compares money without tolerance — Code.gs:500).

    The per-lot aggregate is tiny relative to cards, and closures is a
    small dimension → aggregate first, then join (never join-then-agg,
    which would shuffle the full fact table twice).
    """
    per_lot = cards.groupBy(F.col(lot_col)).agg(F.round(F.sum(amount), 2).alias("total_folios"))
    joined = closures.join(per_lot, on=lot_col, how="left")
    total_folios = F.coalesce(F.col("total_folios"), F.lit(0.0))
    return joined.select(
        F.col(lot_col),
        F.col(declared),
        total_folios.alias("total_folios"),
        F.when(F.round(F.col(declared), 2) == F.round(total_folios, 2), F.lit("✅"))
        .otherwise(F.lit("❌"))
        .alias("cuadra"),
    )


def run_summary(plan: DataFrame, category_col: str = "category", action_col: str = "action") -> DataFrame:
    """A4 — per-(category, action) counts over a staged mutation plan
    (Code.gs:846-854)."""
    return plan.groupBy(category_col, action_col).agg(F.count(F.lit(1)).alias("n"))


def table_fingerprint(df: DataFrame, month_col: str | None = None) -> DataFrame:
    """Order-insensitive content fingerprint (the CH1 primitive,
    generalized): per group - row count plus XOR of a 60-bit md5 row
    digest over every column; one row per month (or one row total).

    This is how a 100 TB source-destination sync is *verified*: both
    sides reduce independently to a handful of rows and compare those.
    XOR is commutative/associative (shuffle-order-proof) and cannot
    overflow; the row digest covers all columns cast to string with
    a NULL sentinel so column slips can't cancel out."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit(" ")) for c in df.columns]
    h60 = F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10).cast("long")
    if month_col is not None and month_col in df.columns:
        grouped = df.select(
            F.date_format(F.col(month_col), "yyyy-MM").alias("month"), h60.alias("_h")
        ).groupBy("month")
    else:
        grouped = df.select(F.lit("*").alias("month"), h60.alias("_h")).groupBy("month")
    return grouped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_h)").alias("xor_fingerprint"),
    )
