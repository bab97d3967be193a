"""Dimension enrichment & candidate-match joins (SURVEY.md §2.4
J5/J6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import MONEY_TOLERANCE


def enrich_urls(
    df: DataFrame,
    folio_dim: DataFrame,
    key: str = "folio",
    url_col: str = "url",
) -> DataFrame:
    """J6 — hyperlink-enrichment lookup (Code.gs:55-80, 2143-2164):
    broadcast left join against the folio→URL dimension; only rows
    missing a URL get backfilled (the reference's memo cache *is* a
    broadcast map). At 100 TB the dimension stays a broadcast as long
    as it fits; beyond that, bucket both sides on the key."""
    dim = F.broadcast(folio_dim.select(F.col(key), F.col(url_col).alias("_dim_url")))
    joined = df.join(dim, on=key, how="left")
    existing = F.col(url_col) if url_col in df.columns else F.lit(None).cast("string")
    return joined.withColumn(url_col, F.coalesce(existing, F.col("_dim_url"))).drop("_dim_url")


def bank_match_candidates(
    transfers: DataFrame,
    bank: DataFrame,
    amount_tol: float = MONEY_TOLERANCE,
    max_day_gap: int = 3,
) -> DataFrame:
    """J5 — bank-statement match suggestions (xlsx `Banco!F`,
    DOCUMENTACION_SISTEMA.md:90): candidate (transfer, bank movement)
    pairs with |amount Δ| < tol and dates within ``max_day_gap`` days.
    Humans decide; the engine only suggests.

    Scale shape: equi-join on rounded-amount ("cents bucket") so the
    tolerance match is a hash join + residual filter, plus a bounded
    date-distance predicate — never a full theta join. A ±1-cent
    neighbor-bucket explode covers tolerance across bucket edges.
    """
    t = transfers.select(
        F.col("folio"), F.col("fecha").alias("t_fecha"), F.col("monto").alias("t_monto")
    ).withColumn(
        "cents_bucket",
        F.explode(
            F.array(
                F.round(F.col("t_monto") * 100).cast("long") - 1,
                F.round(F.col("t_monto") * 100).cast("long"),
                F.round(F.col("t_monto") * 100).cast("long") + 1,
            )
        ),
    )
    b = bank.select(
        F.col("dia").alias("b_dia"), F.col("concepto"), F.col("abono"),
        F.round(F.col("abono") * 100).cast("long").alias("cents_bucket"),
    )
    return (
        t.join(b, on="cents_bucket")
        .where(
            (F.abs(F.col("t_monto") - F.col("abono")) < F.lit(amount_tol))
            & (F.abs(F.datediff(F.col("t_fecha"), F.col("b_dia"))) <= max_day_gap)
        )
        .select(
            "folio", "t_fecha", "t_monto", "b_dia", "concepto", "abono",
            F.abs(F.datediff(F.col("t_fecha"), F.col("b_dia"))).alias("day_gap"),
        )
        .distinct()
    )
