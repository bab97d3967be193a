"""Projection, cleaning, classification and window filters
(SURVEY.md §2.2, P1-P4).

All pure column expressions — these run fused inside the Parquet scan
stage (predicate pushdown + column pruning), so at 100 TB only the
consumed columns are read and the date window prunes partitions.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import clean_string, parse_date_dmy, parse_money

#: Classifier targets, in the reference's cascade order (Code.gs:722-734).
METHOD_TRANSFER = "TRANSFERENCIA"
METHOD_CARD = "TARJETA"
METHOD_CASH = "EFECTIVO"
METHOD_OTHER = "OTROS"
METHODS = [METHOD_TRANSFER, METHOD_CARD, METHOD_CASH, METHOD_OTHER]


def classify_method(col: Column | str) -> Column:
    """P2 — 4-way payment-method classifier (Code.gs:722-734).

    Case-insensitive *substring* cascade: TRANSFERENCIA > TARJETA >
    EFECTIVO > OTROS (empty/NULL/unknown all fall to OTROS). The raw
    value is kept by callers that need it (the ``others`` table stores
    it — Code.gs:1964).
    """
    c = F.col(col) if isinstance(col, str) else col
    up = F.upper(F.coalesce(c.cast("string"), F.lit("")))
    return (
        F.when(up.contains(METHOD_TRANSFER), F.lit(METHOD_TRANSFER))
        .when(up.contains(METHOD_CARD), F.lit(METHOD_CARD))
        .when(up.contains(METHOD_CASH), F.lit(METHOD_CASH))
        .otherwise(F.lit(METHOD_OTHER))
    )


def project_sales(df: DataFrame, colmap: Mapping[str, str]) -> DataFrame:
    """P1 — positional projection + rename + per-column cleaning
    (Code.gs:744-748; mapping requerimientos.md:83-92).

    ``colmap`` maps canonical name → source column name. Canonical
    names: folio, sale_date, cliente, servicio, monto, metodo_pago,
    banco. Cleaning: strings via F3, date via F1, money via F2.
    """
    string_cols = ("folio", "cliente", "servicio", "metodo_pago", "banco")
    exprs: list[Column] = []
    for canon, src in colmap.items():
        c = F.col(src)
        if canon == "sale_date":
            exprs.append(parse_date_dmy(c).alias(canon))
        elif canon == "monto":
            exprs.append(parse_money(c).alias(canon))
        elif canon in string_cols:
            exprs.append(clean_string(c).alias(canon))
        else:
            exprs.append(c.alias(canon))
    return df.select(*exprs)


def window_filter(
    df: DataFrame,
    start: dt.date | str,
    end: dt.date | str,
    date_col: str = "sale_date",
) -> DataFrame:
    """P3 — inclusive date-range predicate (Code.gs:740-741).

    Expressed as a ``between`` so Catalyst pushes it into the scan and
    prunes month partitions (the reference's tab-per-month selection,
    Code.gs:701-714, for free).
    """
    return df.where(F.col(date_col).between(F.lit(start).cast("date"), F.lit(end).cast("date")))


def null_guards(df: DataFrame, date_col: str = "sale_date", key_col: str = "folio") -> DataFrame:
    """P4 — drop rows with unparseable date or empty business key
    (Code.gs:738, 750)."""
    return df.where(F.col(date_col).isNotNull() & F.col(key_col).isNotNull() & (F.col(key_col) != ""))
