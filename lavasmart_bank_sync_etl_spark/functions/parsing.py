"""Scalar parsing/comparison functions (SURVEY.md §2.8, F1-F8).

Each function mirrors the observable semantics of a reference scalar
(cited per-function) but is implemented as a pure Spark column
expression — JVM-side, whole-stage-codegen friendly, zero Python UDFs.
At 100 TB these run inside the scan stage at full vectorized speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Spanish month names, 1-indexed (reference: Code.gs:234-240).
SPANISH_MONTHS = [
    "Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio",
    "Julio", "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre",
]

#: Money comparison tolerance (reference: Code.gs:199-202).
MONEY_TOLERANCE = 0.01


def parse_date_dmy(col: Column | str) -> Column:
    """F1 ``parsearFecha`` (Code.gs:124-154): parse ``d/M/yyyy`` (no
    leading zeros) with a generic-date fallback; unparseable → NULL.

    ``try_to_date`` keeps bad rows as NULL instead of failing the job —
    the reference drops them (Code.gs:738); callers filter NULLs.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c.cast("string"))
    return F.coalesce(
        F.try_to_date(c, "d/M/yyyy"),
        F.try_to_date(c, "yyyy-MM-dd"),
        F.try_to_date(c),
    )


def parse_money(col: Column | str) -> Column:
    """F2 ``parsearMonto`` (Code.gs:159-177): strip ``$ " , whitespace``
    then parse float; unparseable → **0.0, not NULL** (Code.gs:176).
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c.cast("string"), r'[$",\s]', "")
    return F.coalesce(cleaned.try_cast("double"), F.lit(0.0))


def clean_string(col: Column | str) -> Column:
    """F3 ``limpiarString`` (Code.gs:182-194): NULL → '', strip one
    symmetric outer double-quote pair, then trim.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c.cast("string"), F.lit(""))
    unquoted = F.regexp_replace(c, r'^\s*"(.*)"\s*$', "$1")
    return F.trim(unquoted)


def money_equal(a: Column, b: Column, tol: float = MONEY_TOLERANCE) -> Column:
    """F4 ``compararMontos`` (Code.gs:199-202): equal iff |a-b| < tol."""
    return F.abs(a - b) < F.lit(tol)


def dates_equal(a: Column, b: Column) -> Column:
    """F5 ``compararFechas`` (Code.gs:207-214): both-NULL equal,
    one-NULL unequal, else Y/M/D equality — i.e. null-safe equality on
    the date-truncated values.
    """
    return a.cast("date").eqNullSafe(b.cast("date"))


def format_date_dmy(col: Column | str) -> Column:
    """F6 ``formatearFecha`` (Code.gs:219-229): date → ``d/M/yyyy``
    string without zero padding."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "d/M/yyyy")


def spanish_month_name(col: Column | str) -> Column:
    """F7 ``obtenerNombrePestana`` (Code.gs:234-240): month-of-date →
    Spanish month name (the reference's partition key)."""
    c = F.col(col) if isinstance(col, str) else col
    months = F.array(*[F.lit(m) for m in SPANISH_MONTHS])
    return F.element_at(months, F.month(c))


def coerce_checkbox(col: Column | str) -> Column:
    """F8 checkbox truthiness (Code.gs:1505,1515,1528,1539 plus the
    xlsx-observed variants): true iff value ∈ {true, 'TRUE', 'SI', '1'}
    case-insensitively; NULL/other → false.
    """
    c = F.col(col) if isinstance(col, str) else col
    as_str = F.upper(F.trim(c.cast("string")))
    return F.coalesce(as_str.isin("TRUE", "SI", "1", "SÍ"), F.lit(False))
