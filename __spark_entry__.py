"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001. ``queries()``
exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver compares
against at sf0.01 (row-count + schema + order-insensitive value hash).

Column names are aliased identically on both sides; float aggregates
are rounded on both sides so cross-engine summation order cannot flip
the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lavasmart_bank_sync_etl_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's ``totales`` view — per-day, per-method
    totals over the cleaned+classified sales (SURVEY A3/P2)."""
    return QUERIES["a3_daily_totals_by_method"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
