"""Raw-source ingestion (SURVEY.md §2.1 S1/S8): the reference's
messy-spreadsheet source re-expressed as CSV / JSON(L) readers that
apply the canonical cleaning pipeline at the scan.

The reference reads a tab-per-month grid of untyped cells and parses
each consumed column per row (Code.gs:744-748 via parsearFecha /
parsearMonto / limpiarString, Code.gs:124-194). Here the same
semantics run as column expressions over a permissive all-string scan:

- every raw column read as string (``inferSchema`` off — schema drift
  can't silently retype a column mid-partition at 100 TB);
- F1 date parse (``d/M/yyyy`` first, ISO fallback, invalid → null),
  F2 money parse (strip ``$ " ,`` whitespace, unparseable → 0.0),
  F3 string clean (strip one symmetric quote pair, trim);
- P4 null guards (unparseable date or empty folio) route to a reject
  side-output instead of failing the job — the batch-write-with-
  per-row-salvage fallback of the reference (Code.gs:1747-1776)
  re-expressed as quarantine-on-parse.

Scale notes: both readers are splittable scans (CSV with multiLine
off, JSONL), so a 100 TB source parallelizes by HDFS block; the
cleaning is pure whole-stage-codegen expressions on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parsing import clean_string, parse_date_dmy, parse_money
from ..operators.classify import classify_method

#: raw source columns expected from the spreadsheet-shaped export
RAW_COLUMNS = ["folio", "fecha", "cliente", "servicio", "monto", "metodo_pago", "banco"]


def _canonicalize(raw: DataFrame) -> DataFrame:
    """Apply F1-F3 parsing + P2 classification to an all-string frame
    with RAW_COLUMNS; adds ``_valid`` for the P4 guard split."""
    cleaned = raw.select(
        clean_string(F.col("folio")).alias("folio"),
        parse_date_dmy(F.col("fecha")).alias("sale_date"),
        clean_string(F.col("cliente")).alias("cliente"),
        clean_string(F.col("servicio")).alias("servicio"),
        parse_money(F.col("monto")).alias("monto"),
        clean_string(F.col("metodo_pago")).alias("metodo_raw"),
        clean_string(F.col("banco")).alias("banco"),
    )
    return cleaned.withColumn("metodo", classify_method(F.col("metodo_raw"))).withColumn(
        "_valid", F.col("sale_date").isNotNull() & (F.col("folio") != "")
    )


def split_rejects(canonical: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, rejects): P4 guards as a quarantine split — bad rows are
    data, not exceptions (error-tolerance req requerimientos.md:170)."""
    good = canonical.where(F.col("_valid")).drop("_valid")
    rejects = canonical.where(~F.col("_valid")).drop("_valid")
    return good, rejects


def read_sales_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV export of the source sheet → canonical sales frame (with
    ``_valid``; callers use split_rejects). All columns read as
    string; cleaning/typing is explicit expressions."""
    raw = (
        spark.read.option("header", "true")
        .option("inferSchema", "false")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    missing = [c for c in RAW_COLUMNS if c not in raw.columns]
    if missing:  # S8 schema validate & repair analog: fail loudly, not silently
        raise ValueError(f"source CSV missing columns: {missing}")
    return _canonicalize(raw)


def read_sales_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines export → canonical sales frame; same contract as
    read_sales_csv."""
    raw = spark.read.schema(" ".join(f"{c} string," for c in RAW_COLUMNS).rstrip(",")).json(path)
    return _canonicalize(raw)


def read_sales_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC export -> canonical sales frame; same contract as
    read_sales_csv (all columns as string, explicit cleaning). ORC is
    Spark-native (predicate pushdown + column pruning work the same as
    parquet), so warehouse exports from Hive-era stacks ingest without
    conversion."""
    raw = spark.read.orc(path)
    for c in RAW_COLUMNS:
        raw = (
            raw.withColumn(c, F.col(c).cast("string"))
            if c in raw.columns
            else raw.withColumn(c, F.lit(None).cast("string"))
        )
    return _canonicalize(raw.select(*RAW_COLUMNS))
