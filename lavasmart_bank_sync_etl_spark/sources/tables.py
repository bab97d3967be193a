"""Parquet table access (SURVEY.md §2.1, S1/S2) + the TPC-H→domain
mapping used by the driver-facing queries.

The reference reads a month-partitioned source (one sheet per Spanish
month, Code.gs:701-716); here any date filter on the parquet scan gets
partition pruning + predicate pushdown from Catalyst. ``sales_view``
maps the driver's TPC-H-ish ``orders`` onto the domain's canonical
sales schema so every operator can be oracle-checked against DuckDB on
identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classify import classify_method

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_parquet_robust(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read that survives TIMESTAMP(NANOS) columns in a session
    that wasn't configured for them. Our own session sets
    ``spark.sql.legacy.parquet.nanosAsLong`` up front, but the driver
    invokes ``queries()`` with ITS session — which fails on the events
    table with PARQUET_TYPE_ILLEGAL unless the (runtime-settable)
    legacy conf is flipped. Self-heal instead of assuming the caller's
    session. The session timezone gets the same treatment: the
    TIMESTAMP_NTZ→TIMESTAMP normalization in read_table (and every
    date/timestamp formatting oracle comparison) is value-stable only
    under UTC, and the runtime-settable conf costs nothing."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.read.parquet(path)
        df.schema  # force footer/schema resolution now
        return df
    except Exception as ex:  # noqa: BLE001 — match on the Spark error class
        if "PARQUET_TYPE_ILLEGAL" not in str(ex) and "Illegal Parquet type" not in str(ex):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = read_parquet_robust(spark, f"{sf_dir}/{name}.parquet")
    # events.ts has shipped as TIMESTAMP(NANOS) → long (nanosAsLong) and
    # as timestamp[us] without timezone → TIMESTAMP_NTZ. Normalize to
    # session-TZ TIMESTAMP: event-time ops (withWatermark, unix_micros)
    # require it, and the session TZ is pinned UTC so NTZ→LTZ is
    # value-stable against the DuckDB oracle. The nanos branch divides as
    # integers so ~1.7e18 values never pass through a double; the NTZ
    # branch covers EVERY ntz column so a future testdata regeneration
    # can't reintroduce the breakage through another table.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for cname, ctype in df.dtypes:
        if ctype == "timestamp_ntz":
            df = df.withColumn(cname, F.col(cname).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in TABLE_NAMES}


#: How o_orderpriority maps onto payment-method-like strings. The
#: classifier itself (P2) is generic; this just gives the TPC-H data a
#: method column with the same contains-cascade shape.
def sales_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical sales table derived from ``orders``.

    Matches ``SALES_VIEW_SQL`` (DuckDB) column-for-column.
    """
    orders = read_table(spark, sf_dir, "orders")
    metodo_raw = (
        F.when(F.col("o_orderpriority").contains("URGENT"), F.lit("Transferencia bancaria"))
        .when(F.col("o_orderpriority").contains("HIGH"), F.lit("TARJETA de credito"))
        .when(F.col("o_orderpriority").contains("MEDIUM"), F.lit("efectivo"))
        .otherwise(F.col("o_orderpriority"))
    )
    return orders.select(
        F.col("o_orderkey").cast("string").alias("folio"),
        F.col("o_orderdate").cast("date").alias("sale_date"),
        F.col("o_custkey").cast("string").alias("cliente"),
        F.col("o_orderstatus").alias("servicio"),
        F.col("o_totalprice").alias("monto"),
        metodo_raw.alias("metodo_raw"),
        classify_method(metodo_raw).alias("metodo"),
    )


#: DuckDB oracle equivalent of sales_view — keep in lockstep.
SALES_VIEW_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) AS folio,
       CAST(o_orderdate AS DATE) AS sale_date,
       CAST(o_custkey AS VARCHAR) AS cliente,
       o_orderstatus AS servicio,
       o_totalprice AS monto,
       CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 'Transferencia bancaria'
            WHEN o_orderpriority LIKE '%HIGH%' THEN 'TARJETA de credito'
            WHEN o_orderpriority LIKE '%MEDIUM%' THEN 'efectivo'
            ELSE o_orderpriority END AS metodo_raw,
       CASE WHEN upper(CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 'Transferencia bancaria'
                            WHEN o_orderpriority LIKE '%HIGH%' THEN 'TARJETA de credito'
                            WHEN o_orderpriority LIKE '%MEDIUM%' THEN 'efectivo'
                            ELSE o_orderpriority END) LIKE '%TRANSFERENCIA%' THEN 'TRANSFERENCIA'
            WHEN upper(CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 'Transferencia bancaria'
                            WHEN o_orderpriority LIKE '%HIGH%' THEN 'TARJETA de credito'
                            WHEN o_orderpriority LIKE '%MEDIUM%' THEN 'efectivo'
                            ELSE o_orderpriority END) LIKE '%TARJETA%' THEN 'TARJETA'
            WHEN upper(CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 'Transferencia bancaria'
                            WHEN o_orderpriority LIKE '%HIGH%' THEN 'TARJETA de credito'
                            WHEN o_orderpriority LIKE '%MEDIUM%' THEN 'efectivo'
                            ELSE o_orderpriority END) LIKE '%EFECTIVO%' THEN 'EFECTIVO'
            ELSE 'OTROS' END AS metodo
FROM orders
"""
