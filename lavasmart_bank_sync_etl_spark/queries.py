"""Driver-facing query registry: one (Spark callable, DuckDB oracle)
pair per implemented operator from SURVEY.md §2.

Conventions (driver contract, see /root/repo/__spark_entry__.py):
- every computed column aliased identically in Spark and SQL;
- float aggregates rounded (2dp money, 4dp ratios/scores) on BOTH
  sides so cross-engine summation order can't flip the value hash;
- each callable takes (spark, sf_dir) and returns a DataFrame.

Registration happens via the @query decorator; modules below populate
QUERIES / ORACLES at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.parsing import (
    clean_string,
    coerce_checkbox,
    format_date_dmy,
    parse_date_dmy,
    parse_money,
    spanish_month_name,
)
from .operators.classify import classify_method, null_guards, window_filter
from .operators import aggregates as agg_ops
from .sources.tables import SALES_VIEW_SQL, read_table, sales_view

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Single source of truth for "how many queries are registered" — tests
# and docs assert EQUALITY against this so a silently dropped
# registration fails loudly instead of slipping under a >= bound.
EXPECTED_QUERY_COUNT = 155


def query(name: str, oracle: str | None = None):
    """Register a driver-facing query; ``oracle`` is DuckDB SQL over the
    pre-registered views (None → rows-only check for non-SQL ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def sales_cte(body: str) -> str:
    """Wrap an oracle body with the canonical sales view CTE."""
    return f"WITH sales AS ({SALES_VIEW_SQL}) {body}"


# ---------------------------------------------------------------------------
# §2.1 Scans  +  §2.2 projection / classify / filters
# ---------------------------------------------------------------------------

@query(
    "s1_partitioned_scan_window",
    sales_cte(
        """
        SELECT strftime(sale_date, '%Y-%m') AS month, COUNT(*) AS n_rows,
               ROUND(SUM(monto), 2) AS total
        FROM sales
        WHERE sale_date BETWEEN DATE '1998-01-01' AND DATE '1998-12-31'
        GROUP BY 1
        """
    ),
)
def s1_partitioned_scan_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — month-partitioned source scan with window pruning
    (Code.gs:701-716): the date predicate reaches the parquet scan
    (PushedFilters) and prunes month partitions at scale."""
    sales = sales_view(spark, sf_dir)
    windowed = window_filter(sales, "1998-01-01", "1998-12-31")
    return windowed.groupBy(F.date_format("sale_date", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_rows"), F.round(F.sum("monto"), 2).alias("total")
    )


@query(
    "p1_projection_cleaning",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS folio,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS sale_date_iso,
           ROUND(COALESCE(TRY_CAST(regexp_replace('$' || CAST(o_totalprice AS VARCHAR), '[$",\\s]', '', 'g') AS DOUBLE), 0.0), 2) AS monto,
           TRIM(o_orderpriority) AS metodo_raw
    FROM orders WHERE o_orderkey < 1000
    """,
)
def p1_projection_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 + F2/F3 — positional projection with per-column cleaning
    (Code.gs:744-748): money parsed through the `$`-stripping parser
    round-trip, strings trimmed. Column-pruned at the scan."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") < 1000).select(
        F.col("o_orderkey").cast("string").alias("folio"),
        F.col("o_orderdate").cast("date").cast("string").alias("sale_date_iso"),
        F.round(parse_money(F.concat(F.lit("$"), F.col("o_totalprice").cast("string"))), 2).alias("monto"),
        clean_string(F.col("o_orderpriority")).alias("metodo_raw"),
    )


@query(
    "p2_method_classifier",
    sales_cte("SELECT metodo, COUNT(*) AS n FROM sales GROUP BY metodo"),
)
def p2_method_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — 4-way contains-cascade classifier (Code.gs:722-734)."""
    return sales_view(spark, sf_dir).groupBy("metodo").agg(F.count(F.lit(1)).alias("n"))


@query(
    "p3_p4_window_null_guards",
    sales_cte(
        """
        SELECT folio, CAST(sale_date AS VARCHAR) AS sale_date_iso, ROUND(monto, 2) AS monto
        FROM sales
        WHERE sale_date BETWEEN DATE '1999-06-01' AND DATE '1999-06-30'
          AND folio IS NOT NULL AND folio <> ''
        """
    ),
)
def p3_p4_window_null_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 + P4 — inclusive window predicate + null/empty-key guards
    (Code.gs:738-741, 750)."""
    sales = null_guards(window_filter(sales_view(spark, sf_dir), "1999-06-01", "1999-06-30"))
    return sales.select(
        "folio",
        F.col("sale_date").cast("string").alias("sale_date_iso"),
        F.round("monto", 2).alias("monto"),
    )


# ---------------------------------------------------------------------------
# §2.8 scalar functions
# ---------------------------------------------------------------------------

@query(
    "f1_f6_date_roundtrip",
    """
    SELECT CAST(o_orderdate AS DATE) AS d,
           strftime(CAST(o_orderdate AS DATE), '%-d/%-m/%Y') AS dmy,
           CAST(strptime(strftime(CAST(o_orderdate AS DATE), '%-d/%-m/%Y'), '%d/%m/%Y') AS DATE) AS reparsed
    FROM orders WHERE o_orderkey < 2000
    """,
)
def f1_f6_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F6 — format to ``d/M/yyyy`` (no padding) and parse back:
    ``parsearFecha ∘ formatearFecha`` identity (Code.gs:124-154,
    219-229)."""
    orders = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.where(F.col("o_orderkey") < 2000).select(
        d.alias("d"),
        format_date_dmy(d).alias("dmy"),
        parse_date_dmy(format_date_dmy(d)).alias("reparsed"),
    )


@query(
    "f2_money_parser",
    """
    WITH c AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT CAST(o_orderkey AS VARCHAR) AS folio,
           ROUND(COALESCE(TRY_CAST(regexp_replace(
             '"$' || format('{:,}', cents // 100) || '.' || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') || '"',
             '[$",\\s]', '', 'g') AS DOUBLE), 0.0), 2) AS parsed,
           COALESCE(TRY_CAST(regexp_replace('N/A', '[$",\\s]', '', 'g') AS DOUBLE), 0.0) AS unparseable_is_zero
    FROM c
    """,
)
def f2_money_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — ``parsearMonto`` (Code.gs:159-177): strips ``$ " ,``,
    unparseable → 0.0 (not NULL). Exercised on a formatted-currency
    round trip `'"$1,234.56"'` built arithmetically from o_totalprice
    (identical construction in the oracle)."""
    orders = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    currency = F.concat(
        F.lit('"$'),
        F.format_number((cents / 100).cast("long"), 0),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
        F.lit('"'),
    )
    return orders.where(F.col("o_orderkey") < 2000).select(
        F.col("o_orderkey").cast("string").alias("folio"),
        F.round(parse_money(currency), 2).alias("parsed"),
        parse_money(F.lit("N/A")).alias("unparseable_is_zero"),
    )


@query(
    "f7_spanish_month_partition_key",
    """
    SELECT CASE EXTRACT(month FROM CAST(o_orderdate AS DATE))
             WHEN 1 THEN 'Enero' WHEN 2 THEN 'Febrero' WHEN 3 THEN 'Marzo'
             WHEN 4 THEN 'Abril' WHEN 5 THEN 'Mayo' WHEN 6 THEN 'Junio'
             WHEN 7 THEN 'Julio' WHEN 8 THEN 'Agosto' WHEN 9 THEN 'Septiembre'
             WHEN 10 THEN 'Octubre' WHEN 11 THEN 'Noviembre' WHEN 12 THEN 'Diciembre'
           END AS mes, COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def f7_spanish_month_partition_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — Spanish month partition key (Code.gs:234-240), the
    reference's tab-name resolver as a derived partition column."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(spanish_month_name(F.col("o_orderdate")).alias("mes")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "f8_checkbox_coercion",
    """
    SELECT v AS raw,
           COALESCE(upper(TRIM(v)) IN ('TRUE','SI','1','SÍ'), FALSE) AS as_bool, COUNT(*) AS n
    FROM (SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'TRUE' WHEN o_orderkey % 7 = 1 THEN 'SI'
                      WHEN o_orderkey % 7 = 2 THEN '1' WHEN o_orderkey % 7 = 3 THEN 'true'
                      WHEN o_orderkey % 7 = 4 THEN 'no' WHEN o_orderkey % 7 = 5 THEN ''
                      ELSE NULL END AS v
          FROM orders) t
    GROUP BY raw, as_bool
    """,
)
def f8_checkbox_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — checkbox truthiness incl. xlsx variants 'SI'/'1'
    (Code.gs:1505 et al.)."""
    orders = read_table(spark, sf_dir, "orders")
    v = (
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("TRUE"))
        .when(F.col("o_orderkey") % 7 == 1, F.lit("SI"))
        .when(F.col("o_orderkey") % 7 == 2, F.lit("1"))
        .when(F.col("o_orderkey") % 7 == 3, F.lit("true"))
        .when(F.col("o_orderkey") % 7 == 4, F.lit("no"))
        .when(F.col("o_orderkey") % 7 == 5, F.lit(""))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        orders.select(v.alias("raw"), coerce_checkbox(v).alias("as_bool"))
        .groupBy("raw", "as_bool")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.7 aggregations
# ---------------------------------------------------------------------------

@query(
    "a1_sum_by_lot",
    """
    SELECT l_suppkey AS lote, ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem GROUP BY l_suppkey
    """,
)
def a1_sum_by_lot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-lot SUMIF (Code.gs:499) as a hash aggregate with
    map-side partial aggregation."""
    li = read_table(spark, sf_dir, "lineitem")
    return agg_ops.sum_by_key(li.withColumnRenamed("l_suppkey", "lote"), "lote", "l_extendedprice")


@query(
    "a2_j4_lot_reconciliation",
    """
    WITH closures AS (
      SELECT s_suppkey AS lote, ROUND(s_acctbal * 100, 2) AS total_cierre FROM supplier
    ), per_lot AS (
      SELECT l_suppkey AS lote, ROUND(SUM(l_extendedprice), 2) AS total_folios
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT c.lote, c.total_cierre,
           COALESCE(p.total_folios, 0.0) AS total_folios,
           CASE WHEN ROUND(c.total_cierre, 2) = ROUND(COALESCE(p.total_folios, 0.0), 2)
                THEN '✅' ELSE '❌' END AS cuadra
    FROM closures c LEFT JOIN per_lot p USING (lote)
    """,
)
def a2_j4_lot_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 + A2 — lot reconciliation: per-lot sum joined to declared
    closure totals, exact-equality balance check (Code.gs:499-500).
    Supplier is the small side → broadcast."""
    li = read_table(spark, sf_dir, "lineitem").withColumnRenamed("l_suppkey", "lote")
    closures = (
        read_table(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("lote"), F.round(F.col("s_acctbal") * 100, 2).alias("total_cierre"))
    )
    return agg_ops.lot_reconciliation(
        F.broadcast(closures), li, lot_col="lote", amount="l_extendedprice", declared="total_cierre"
    )


@query(
    "a3_daily_totals_by_method",
    sales_cte(
        """
        SELECT CAST(sale_date AS VARCHAR) AS sale_date_iso, metodo,
               ROUND(SUM(monto), 2) AS total, COUNT(*) AS n
        FROM sales GROUP BY sale_date, metodo
        """
    ),
)
def a3_daily_totals_by_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — the ``totales`` SUMIFS view (xlsx sheet7): per-day,
    per-method totals over cleaned+classified sales. Flagship query."""
    sales = sales_view(spark, sf_dir)
    return sales.groupBy("sale_date", "metodo").agg(
        F.round(F.sum("monto"), 2).alias("total"), F.count(F.lit(1)).alias("n")
    ).select(
        F.col("sale_date").cast("string").alias("sale_date_iso"), "metodo", "total", "n"
    )


# ---------------------------------------------------------------------------
# Free-from-Spark analytics the reference lacks (SURVEY §2.7 note):
# rollup subtotals, exact percentiles, running windows
# ---------------------------------------------------------------------------

@query(
    "a5_rollup_subtotals",
    sales_cte(
        """
        SELECT metodo, strftime(sale_date, '%Y-%m') AS month,
               ROUND(SUM(monto), 2) AS total, COUNT(*) AS n
        FROM sales
        GROUP BY ROLLUP (metodo, strftime(sale_date, '%Y-%m'))
        """
    ),
)
def a5_rollup_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (method → month → grand total) — the
    multi-level SUMIFS dashboards the reference builds by hand, one
    aggregate with grouping sets (partial-aggregated like any hash
    agg)."""
    s = sales_view(spark, sf_dir)
    return (
        s.rollup("metodo", F.date_format("sale_date", "yyyy-MM").alias("month"))
        .agg(F.round(F.sum("monto"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "a6_quality_percentiles",
    """
    WITH q AS (
      SELECT lang,
             (least(length(coalesce(text, '')) / 200.0, 1.0)) AS len_score
      FROM documents
    )
    SELECT lang,
           ROUND(quantile_cont(len_score, 0.5), 4) AS p50,
           ROUND(quantile_cont(len_score, 0.9), 4) AS p90,
           ROUND(AVG(len_score), 4) AS mean
    FROM q GROUP BY lang
    """,
)
def a6_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (corpus quality profiling): Spark's
    exact ``percentile`` matches DuckDB's ``quantile_cont`` (both
    linear interpolation). At 100 TB swap to ``approx_percentile``
    (t-digest sketch, mergeable, one pass) and accept the epsilon —
    documented trade, not silent."""
    d = read_table(spark, sf_dir, "documents")
    len_score = F.least(F.length(F.coalesce(F.col("text"), F.lit(""))) / 200.0, F.lit(1.0))
    return (
        d.select("lang", len_score.alias("len_score"))
        .groupBy("lang")
        .agg(
            F.round(F.percentile("len_score", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("len_score", F.lit(0.9)), 4).alias("p90"),
            F.round(F.avg("len_score"), 4).alias("mean"),
        )
    )


@query(
    "w1_running_total",
    sales_cte(
        """
        SELECT folio, cliente, CAST(sale_date AS VARCHAR) AS sale_date_iso,
               ROUND(SUM(monto) OVER (PARTITION BY cliente
                                      ORDER BY sale_date, folio
                                      ROWS UNBOUNDED PRECEDING), 2) AS running_total
        FROM sales WHERE CAST(folio AS BIGINT) < 5000
        """
    ),
)
def w1_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer balance — the cumulative-window shape of
    the reference's bank sheet `Saldo` column (xlsx Banco!E), as one
    window over (cliente) ordered by (date, key). The frame is pinned
    to uniqueness so the cumulative sum is deterministic."""
    from pyspark.sql import Window

    s = sales_view(spark, sf_dir).where(F.col("folio").cast("long") < 5000)
    w = (
        Window.partitionBy("cliente")
        .orderBy(F.col("sale_date").asc(), F.col("folio").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return s.select(
        "folio", "cliente",
        F.col("sale_date").cast("string").alias("sale_date_iso"),
        F.round(F.sum("monto").over(w), 2).alias("running_total"),
    )


# Registration side-effects come from the operator-specific query
# modules, imported by the package __init__ (which ALWAYS runs before
# any submodule import completes). Re-importing them here as well
# used to create a partial-module window: entering the package via
# `import ….queries_llm` ran this cascade while queries_llm was still
# mid-initialization, so queries_pipeline/queries_curation read
# half-built constants from it. __init__'s single ordered import list
# is the one registration path.
