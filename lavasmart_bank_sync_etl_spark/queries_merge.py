"""Driver-facing queries for the merge/routing operator family
(SURVEY.md §2.3-§2.6): D1, J1-J6, C1-C4, S4, R2/R3, A4, T1.

Each query simulates the reference's source/destination pair on the
TPC-H-ish tables with DETERMINISTIC perturbations (modular arithmetic
on keys — no randomness), so the Spark plan and the DuckDB oracle see
identical inputs and must produce identical outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.parsing import coerce_checkbox
from .operators import merge as M
from .operators.dedup import first_wins_dedup
from .operators.enrichment import bank_match_candidates, enrich_urls
from .operators.routing import detect_deletions
from .queries import query, sales_cte
from .sources.tables import SALES_VIEW_SQL, read_table, sales_view

# ---------------------------------------------------------------------------
# Shared simulated destination snapshot (deterministic drift vs sales)
# ---------------------------------------------------------------------------

#: DuckDB CTE body for the simulated destination; _dest_df mirrors it.
DEST_SIM_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) AS folio,
       CAST(o_orderdate AS DATE) + CASE WHEN o_orderkey % 19 = 0 THEN 1 ELSE 0 END AS fecha,
       CASE WHEN o_orderkey % 17 = 0 THEN 'upd-' || CAST(o_custkey AS VARCHAR)
            ELSE CAST(o_custkey AS VARCHAR) END AS cliente,
       o_orderstatus AS servicio,
       o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 5.0
                           WHEN o_orderkey % 13 = 0 THEN 0.005 ELSE 0.0 END AS monto,
       CASE o_orderkey % 6 WHEN 0 THEN 'TRUE' WHEN 1 THEN 'SI' WHEN 2 THEN '' ELSE 'no' END AS conciliado_raw,
       CASE WHEN o_orderkey % 11 = 0 THEN 'nota manual' ELSE '' END AS observaciones,
       CASE WHEN o_orderkey % 23 = 0 THEN 'others'
            WHEN o_orderpriority LIKE '%URGENT%' THEN 'transfers'
            WHEN o_orderpriority LIKE '%HIGH%' THEN 'cards'
            WHEN o_orderpriority LIKE '%MEDIUM%' THEN 'cash'
            ELSE 'others' END AS dest_table
FROM orders WHERE o_orderkey % 10 <> 7
"""

SRC_TABLE_SQL = """
CASE metodo WHEN 'TRANSFERENCIA' THEN 'transfers' WHEN 'TARJETA' THEN 'cards'
     WHEN 'EFECTIVO' THEN 'cash' ELSE 'others' END
"""


def merge_cte(body: str) -> str:
    return f"WITH sales AS ({SALES_VIEW_SQL}), dest AS ({DEST_SIM_SQL}) {body}"


def _dest_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 != 7)
    k = F.col("o_orderkey")
    return o.select(
        k.cast("string").alias("folio"),
        F.date_add(F.col("o_orderdate").cast("date"),
                   F.when(k % 19 == 0, 1).otherwise(0)).alias("fecha"),
        F.when(k % 17 == 0, F.concat(F.lit("upd-"), F.col("o_custkey").cast("string")))
        .otherwise(F.col("o_custkey").cast("string")).alias("cliente"),
        F.col("o_orderstatus").alias("servicio"),
        (F.col("o_totalprice")
         + F.when(k % 5 == 0, 5.0).when(k % 13 == 0, 0.005).otherwise(0.0)).alias("monto"),
        F.when(k % 6 == 0, F.lit("TRUE")).when(k % 6 == 1, F.lit("SI"))
        .when(k % 6 == 2, F.lit("")).otherwise(F.lit("no")).alias("conciliado_raw"),
        F.when(k % 11 == 0, F.lit("nota manual")).otherwise(F.lit("")).alias("observaciones"),
        F.when(k % 23 == 0, F.lit("others"))
        .when(F.col("o_orderpriority").contains("URGENT"), F.lit("transfers"))
        .when(F.col("o_orderpriority").contains("HIGH"), F.lit("cards"))
        .when(F.col("o_orderpriority").contains("MEDIUM"), F.lit("cash"))
        .otherwise(F.lit("others")).alias("dest_table"),
    )


def _src_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sales_view(spark, sf_dir)
    return s.withColumn(
        "src_table",
        F.when(F.col("metodo") == "TRANSFERENCIA", F.lit("transfers"))
        .when(F.col("metodo") == "TARJETA", F.lit("cards"))
        .when(F.col("metodo") == "EFECTIVO", F.lit("cash"))
        .otherwise(F.lit("others")),
    )


# ---------------------------------------------------------------------------
# D1 — first-wins dedup
# ---------------------------------------------------------------------------

@query(
    "d1_first_wins_dedup",
    """
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_extendedprice) AS rn
      FROM lineitem
    )
    SELECT CAST(l_orderkey AS VARCHAR) AS folio, l_linenumber AS first_line,
           ROUND(l_extendedprice, 2) AS monto
    FROM ranked WHERE rn = 1
    """,
)
def d1_first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — first occurrence per key in explicit scan order wins
    (Code.gs:752-765); lineitem lines stand in for repeated folio
    sightings, l_linenumber is the pinned scan order. The synthetic
    lineitem repeats (orderkey, linenumber) pairs, so the scan order
    is pinned down to uniqueness with l_extendedprice — a
    row_number tie would otherwise be engine-dependent."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("folio"),
        F.col("l_linenumber"),
        F.col("l_extendedprice"),
    )
    winners, _ = first_wins_dedup(li, "folio", ["l_linenumber", "l_extendedprice"])
    return winners.select(
        "folio", F.col("l_linenumber").alias("first_line"),
        F.round("l_extendedprice", 2).alias("monto"),
    )


@query(
    "d1_duplicate_losers_log",
    """
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
      FROM lineitem
    )
    SELECT CAST(l_orderkey AS VARCHAR) AS folio, COUNT(*) AS n_duplicates
    FROM ranked WHERE rn > 1 GROUP BY l_orderkey
    """,
)
def d1_duplicate_losers_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 side output — the DUPLICADO EN ORIGEN log feed
    (Code.gs:834-843): losers per key."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("folio"), F.col("l_linenumber")
    )
    _, losers = first_wins_dedup(li, "folio", ["l_linenumber"])
    return losers.groupBy("folio").agg(F.count(F.lit(1)).alias("n_duplicates"))


# ---------------------------------------------------------------------------
# J1 + C1-C3 — upsert classification with typed diff
# ---------------------------------------------------------------------------

J1_ACTION_SQL = merge_cte(
    """
    SELECT COALESCE(s.folio, d.folio) AS folio,
           CASE WHEN d.folio IS NULL THEN 'insert'
                WHEN s.folio IS NULL THEN 'dest_only'
                WHEN """ + SRC_TABLE_SQL + """ <> d.dest_table THEN 'move'
                WHEN NOT (s.sale_date = d.fecha)
                     OR NOT (TRIM(s.cliente) = TRIM(d.cliente))
                     OR NOT (TRIM(s.servicio) = TRIM(d.servicio))
                     OR ABS(s.monto - d.monto) >= 0.01 THEN 'update'
                ELSE 'unchanged' END AS action
    FROM sales s FULL OUTER JOIN dest d ON s.folio = d.folio
    """
)


def _classified(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _src_df(spark, sf_dir)
    dest = _dest_df(spark, sf_dir)
    c = M.classify_upsert(
        src.withColumnRenamed("sale_date", "fecha"),
        dest,
        key="folio",
        diff_fields=M.DIFF_FIELDS_OTHERS,
        src_table_col="src_table",
        dst_table_col="dest_table",
    )
    return c


@query("j1_upsert_classify", J1_ACTION_SQL)
def j1_upsert_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the merge-join outcome classification (Code.gs:1159-1211):
    one full-outer join on the key → {insert, update, unchanged, move,
    dest_only} per folio, with C3 typed comparators."""
    c = _classified(spark, sf_dir)
    return c.select(
        F.coalesce(F.col("src.folio"), F.col("dst.folio")).alias("folio"), F.col("action")
    )


@query(
    "a4_run_summary",
    f"WITH acts AS ({J1_ACTION_SQL}) SELECT action, COUNT(*) AS n FROM acts GROUP BY action",
)
def a4_run_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — run-summary counts per action (Code.gs:846-854)."""
    return _classified(spark, sf_dir).groupBy("action").agg(F.count(F.lit(1)).alias("n"))


@query(
    "c1_c3_typed_diff",
    merge_cte(
        """
        SELECT s.folio,
               NOT (s.sale_date = d.fecha) AS fecha_chg,
               NOT (TRIM(s.cliente) = TRIM(d.cliente)) AS cliente_chg,
               ABS(s.monto - d.monto) >= 0.01 AS monto_chg
        FROM sales s JOIN dest d ON s.folio = d.folio
        """
    ),
)
def c1_c3_typed_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C3 — per-field typed diff (Code.gs:1341-1373): dates by
    Y/M/D, money by |Δ| < 0.01 (the 0.005 perturbation must NOT
    register; the 5.0 one must), strings post-trim."""
    src = _src_df(spark, sf_dir).withColumnRenamed("sale_date", "fecha").alias("src")
    dest = _dest_df(spark, sf_dir).alias("dst")
    j = src.join(dest, F.col("src.folio") == F.col("dst.folio"), "inner")
    return j.select(
        F.col("src.folio").alias("folio"),
        M.field_changed("fecha").alias("fecha_chg"),
        M.field_changed("cliente").alias("cliente_chg"),
        M.field_changed("monto").alias("monto_chg"),
    )


@query(
    "c4_change_narrative",
    merge_cte(
        """
        SELECT s.folio,
               'Cambios en: ' || concat_ws(', ',
                 CASE WHEN NOT (s.sale_date = d.fecha) THEN 'Fecha' END,
                 CASE WHEN NOT (TRIM(s.cliente) = TRIM(d.cliente)) THEN 'Cliente' END,
                 CASE WHEN ABS(s.monto - d.monto) >= 0.01 THEN 'Monto' END) AS detalle,
               concat_ws('; ',
                 CASE WHEN NOT (s.sale_date = d.fecha)
                      THEN 'Fecha: ' || strftime(d.fecha, '%-d/%-m/%Y') END,
                 CASE WHEN NOT (TRIM(s.cliente) = TRIM(d.cliente))
                      THEN 'Cliente: ' || COALESCE(NULLIF(TRIM(d.cliente), ''), '(vacío)') END,
                 CASE WHEN ABS(s.monto - d.monto) >= 0.01
                      THEN 'Monto: ' || format('{:,}', CAST(round(d.monto * 100) AS BIGINT) // 100)
                           || '.' || lpad(CAST(CAST(round(d.monto * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') END
               ) AS valores_anteriores
        FROM sales s JOIN dest d ON s.folio = d.folio
        WHERE NOT (s.sale_date = d.fecha) OR NOT (TRIM(s.cliente) = TRIM(d.cliente))
           OR ABS(s.monto - d.monto) >= 0.01
        """
    ),
)
def c4_change_narrative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — audit narrative strings (Code.gs:2078-2116): 'Cambios en:
    Campo, …' + '; '-joined before-values with (vacío) for empties."""
    src = _src_df(spark, sf_dir).withColumnRenamed("sale_date", "fecha").alias("src")
    dest = _dest_df(spark, sf_dir).alias("dst")
    j = src.join(dest, F.col("src.folio") == F.col("dst.folio"), "inner")
    fields = ["fecha", "cliente", "monto"]
    changed = M.any_field_changed(fields)
    detalle, old_vals, _ = M.change_narrative(fields)
    return j.where(changed).select(
        F.col("src.folio").alias("folio"),
        detalle.alias("detalle"),
        old_vals.alias("valores_anteriores"),
    )


# ---------------------------------------------------------------------------
# S4 — protected-column merge
# ---------------------------------------------------------------------------

@query(
    "s4_merge_preserve_human_cols",
    merge_cte(
        """
        SELECT COALESCE(s.folio, d.folio) AS folio,
               CAST(COALESCE(s.sale_date, d.fecha) AS VARCHAR) AS fecha_iso,
               ROUND(COALESCE(s.monto, d.monto), 2) AS monto,
               d.conciliado_raw AS conciliado_raw,
               d.observaciones AS observaciones
        FROM sales s FULL OUTER JOIN dest d ON s.folio = d.folio
        """
    ),
)
def s4_merge_preserve_human_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — the protected-column merge (Code.gs:1836-1844,
    requerimientos.md:113-119): script columns take the source value
    when present; human columns pass through from the destination
    verbatim (NULL for fresh inserts)."""
    src = _src_df(spark, sf_dir).withColumnRenamed("sale_date", "fecha").alias("src")
    dest = _dest_df(spark, sf_dir).alias("dst")
    # delta-sized source as shuffle-hash build side (same rationale as
    # operators/merge.classify_upsert — full-outer can't broadcast and
    # sort-merge would sort the big dest side for nothing)
    j = src.hint("shuffle_hash").join(
        dest, F.col("src.folio").eqNullSafe(F.col("dst.folio")), "full_outer"
    )
    return j.select(
        F.coalesce(F.col("src.folio"), F.col("dst.folio")).alias("folio"),
        F.coalesce(F.col("src.fecha"), F.col("dst.fecha")).cast("string").alias("fecha_iso"),
        F.round(F.coalesce(F.col("src.monto"), F.col("dst.monto")), 2).alias("monto"),
        F.col("dst.conciliado_raw").alias("conciliado_raw"),
        F.col("dst.observaciones").alias("observaciones"),
    )


# ---------------------------------------------------------------------------
# J2 / R1-R3 — cross-table existence, move planning, conflict routing
# ---------------------------------------------------------------------------

@query(
    "j2_r3_move_conflict_routing",
    merge_cte(
        """
        SELECT s.folio, d.dest_table AS from_table, """ + SRC_TABLE_SQL + """ AS to_table,
               CASE WHEN COALESCE(upper(TRIM(d.conciliado_raw)) IN ('TRUE','SI','1','SÍ'), FALSE)
                         OR TRIM(COALESCE(d.observaciones, '')) <> ''
                    THEN 'REVIEW' ELSE 'MOVE' END AS routed
        FROM sales s JOIN dest d ON s.folio = d.folio
        WHERE """ + SRC_TABLE_SQL + """ <> d.dest_table
        """
    ),
)
def j2_r3_move_conflict_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 + R1-R3 — method-change detection (Code.gs:1228-1242), the
    R2 manual-work guard (Code.gs:1501-1548: checkbox truthy OR human
    text non-empty) and the R3 conflict split (Code.gs:1378-1496):
    protected rows route to REVIEW, clean rows MOVE."""
    src = _src_df(spark, sf_dir).alias("src")
    dest = _dest_df(spark, sf_dir).alias("dst")
    j = src.join(dest, F.col("src.folio") == F.col("dst.folio"), "inner").where(
        F.col("src.src_table") != F.col("dst.dest_table")
    )
    has_work = coerce_checkbox(F.col("dst.conciliado_raw")) | (
        F.trim(F.coalesce(F.col("dst.observaciones"), F.lit(""))) != ""
    )
    return j.select(
        F.col("src.folio").alias("folio"),
        F.col("dst.dest_table").alias("from_table"),
        F.col("src.src_table").alias("to_table"),
        F.when(has_work, F.lit("REVIEW")).otherwise(F.lit("MOVE")).alias("routed"),
    )


# ---------------------------------------------------------------------------
# J3 — anti-join deletion detection
# ---------------------------------------------------------------------------

@query(
    "j3_deletion_detection",
    merge_cte(
        """
        SELECT d.folio, d.dest_table
        FROM dest d
        WHERE d.fecha BETWEEN DATE '1998-01-01' AND DATE '1998-12-31'
          AND NOT EXISTS (
            SELECT 1 FROM sales s
            WHERE s.folio = d.folio AND CAST(s.folio AS BIGINT) % 50 <> 0
          )
        """
    ),
)
def j3_deletion_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — deletion detection (Code.gs:1258-1290): destination keys
    dated inside the window whose folio vanished from the source scan
    (simulated: every 50th folio missing). Log-only — anti-join, no
    destructive write (Code.gs:1246-1247)."""
    dest = _dest_df(spark, sf_dir).where(
        F.col("fecha").between(F.lit("1998-01-01").cast("date"), F.lit("1998-12-31").cast("date"))
    )
    found = _src_df(spark, sf_dir).where(F.col("folio").cast("long") % 50 != 0)
    return detect_deletions(dest, found, "folio").select("folio", "dest_table")


# ---------------------------------------------------------------------------
# J5 / J6 — bank match + enrichment
# ---------------------------------------------------------------------------

@query(
    "j5_bank_match_candidates",
    merge_cte(
        """
        SELECT t.folio, CAST(t.sale_date AS VARCHAR) AS t_fecha_iso,
               ROUND(t.monto, 2) AS t_monto,
               CAST(b.b_dia AS VARCHAR) AS b_dia_iso, ROUND(b.abono, 2) AS abono,
               ABS(datediff('day', b.b_dia, t.sale_date)) AS day_gap
        FROM (SELECT * FROM sales WHERE metodo = 'TRANSFERENCIA') t
        JOIN (SELECT folio AS b_folio,
                     sale_date + CAST((CAST(folio AS BIGINT) % 5) - 2 AS INTEGER) AS b_dia,
                     -- 0.004: inside the 0.01 tolerance but NOT a decimal
                     -- half-tie at 3dp (x.xx5 rounds differently across
                     -- engines' double-rounding rules)
                     monto + CASE WHEN CAST(folio AS BIGINT) % 7 = 0 THEN 0.004 ELSE 0.0 END AS abono,
                     'mov ' || folio AS concepto
              FROM sales WHERE CAST(folio AS BIGINT) % 3 = 0) b
          ON ABS(t.monto - b.abono) < 0.01
         AND ABS(datediff('day', b.b_dia, t.sale_date)) <= 3
        """
    ),
)
def j5_bank_match_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — bank-statement match suggestions (xlsx Banco!F): pairs
    within |Δ amount| < 0.01 and ≤3 days apart. Spark plan buckets on
    rounded cents (hash join + residual filter — never a theta join);
    the oracle states the same predicate declaratively."""
    s = _src_df(spark, sf_dir)
    transfers = s.where(F.col("metodo") == "TRANSFERENCIA").select(
        "folio", F.col("sale_date").alias("fecha"), "monto"
    )
    k = F.col("folio").cast("long")
    bank = s.where(k % 3 == 0).select(
        F.date_add(F.col("sale_date"), ((k % 5) - 2).cast("int")).alias("dia"),
        F.concat(F.lit("mov "), F.col("folio")).alias("concepto"),
        (F.col("monto") + F.when(k % 7 == 0, 0.004).otherwise(0.0)).alias("abono"),
    )
    m = bank_match_candidates(transfers, bank, amount_tol=0.01, max_day_gap=3)
    return m.select(
        "folio",
        F.col("t_fecha").cast("string").alias("t_fecha_iso"),
        F.round("t_monto", 2).alias("t_monto"),
        F.col("b_dia").cast("string").alias("b_dia_iso"),
        F.round("abono", 2).alias("abono"),
        F.col("day_gap").cast("long").alias("day_gap"),
    )


@query(
    "j6_broadcast_enrichment_backfill",
    """
    WITH fact AS (
      SELECT l_orderkey, l_linenumber, l_suppkey,
             CASE WHEN l_orderkey % 2 = 0 THEN 'kept://' || CAST(l_orderkey AS VARCHAR) END AS url
      FROM lineitem
    ), dim AS (
      SELECT s_suppkey AS folio_key, 'drive://' || CAST(s_suppkey AS VARCHAR) AS dim_url
      FROM supplier
    )
    SELECT f.l_orderkey, f.l_linenumber,
           COALESCE(f.url, d.dim_url) AS url
    FROM fact f LEFT JOIN dim d ON f.l_suppkey = d.folio_key
    """,
)
def j6_broadcast_enrichment_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — hyperlink enrichment (Code.gs:55-80, 2143-2164): broadcast
    left join against the URL dimension, backfilling ONLY rows whose
    url is NULL (the 'has link already' check, Code.gs:2125-2136)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), F.col("l_linenumber"),
        F.col("l_suppkey").alias("folio"),
        F.when(F.col("l_orderkey") % 2 == 0,
               F.concat(F.lit("kept://"), F.col("l_orderkey").cast("string"))).alias("url"),
    )
    dim = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("folio"),
        F.concat(F.lit("drive://"), F.col("s_suppkey").cast("string")).alias("url"),
    )
    return enrich_urls(li, dim, key="folio", url_col="url").select(
        "l_orderkey", "l_linenumber", "url"
    )


# ---------------------------------------------------------------------------
# T1 — incremental lookback window (dynamic, data-relative)
# ---------------------------------------------------------------------------

@query(
    "t1_lookback_window",
    sales_cte(
        """
        SELECT CAST(sale_date AS VARCHAR) AS sale_date_iso, COUNT(*) AS n,
               ROUND(SUM(monto), 2) AS total
        FROM sales
        WHERE sale_date >= (SELECT MAX(sale_date) FROM sales) - 10
        GROUP BY sale_date
        """
    ),
)
def t1_lookback_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — the DIAS_LOOKBACK=10 incremental window (Code.gs:22,
    666-669) computed data-relative: max(sale_date) − 10 days. The
    scalar subquery is broadcast; the main scan still gets the pruned
    predicate at runtime via DPP/AQE."""
    s = sales_view(spark, sf_dir)
    max_d = s.agg(F.max("sale_date").alias("m"))
    return (
        s.join(F.broadcast(max_d))
        .where(F.col("sale_date") >= F.date_sub(F.col("m"), 10))
        .groupBy("sale_date")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("monto"), 2).alias("total"))
        .select(F.col("sale_date").cast("string").alias("sale_date_iso"), "n", "total")
    )


# ---------------------------------------------------------------------------
# A11 — daily reconciliation variance (the xlsx `totales` sheet's job)
# ---------------------------------------------------------------------------

@query(
    "a11_daily_recon_variance",
    merge_cte(
        """
        , t AS (
          SELECT sale_date AS dia,
                 SUM(CAST(round(monto * 100) AS BIGINT)) AS t_cents,
                 COUNT(*) AS n_transfers
          FROM sales WHERE metodo = 'TRANSFERENCIA' GROUP BY sale_date
        ),
        b AS (
          SELECT dia,
                 SUM(CAST(round(abono * 100) AS BIGINT)) AS b_cents,
                 COUNT(*) AS n_bank_movs
          FROM (SELECT sale_date + CAST((CAST(folio AS BIGINT) % 5) - 2 AS INTEGER) AS dia,
                       monto + CASE WHEN CAST(folio AS BIGINT) % 7 = 0
                                    THEN 0.004 ELSE 0.0 END AS abono
                FROM sales WHERE CAST(folio AS BIGINT) % 3 = 0)
          GROUP BY dia
        )
        SELECT CAST(COALESCE(t.dia, b.dia) AS VARCHAR) AS dia_iso,
               COALESCE(t.t_cents, 0) / 100.0 AS transfers_total,
               CAST(COALESCE(t.n_transfers, 0) AS BIGINT) AS n_transfers,
               COALESCE(b.b_cents, 0) / 100.0 AS bank_total,
               CAST(COALESCE(b.n_bank_movs, 0) AS BIGINT) AS n_bank_movs,
               (COALESCE(t.t_cents, 0) - COALESCE(b.b_cents, 0)) / 100.0 AS variance
        FROM t FULL OUTER JOIN b ON t.dia = b.dia
        """
    ),
)
def a11_daily_recon_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — the per-day bank-vs-transfers reconciliation view: the
    xlsx ``totales`` sheet pairs a per-day SUMIFS over
    Conciliacion_Transferencias with the per-day ``Banco`` column and
    humans read the delta (sheet 7, 396 rows; SURVEY §1.3). Here the
    transfer side is the classified sales view summed per day and the
    bank side is j5's deterministic statement synthesis summed per
    day; a full-outer join on the day keeps days that exist on only
    one side (exactly where reconciliation breaks), variance =
    transfers − bank.

    Scale: two map-side-partial aggregates collapse both fact streams
    to at-most-one-row-per-day BEFORE the join, so the full-outer join
    is over day-cardinality inputs (tiny at any corpus size) — never a
    row-level fact-to-fact join. Determinism: both sides sum integer
    cents (fixed-point) and divide once at the end, so double
    summation order cannot move any total."""
    s = sales_view(spark, sf_dir)
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    t = (
        s.where(F.col("metodo") == "TRANSFERENCIA")
        .groupBy(F.col("sale_date").alias("t_dia"))
        .agg(
            F.sum(cents("monto")).alias("t_cents"),
            F.count(F.lit(1)).alias("n_transfers"),
        )
    )
    k = F.col("folio").cast("long")
    b = (
        s.where(k % 3 == 0)
        .select(
            F.date_add(F.col("sale_date"), ((k % 5) - 2).cast("int")).alias("b_dia"),
            (F.col("monto") + F.when(k % 7 == 0, 0.004).otherwise(0.0)).alias("abono"),
        )
        .groupBy("b_dia")
        .agg(
            F.sum(cents("abono")).alias("b_cents"),
            F.count(F.lit(1)).alias("n_bank_movs"),
        )
    )
    j = t.join(b, t["t_dia"] == b["b_dia"], "full_outer")
    zero = F.lit(0).cast("long")
    t_cents = F.coalesce(F.col("t_cents"), zero)
    b_cents = F.coalesce(F.col("b_cents"), zero)
    return j.select(
        F.coalesce(F.col("t_dia"), F.col("b_dia")).cast("string").alias("dia_iso"),
        (t_cents / 100.0).alias("transfers_total"),
        F.coalesce(F.col("n_transfers"), zero).alias("n_transfers"),
        (b_cents / 100.0).alias("bank_total"),
        F.coalesce(F.col("n_bank_movs"), zero).alias("n_bank_movs"),
        ((t_cents - b_cents) / 100.0).alias("variance"),
    )
