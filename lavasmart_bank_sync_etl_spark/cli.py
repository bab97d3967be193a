"""Command-line entry points — the reference's two triggers as one
parameterized CLI (SURVEY.md §3.1/§3.2):

    # daily incremental run (window = [today−10, today], Code.gs:649-860)
    python -m lavasmart_bank_sync_etl_spark.cli sync \
        --source /data/sales.parquet --warehouse /data/wh

    # arbitrary-range backfill, d/M/yyyy args (Code.gs:873-1093)
    python -m lavasmart_bank_sync_etl_spark.cli sync \
        --source /data/sales.csv --format csv --warehouse /data/wh \
        --start 1/11/2025 --end 30/11/2025

Prints the A4 run summary as one JSON line. Source formats: parquet
(canonical columns), csv / jsonl (raw spreadsheet-shaped export run
through the F1-F3 cleaning + P4 quarantine of sources.ingest; reject
rows are appended to the warehouse ``rejects`` table rather than
failing the run — requerimientos.md:170 error tolerance).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources import xlsx

DEFAULT_LOOKBACK_DAYS = 10  # DIAS_LOOKBACK, Code.gs:22


def _parse_dmy(s: str) -> dt.date:
    """d/M/yyyy, no leading zeros (F1, Code.gs:124-154)."""
    day, month, year = s.split("/")
    return dt.date(int(year), int(month), int(day))


def load_source(spark: SparkSession, path: str, fmt: str) -> tuple[DataFrame, DataFrame | None]:
    """(canonical source frame, rejects-or-None). Parquet is assumed
    already canonical; csv/jsonl go through the cleaning pipeline."""
    from .sources.ingest import (
        read_sales_csv, read_sales_jsonl, read_sales_orc, split_rejects,
    )

    if fmt == "parquet":
        df = spark.read.parquet(path)
        rejects = None
    else:
        reader = {"csv": read_sales_csv, "jsonl": read_sales_jsonl,
                  "orc": read_sales_orc}[fmt]
        good, rejects = split_rejects(reader(spark, path))
        df = good.withColumnRenamed("metodo_raw", "metodo_pago_raw")
    if "metodo" not in df.columns:
        from .operators.classify import classify_method

        raw = "metodo_raw" if "metodo_raw" in df.columns else "metodo_pago_raw"
        df = df.withColumn("metodo", classify_method(F.col(raw)))
    if "metodo_raw" not in df.columns:
        df = df.withColumn("metodo_raw", F.col("metodo_pago_raw"))
    if "src_row_idx" not in df.columns:
        # pin D1 scan order explicitly (SURVEY §4): file order within a day
        df = df.withColumn("src_row_idx", F.monotonically_increasing_id())
    return df, rejects


def cmd_sync(args: argparse.Namespace) -> int:
    from .plans.sync_job import SyncJob
    from .session import get_spark
    from .sources.warehouse import Warehouse

    spark = get_spark("lavasmart-sync")
    if args.start:
        start, end = _parse_dmy(args.start), _parse_dmy(args.end or args.start)
    else:
        today = dt.date.today()
        start, end = today - dt.timedelta(days=args.lookback), today

    src, rejects = load_source(spark, args.source, args.format)
    wh = Warehouse(spark, args.warehouse)
    # construct (and so VALIDATE start/end) before any write: a bad
    # window must fail before the quarantine append, or a corrected
    # rerun double-counts the rejects
    job = SyncJob(spark, wh, start, end)
    # the whole verb — quarantine append included — runs under the
    # run-scoped writer lease (SyncJob.run nests reentrantly), so an
    # overlapping second sync fails BEFORE mutating anything: the old
    # order wrote rejects first and a ConcurrentWriterError loser left
    # them behind. (The rejects table itself stays at-least-once
    # telemetry: a rerun after a mid-run crash re-appends the same
    # rows. Each carries rejected_at, so downstream consumers dedup by
    # recency; the converged warehouse tables are the exactly-once
    # surface.)
    with wh.lock():
        n_rejects = 0
        if rejects is not None:
            n_rejects = rejects.count()
            if n_rejects:  # quarantine table: plain append-only parquet
                rejects.withColumn(
                    "rejected_at", F.current_timestamp()
                ).write.mode("append").parquet(f"{args.warehouse}/rejects")
        summary = job.run(src)
    summary["rejects"] = n_rejects
    summary["window"] = [start.isoformat(), end.isoformat()]
    print(json.dumps(summary, sort_keys=True))
    return 0


def _warn_if_unmigrated(wh) -> None:
    """Read-oriented verbs (verify/sql/render) must not mutate the
    warehouse — migrate_legacy commits rewrites and deletes root
    files, and a concurrent sync could be mid-write (single-writer
    contract). But silently fingerprinting / querying an unmigrated
    v1 audit_log under the canonical schema shows NULL payload
    columns, so surface the state instead of hiding it."""
    from .sources.warehouse import AUDIT_V1_COLUMNS, _parquet_columns
    import os as _os

    root = wh.path("audit_log")
    if not _os.path.isdir(root):
        return
    for n in _os.listdir(root):
        if n.endswith(".parquet") and _parquet_columns(
            _os.path.join(root, n)
        ) == AUDIT_V1_COLUMNS:
            print(
                "warning: audit_log holds unmigrated legacy v1 data; "
                "its payload columns read as NULL here — run `sync` or "
                "`maintain` (which migrate first) to widen it",
                file=sys.stderr,
            )
            return


def cmd_maintain(args: argparse.Namespace) -> int:
    from .session import get_spark
    from .sources.warehouse import ALL_TABLES, Warehouse

    spark = get_spark("lavasmart-maintain")
    wh = Warehouse(spark, args.warehouse)
    # migrate BEFORE any read/rewrite, like SyncJob.run: compacting an
    # unmigrated v1 audit_log under the canonical schema would commit
    # a null-corrupted copy (migrate_legacy can heal it, but never
    # arm the corner in the first place)
    wh.migrate_legacy()
    tables = args.tables or [t for t in ALL_TABLES if wh.exists(t)]
    report = {}
    for t in tables:
        if args.compact:
            wh.compact(t, num_files=args.num_files)
        if args.vacuum:
            wh.vacuum(t, keep=args.keep)
        report[t] = {"current": wh.current_version(t), "versions": len(wh.history(t))}
    print(json.dumps(report, sort_keys=True))
    return 0


def cmd_verify(args: argparse.Namespace) -> int:
    """Sync verification: order-insensitive fingerprints per table —
    run against source and destination warehouses and diff the JSON
    (the CH1 primitive, operators/aggregates.py::table_fingerprint)."""
    from .operators.aggregates import table_fingerprint
    from .session import get_spark
    from .sources.warehouse import ALL_TABLES, Warehouse

    spark = get_spark("lavasmart-verify")
    wh = Warehouse(spark, args.warehouse)
    _warn_if_unmigrated(wh)  # read-only verb: report, don't rewrite
    read_only = _ReadOnlyTables(spark, wh)
    tables = args.tables or [t for t in ALL_TABLES if wh.exists(t)]
    report = {}
    for t in tables:
        fp = table_fingerprint(read_only(t), month_col=args.month_col)
        report[t] = {
            r["month"]: {"n_rows": r["n_rows"], "xor_fingerprint": r["xor_fingerprint"]}
            for r in fp.collect()
        }
    print(json.dumps(report, sort_keys=True))
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    """Ad-hoc SQL over the warehouse: every existing table registered
    as a temp view, the query planned by Catalyst like any engine
    query (pushdown/pruning/broadcast apply), results printed as JSON
    lines (driver-side rows capped by --limit; at scale route results
    to a table with CREATE TABLE AS instead)."""
    from .session import get_spark
    from .sources.warehouse import ALL_TABLES, Warehouse

    spark = get_spark("lavasmart-sql")
    wh = Warehouse(spark, args.warehouse)
    _warn_if_unmigrated(wh)  # read-only verb: report, don't rewrite
    read_only = _ReadOnlyTables(spark, wh)
    for t in ALL_TABLES:
        # EVERY canonical table gets a view — absent/torn ones as the
        # canonical empty shape (with one warning) — so ad-hoc SQL
        # never dies with TABLE_OR_VIEW_NOT_FOUND on a fresh or
        # crash-torn warehouse, and nothing is created or healed
        read_only(t).createOrReplaceTempView(t)
    if len(read_only.missing) == len(ALL_TABLES):
        # a mistyped --warehouse must read as an anomaly, not as "the
        # warehouse is empty": every view being the empty fallback is
        # called out once, loudly, before the (empty) results print
        print(
            f"warning: NO table has readable state under {wh.root!r} — "
            "wrong --warehouse path? All views are empty placeholders",
            file=sys.stderr,
        )
    df = spark.sql(args.query).limit(args.limit)
    for row in df.toJSON().collect():
        print(row)
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run one registered analytics query by name against a
    testdata-shaped table directory and print JSON lines (rows capped
    by --limit; --explain prints the formatted physical plan instead
    of executing). The registry is the same oracle-checked surface the
    driver verifies — this is the user-facing way to run any of them
    standalone."""
    from .queries import QUERIES
    from .session import get_spark

    if args.name not in QUERIES:
        # rank by longest shared prefix so "a1_typo" suggests
        # a1_sum_by_lot before a10..a15 (plain substring+sort put the
        # two-digit families first once the registry grew past a13)
        def lcp(other: str) -> int:
            n = 0
            for x, y in zip(args.name, other):
                if x != y:
                    break
                n += 1
            return n

        close = sorted(QUERIES, key=lambda n: (-lcp(n), n))[:5]
        print(
            json.dumps({"error": f"unknown query: {args.name}", "did_you_mean": close}),
            file=sys.stderr,
        )
        return 2
    spark = get_spark("lavasmart-query")
    df = QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    for row in df.limit(args.limit).toJSON().collect():
        print(row)
    return 0


#: workbook egress sheet headers — the shipped workbook's own header
#: rows (data sheets verified in tests/test_xlsx.py) and the header
#: row the reference CREATES for Cierres_Lotes (Code.gs:478-486)
_RENDER_HEADERS = {
    "Conciliacion_Transferencias": [
        "Fecha", "Folio", "Cliente", "Servicio (s)", "Banco", "Monto",
        "✅ Conciliado", "💳 Concepto Banco", "🔍 Observaciones",
    ],
    "Conciliacion_Tarjetas": [
        "Fecha", "Folio", "Cliente", "Servicio (s)", "Monto",
        "🧾 Recibo", "afiliación", "📦 # Lote", "🔍 Observaciones",
    ],
    "totales": ["Fecha", "Transferencia", "Banco"],
    "Cierres_Lotes": [
        "Fecha", "# Lote", "Total Cierre", "Total Folios", "✅ Cuadra",
        "💰 Depositado", "🔍 Observaciones",
    ],
}

#: warehouse (table, column order) behind each data sheet — derived
#: from the staging source of truth (sources/xlsx.py REFERENCE_SHEETS,
#: minus the coercion tags) so a column added or reordered there
#: cannot leave render emitting a stale shape.
_RENDER_COLS = {
    sheet: (table, [name for name, _ in cols])
    for sheet, (table, cols) in xlsx.REFERENCE_SHEETS.items()
    if sheet in ("Conciliacion_Transferencias", "Conciliacion_Tarjetas")
}


class _ReadOnlyTables:
    """Per-verb cache of strictly read-only table views (ADVICE r8 +
    its review follow-up): a read verb pointed at a fresh, wrong, or
    crash-torn --warehouse path must neither mutate the directory
    (``wh.read`` ensures — creates, heals, takes the writer lease)
    nor surface a raw Spark path error. ``Warehouse.peek`` provides
    the no-side-effect view; missing/unreadable tables degrade to the
    canonical empty shape with ONE stderr warning each (the cache also
    keeps repeat readers from building duplicate scan plans)."""

    def __init__(self, spark, wh):
        self.spark, self.wh = spark, wh
        self._cache: dict = {}
        self.missing: set[str] = set()  # tables served as empty fallback

    def __call__(self, table: str):
        from .sources.warehouse import ALL_TABLES

        if table not in self._cache:
            df = self.wh.peek(table)
            if df is None:
                self.missing.add(table)
                print(
                    f"warning: table {table!r} has no readable state under "
                    f"{self.wh.root!r}; rendering it empty",
                    file=sys.stderr,
                )
                df = self.spark.createDataFrame([], ALL_TABLES[table])
            self._cache[table] = df
        return self._cache[table]


def cmd_render(args: argparse.Namespace) -> int:
    """Workbook egress: render engine state back into the reference's
    spreadsheet shapes — the two conciliation data sheets, the
    `totales` per-day SUMIFS column (sheet7.xml!B2 semantics, computed
    as values over a continuous day spine), and `Cierres_Lotes` with
    its D/E formula columns computed (Code.gs:499-500; declared
    totals + human columns joined from `batch_closures`). Writes a
    real .xlsx via the stdlib writer, readable by any spreadsheet
    app and by sources/xlsx.py. Driver-side collect by design — a
    workbook is a bounded dimension-grade artifact (the xlsx scale
    boundary, sources/xlsx.py docstring). The formula semantics are
    the shared functions/workbook.py builders, the same expressions
    the oracle-verified xlsx2/xlsx3 queries run."""
    from .functions.workbook import cuadra, daily_transfer_totals, lot_totals
    from .session import get_spark
    from .sources.warehouse import Warehouse
    from .sources.xlsx import write_workbook

    spark = get_spark("lavasmart-render")
    wh = Warehouse(spark, args.warehouse)
    _warn_if_unmigrated(wh)  # read-only verb: report, don't rewrite
    tables = _ReadOnlyTables(spark, wh)
    sheets: dict[str, list[list[object]]] = {}

    for sheet, (table, cols) in _RENDER_COLS.items():
        rows = (
            tables(table)
            .orderBy("fecha", "folio")
            .select(*cols)
            .collect()
        )
        sheets[sheet] = [_RENDER_HEADERS[sheet]] + [list(r) for r in rows]

    transfers = tables("transfers")
    lo, hi = transfers.agg(F.min("fecha"), F.max("fecha")).first()
    tot_rows: list[list[object]] = []
    if lo is not None:
        # continuous day spine over the observed range (the sheet's
        # Fecha column); the aggregation itself is the shared builder
        spine = spark.range(1).select(
            F.explode(F.sequence(F.lit(lo), F.lit(hi))).alias("fecha")
        )
        tot = daily_transfer_totals(transfers, spine).orderBy("fecha")
        tot_rows = [[r["fecha"], r["transferencia"], None] for r in tot.collect()]
    sheets["totales"] = [_RENDER_HEADERS["totales"]] + tot_rows

    closures = tables("batch_closures").select(
        "lote", "fecha", "total_cierre", "depositado", "observaciones"
    )
    cierres = (
        lot_totals(tables("cards"))
        .join(closures, "lote", "full_outer")
        .orderBy("lote")
        .select(
            "fecha", "lote", "total_cierre",
            # a closure-registered lot absent from cards displays 0.00
            F.round(F.coalesce("total_folios", F.lit(0.0)), 2).alias("total_folios"),
            cuadra(F.col("total_cierre"), F.col("total_folios")).alias("cuadra"),
            "depositado", "observaciones",
        )
        .collect()
    )
    sheets["Cierres_Lotes"] = [_RENDER_HEADERS["Cierres_Lotes"]] + [
        list(r) for r in cierres
    ]

    write_workbook(args.out, sheets)
    print(json.dumps(
        {sheet: len(rows) - 1 for sheet, rows in sheets.items()},
        sort_keys=True, ensure_ascii=False,
    ))
    return 0


def cmd_list_queries(args: argparse.Namespace) -> int:
    """List the registered query surface, one JSON line per query
    (name + first docstring line), importable without a JVM."""
    import inspect

    from .queries import QUERIES

    for name, fn in sorted(QUERIES.items()):
        doc = (inspect.getdoc(fn) or "").split("\n")[0]
        print(json.dumps({"name": name, "doc": doc}, sort_keys=True))
    return 0


def cmd_fsck(args: argparse.Namespace) -> int:
    """Read-only consistency check of a Warehouse root — no
    SparkSession, no JVM, never mutates. Classifies every finding as
    info (expected: live lock, legacy layout), healable (crash
    leftovers the next writer converges), or damage
    (protocol-impossible external interference — human required); the
    exit code follows fsck convention: 0 clean, 1 healable, 2 damage.
    See sources/fsck.py for the state catalog. (The CatalogStore twin,
    ``inspect_catalog_store``, is a library API only: that backend is
    reached through the TableStore seam, not through this CLI, and its
    catalog lives in the owning session's metastore.)"""
    from .sources.fsck import inspect_store

    report = inspect_store(args.warehouse, deep=args.deep)
    print(json.dumps(report, sort_keys=True, indent=None))
    return report["exit_code"]


def cmd_rollback(args: argparse.Namespace) -> int:
    """Disaster recovery: repoint a table's committed state at an
    older retained snapshot (the verb fsck's `damage` findings
    prescribe). Validates the target is an intact on-disk snapshot
    before the atomic pointer commit; newer version dirs are left on
    disk (hand-recoverable until the next write reclaims them) —
    rolling FORWARD is refused, since a newer dir is indistinguishable
    from a crashed write's never-published state."""
    from .session import get_spark
    from .sources.warehouse import Warehouse

    spark = get_spark("lavasmart-rollback")
    wh = Warehouse(spark, args.warehouse)
    # tolerant read: rollback is the verb fsck prescribes for an
    # UNREADABLE pointer (a directory, binary junk), so the before-
    # state probe must not crash on exactly that damage
    before, damaged = wh.pointer_state(args.table)
    try:
        wh.rollback(args.table, args.version)
    except (ValueError, OSError, UnicodeDecodeError) as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    print(json.dumps(
        {
            "table": args.table,
            "from": "<unreadable>" if damaged else before,
            "to": args.version,
        },
        sort_keys=True,
    ))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="lavasmart-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("sync", help="incremental sync / backfill")
    s.add_argument("--source", required=True, help="source table path")
    s.add_argument("--format", choices=["parquet", "csv", "jsonl", "orc"], default="parquet")
    s.add_argument("--warehouse", required=True, help="destination warehouse dir")
    s.add_argument("--start", help="d/M/yyyy backfill start (default: today-lookback)")
    s.add_argument("--end", help="d/M/yyyy backfill end (default: start or today)")
    s.add_argument("--lookback", type=int, default=DEFAULT_LOOKBACK_DAYS,
                   help="daily-run lookback days (DIAS_LOOKBACK)")
    s.set_defaults(fn=cmd_sync)

    m = sub.add_parser("maintain", help="compact small files / vacuum old snapshots")
    m.add_argument("--warehouse", required=True)
    m.add_argument("--tables", nargs="*", help="default: every existing table")
    m.add_argument("--compact", action="store_true")
    m.add_argument("--num-files", type=int, default=1)
    m.add_argument("--vacuum", action="store_true")
    m.add_argument("--keep", type=int, default=2)
    m.set_defaults(fn=cmd_maintain)

    v = sub.add_parser(
        "verify", help="order-insensitive table fingerprints for sync verification"
    )
    v.add_argument("--warehouse", required=True)
    v.add_argument("--tables", nargs="*", help="default: every existing table")
    v.add_argument("--month-col", default="fecha",
                   help="date column for per-month grouping")
    v.set_defaults(fn=cmd_verify)

    ql = sub.add_parser("sql", help="ad-hoc SQL over the warehouse tables")
    ql.add_argument("--warehouse", required=True)
    ql.add_argument("--limit", type=int, default=1000, help="max rows printed")
    ql.add_argument("query", help="SQL over the registered table views")
    ql.set_defaults(fn=cmd_sql)

    qr = sub.add_parser("query", help="run one registered analytics query by name")
    qr.add_argument("name", help="query name (see the `queries` subcommand)")
    qr.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="directory of the parquet tables the query reads")
    qr.add_argument("--limit", type=int, default=1000, help="max rows printed")
    qr.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of running")
    qr.set_defaults(fn=cmd_query)

    lq = sub.add_parser("queries", help="list the registered query surface")
    lq.set_defaults(fn=cmd_list_queries)

    rd = sub.add_parser(
        "render", help="render warehouse state into the reference workbook shapes (.xlsx)"
    )
    rd.add_argument("--warehouse", required=True)
    rd.add_argument("--out", required=True, help="output .xlsx path")
    rd.set_defaults(fn=cmd_render)

    fs = sub.add_parser(
        "fsck",
        help="read-only warehouse consistency check (exit 0 clean / "
        "1 healable crash leftovers / 2 external damage)",
    )
    fs.add_argument("--warehouse", required=True)
    fs.add_argument("--deep", action="store_true",
                    help="verify every parquet footer inside EVERY "
                    "committed snapshot, not just each table's CURRENT "
                    "one (O(all files) driver-side)")
    fs.set_defaults(fn=cmd_fsck)

    rb = sub.add_parser(
        "rollback",
        help="repoint a table at an older retained snapshot "
        "(recovery for fsck damage findings)",
    )
    rb.add_argument("--warehouse", required=True)
    rb.add_argument("--table", required=True)
    rb.add_argument("--version", required=True,
                    help="target snapshot name (v_NNNNNNNN; see fsck "
                    "output or history)")
    rb.set_defaults(fn=cmd_rollback)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
