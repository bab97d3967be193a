"""Migration acceptance PoC at full loop (requerimientos.md:184;
VERDICT r8 task 5): the shipped reference workbook's data sheets are
ingested as a sync SOURCE, run through SyncJob into a fresh warehouse,
the human-maintained columns adopted once (the S4 protected-column
surface, exercised here as the migration's manual-work import), and
the warehouse rendered BACK to xlsx — and the round trip must
reproduce the workbook's data sheets and its computed-sheet formula
semantics (`totales` SUMIFS, `Cierres_Lotes` SUMIF/IF).

This composes pieces each pinned elsewhere (xlsx staging, SyncJob,
render CLI, workbook formula module) into the end-to-end path a
spreadsheet user actually migrates along.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.cli import main
from lavasmart_bank_sync_etl_spark.operators.classify import classify_method
from lavasmart_bank_sync_etl_spark.plans.sync_job import SyncJob
from lavasmart_bank_sync_etl_spark.queries_workbook import WORKBOOK
from lavasmart_bank_sync_etl_spark.schemas import TARGETS
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse
from lavasmart_bank_sync_etl_spark.sources.xlsx import extract_tables

from test_week_sim import check_invariants

pytestmark = pytest.mark.skipif(
    not os.path.exists(WORKBOOK), reason="reference workbook not present"
)

#: the raw method strings a spreadsheet user would carry per sheet —
#: classified by P2's substring cascade into the sheet's own table
_METODO_RAW = {"transfers": "Transferencia bancaria", "cards": "Tarjeta de crédito"}


def _norm(v):
    """xlsx blank-cell identity: the engine stores '' where the sheet
    holds an empty cell (banco coalesce), and an empty cell reads back
    as None — both are the same blank."""
    return "" if v is None else v


def _source_df(spark, tables):
    rows = []
    for table in ("transfers", "cards"):
        for i, r in enumerate(tables[table]):
            rows.append((
                r["folio"], r["fecha"], r["cliente"], r["servicio"],
                r["monto"], _METODO_RAW[table], r.get("banco"), i,
            ))
    src = spark.createDataFrame(
        rows,
        "folio string, sale_date date, cliente string, servicio string, "
        "monto double, metodo_raw string, banco string, src_row_idx long",
    )
    return src.withColumn("metodo", classify_method(F.col("metodo_raw")))


def _adopt_human_columns(spark, wh, tables):
    """One-time manual-work import: the workbook's human-maintained
    columns (checkboxes, bank concepts, lots, notes) joined onto the
    synced script rows by folio — the migration-day analog of the S4
    protected-column update."""
    for table in ("transfers", "cards"):
        _, _, human_cols = TARGETS[table]
        human = spark.createDataFrame(
            [
                tuple([r["folio"]] + [r.get(c) for c in human_cols])
                for r in tables[table]
            ],
            wh.read(table).select("folio", *human_cols).schema,
        )
        wh.rewrite(
            table, wh.read(table).drop(*human_cols).join(human, "folio", "left")
        )


def test_workbook_migration_round_trip(spark, tmp_path, capsys):
    tables = extract_tables(WORKBOOK)
    n_tr, n_cd = len(tables["transfers"]), len(tables["cards"])
    assert n_tr > 0 and n_cd > 0

    # ---- ingest: workbook data sheets as the sync source ----------
    fechas = [r["fecha"] for r in tables["transfers"] + tables["cards"]]
    wh = Warehouse(spark, str(tmp_path / "wh"))
    summary = SyncJob(spark, wh, min(fechas), max(fechas), run_id="mig").run(
        _source_df(spark, tables)
    )
    assert summary["insert"] == n_tr + n_cd
    for k in ("conflicts", "duplicates", "deletions_detected", "auto_moves"):
        assert summary.get(k, 0) == 0, (k, summary)
    check_invariants(wh)

    _adopt_human_columns(spark, wh, tables)
    check_invariants(wh)

    # ---- egress: render the warehouse back to a real xlsx ---------
    out = str(tmp_path / "migrated.xlsx")
    capsys.readouterr()
    assert main(["render", "--warehouse", str(tmp_path / "wh"), "--out", out]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["Conciliacion_Transferencias"] == n_tr
    assert report["Conciliacion_Tarjetas"] == n_cd

    # ---- round trip: re-extract with the same typed reader --------
    back = extract_tables(out)

    def keyed(rows):
        return {r["folio"]: r for r in rows}

    for table in ("transfers", "cards"):
        orig, got = keyed(tables[table]), keyed(back[table])
        assert set(got) == set(orig), table
        cols = [name for name, _ in _sheet_cols(table)]
        for folio, o in orig.items():
            g = got[folio]
            for c in cols:
                assert _norm(g.get(c)) == _norm(o.get(c)), (table, folio, c)

    # ---- computed sheets: the workbook's own formula semantics ----
    # totales!B = SUMIFS per spine day (render uses the observed
    # continuous day range); expected recomputed exactly from the
    # source-of-truth dicts at fixed 2-dp decimal
    per_day = defaultdict(Decimal)
    for r in tables["transfers"]:
        per_day[r["fecha"]] += Decimal(str(r["monto"]))
    totales = {r["fecha"]: r["transferencia"] for r in back["daily_totals"]}
    assert min(totales) == min(fechas) and max(totales) == max(fechas)
    for day, got_sum in totales.items():
        assert Decimal(str(got_sum)) == per_day.get(day, Decimal(0)), day

    # Cierres_Lotes: D = per-lot SUMIF over cards, C blank (no closure
    # registered), E = blank-is-zero equality check (all ❌ unless a
    # lot sums to exactly 0)
    per_lot = defaultdict(Decimal)
    for r in tables["cards"]:
        if r.get("lote"):
            per_lot[r["lote"]] += Decimal(str(r["monto"] or 0))
    cierres = {
        row[1]: row for row in _sheet_rows(out, "Cierres_Lotes")
    }
    assert set(cierres) == set(per_lot)
    for lote, row in cierres.items():
        _, _, total_cierre, total_folios, cuadra = row[:5]
        assert Decimal(str(total_folios)) == per_lot[lote], lote
        assert total_cierre is None
        assert cuadra == ("✅" if per_lot[lote] == 0 else "❌")


def _sheet_cols(table):
    from lavasmart_bank_sync_etl_spark.sources.xlsx import REFERENCE_SHEETS

    for sheet, (t, cols) in REFERENCE_SHEETS.items():
        if t == table:
            return cols
    raise KeyError(table)


def _sheet_rows(path, sheet):
    from lavasmart_bank_sync_etl_spark.sources.xlsx import read_workbook

    return read_workbook(path)[sheet][1:]
