"""CLI entry point: the reference's daily-sync / backfill triggers as
`python -m lavasmart_bank_sync_etl_spark.cli sync` (function-level —
no second JVM)."""

from __future__ import annotations

import json

import pytest

from lavasmart_bank_sync_etl_spark.cli import main
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

CSV = """folio,fecha,cliente,servicio,monto,metodo_pago,banco
0-1,2/11/2025,Ana,Sala,"$1,200.50",Transferencia bancaria,SANTANDER
0-2,3/11/2025,Juan,Secado,$550.00,tarjeta de credito,
0-3,,SinFecha,Lavado,10,efectivo,
"""


def test_cli_backfill_csv(spark, tmp_path, capsys):
    src = tmp_path / "sales.csv"
    src.write_text(CSV)
    wh_dir = str(tmp_path / "wh")

    rc = main([
        "sync", "--source", str(src), "--format", "csv",
        "--warehouse", wh_dir, "--start", "1/11/2025", "--end", "10/11/2025",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["insert"] == 2
    assert summary["rejects"] == 1
    assert summary["window"] == ["2025-11-01", "2025-11-10"]

    wh = Warehouse(spark, wh_dir)
    t = {r["folio"]: r for r in wh.read("transfers").collect()}
    assert t["0-1"]["monto"] == pytest.approx(1200.50)
    assert wh.read("cards").count() == 1
    # quarantined row landed in the rejects table
    assert spark.read.parquet(f"{wh_dir}/rejects").count() == 1


def test_cli_maintain(spark, tmp_path, capsys):
    src = tmp_path / "sales.csv"
    src.write_text(CSV)
    wh_dir = str(tmp_path / "wh")
    args = ["sync", "--source", str(src), "--format", "csv",
            "--warehouse", wh_dir, "--start", "1/11/2025", "--end", "10/11/2025"]
    main(args)
    # a second sync with a change creates another transfers snapshot
    src.write_text(CSV.replace("$1,200.50", "$1,300.00"))
    main(args)
    capsys.readouterr()
    rc = main(["maintain", "--warehouse", wh_dir, "--tables", "transfers",
               "--compact", "--vacuum", "--keep", "2"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["transfers"]["versions"] == 2
    wh = Warehouse(spark, wh_dir)
    assert {r["folio"]: r["monto"] for r in wh.read("transfers").collect()}["0-1"] == \
        pytest.approx(1300.00)


def test_cli_rerun_idempotent(spark, tmp_path, capsys):
    src = tmp_path / "sales.csv"
    src.write_text(CSV)
    wh_dir = str(tmp_path / "wh")
    args = ["sync", "--source", str(src), "--format", "csv",
            "--warehouse", wh_dir, "--start", "1/11/2025", "--end", "10/11/2025"]
    main(args)
    capsys.readouterr()
    main(args)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary.get("insert") is None
    assert summary["unchanged"] == 2


def test_cli_verify_fingerprints(spark, tmp_path, capsys):
    """verify: identical warehouse -> identical fingerprints on rerun;
    a source change flips exactly the affected table's fingerprint."""
    src = tmp_path / "sales.csv"
    src.write_text(CSV)
    wh_dir = str(tmp_path / "wh")
    assert main([
        "sync", "--source", str(src), "--format", "csv",
        "--warehouse", wh_dir, "--start", "1/11/2025", "--end", "10/11/2025",
    ]) == 0
    capsys.readouterr()

    assert main(["verify", "--warehouse", wh_dir]) == 0
    fp1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(["verify", "--warehouse", wh_dir]) == 0
    fp2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fp1 == fp2 and "transfers" in fp1
    assert fp1["transfers"]["2025-11"]["n_rows"] == 1

    # amount change on the transfer row -> transfers fingerprint moves
    src.write_text(CSV.replace("$1,200.50", "$999.99"))
    assert main([
        "sync", "--source", str(src), "--format", "csv",
        "--warehouse", wh_dir, "--start", "1/11/2025", "--end", "10/11/2025",
    ]) == 0
    capsys.readouterr()
    assert main(["verify", "--warehouse", wh_dir]) == 0
    fp3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fp3["transfers"]["2025-11"]["xor_fingerprint"] != fp1["transfers"]["2025-11"]["xor_fingerprint"]
    assert fp3["cards"] == fp1["cards"]


def test_cli_sync_orc_source(spark, tmp_path, capsys):
    """ORC export ingests through the same cleaning/quarantine path."""
    src_csv = tmp_path / "sales.csv"
    src_csv.write_text(CSV)
    orc_dir = str(tmp_path / "sales_orc")
    (
        spark.read.option("header", "true").csv(str(src_csv))
        .write.orc(orc_dir)
    )
    wh_dir = str(tmp_path / "wh_orc")
    rc = main([
        "sync", "--source", orc_dir, "--format", "orc",
        "--warehouse", wh_dir, "--start", "1/11/2025", "--end", "10/11/2025",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["insert"] >= 2 and summary["rejects"] == 1  # no-date row quarantined


def test_cli_sql_over_warehouse(spark, tmp_path, capsys):
    src = tmp_path / "sales.csv"
    src.write_text(CSV)
    wh_dir = str(tmp_path / "wh_sql")
    assert main([
        "sync", "--source", str(src), "--format", "csv",
        "--warehouse", wh_dir, "--start", "1/11/2025", "--end", "10/11/2025",
    ]) == 0
    capsys.readouterr()
    assert main([
        "sql", "--warehouse", wh_dir,
        "SELECT folio, monto FROM transfers ORDER BY folio",
    ]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines and lines[0]["folio"] == "0-1" and lines[0]["monto"] == 1200.5


def test_cli_list_queries(capsys):
    """`queries` lists exactly the registered surface as JSON lines,
    without needing a JVM."""
    from lavasmart_bank_sync_etl_spark.queries import QUERIES

    assert main(["queries"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    names = {json.loads(line)["name"] for line in lines}
    assert names == set(QUERIES)


def test_cli_run_query_by_name(spark, capsys):
    """`query <name>` runs a registered query against an sf dir and
    prints row JSON; unknown names fail with exit 2 + suggestions."""
    rc = main([
        "query", "a1_sum_by_lot",
        "--sf-dir", "/root/testdata/sf0.001", "--limit", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert 0 < len(out) <= 5
    assert {"lote", "total"} <= set(json.loads(out[0]))

    assert main(["query", "a1_definitely_not_registered"]) == 2
    err = capsys.readouterr().err
    assert "unknown query" in err and "a1_sum_by_lot" in err


def test_cli_render_workbook(spark, tmp_path, capsys):
    """render: engine state → a real .xlsx in the reference's sheet
    shapes; read back with the stdlib reader and check the totales
    SUMIFS values and the Cierres_Lotes D/E computed columns against
    warehouse content (the egress loop the reference closes with live
    formulas, closed here with computed values)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from lavasmart_bank_sync_etl_spark.sources.warehouse import ALL_TABLES
    from lavasmart_bank_sync_etl_spark.sources.xlsx import read_workbook

    src = tmp_path / "sales.csv"
    src.write_text(CSV)
    wh_dir = str(tmp_path / "wh")
    main(["sync", "--source", str(src), "--format", "csv",
          "--warehouse", wh_dir, "--start", "1/11/2025", "--end", "10/11/2025"])
    wh = Warehouse(spark, wh_dir)
    # a human registers the card lot + its terminal closure ticket
    wh.rewrite("cards", wh.read("cards").withColumn("lote", F.lit("L-1")))
    wh.append("batch_closures", spark.createDataFrame(
        [(dt.date(2025, 11, 3), "L-1", 550.0, True, "ok")],
        ALL_TABLES["batch_closures"],
    ))
    capsys.readouterr()

    out = str(tmp_path / "report.xlsx")
    rc = main(["render", "--warehouse", wh_dir, "--out", out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report == {
        "Conciliacion_Transferencias": 1, "Conciliacion_Tarjetas": 1,
        "totales": 1, "Cierres_Lotes": 1,
    }

    book = read_workbook(out)
    assert set(book) == set(report)
    t = book["Conciliacion_Transferencias"]
    assert t[0][:6] == ["Fecha", "Folio", "Cliente", "Servicio (s)", "Banco", "Monto"]
    assert t[1][1] == "0-1" and t[1][5] == 1200.5
    tot = book["totales"]
    assert tot[0] == ["Fecha", "Transferencia", "Banco"]
    assert tot[1] == [dt.date(2025, 11, 2), 1200.5, None]  # SUMIFS value
    (header, cierre) = book["Cierres_Lotes"]
    assert header[:5] == ["Fecha", "# Lote", "Total Cierre", "Total Folios", "✅ Cuadra"]
    assert cierre[1] == "L-1" and cierre[2] == 550.0
    assert cierre[3] == 550.0 and cierre[4] == "✅"  # D=SUMIF, E balances
    assert cierre[5] is True and cierre[6] == "ok"   # human cols survive egress


def test_cli_render_fresh_warehouse_renders_empty_sheets(tmp_path, capsys):
    """ADVICE r8: render pointed at a fresh/wrong --warehouse must be
    a true read verb — no table creation on disk, no raw Spark path
    error — emitting header-only sheets plus a stderr warning per
    missing table."""
    import os

    from lavasmart_bank_sync_etl_spark.sources.xlsx import read_workbook

    wh_dir = str(tmp_path / "nowhere")
    out = str(tmp_path / "empty.xlsx")
    rc = main(["render", "--warehouse", wh_dir, "--out", out])
    assert rc == 0
    captured = capsys.readouterr()
    report = json.loads(captured.out.strip().splitlines()[-1])
    assert report == {
        "Cierres_Lotes": 0, "Conciliacion_Tarjetas": 0,
        "Conciliacion_Transferencias": 0, "totales": 0,
    }
    assert "no readable state" in captured.err
    # one warning per missing table, even though transfers/cards are
    # read twice (data sheet + computed sheet): the per-verb cache
    assert captured.err.count("transfers") == 1
    sheets = read_workbook(out)
    assert all(len(rows) == 1 for rows in sheets.values())  # headers only
    # read verb: it must not have materialized any table on disk
    created = [
        n for n in (os.listdir(wh_dir) if os.path.isdir(wh_dir) else [])
        if not n.startswith("_")
    ]
    assert created == []


def test_cli_render_torn_husk_is_not_healed(spark, tmp_path, capsys):
    """Review follow-up to the ADVICE r8 render guard: a table dir in
    the torn-first-commit state (v_* dir, no _CURRENT pointer) passes
    exists(), but a READ verb must still not heal it — peek() serves
    None (rendered empty) and the husk stays byte-identical for the
    next WRITER to heal."""
    import os

    wh_dir = tmp_path / "wh"
    husk = wh_dir / "transfers" / "v_00000001"
    husk.mkdir(parents=True)
    (husk / "part-torn.parquet").write_bytes(b"PAR1 torn bytes")
    before = sorted(os.listdir(husk))

    out = str(tmp_path / "report.xlsx")
    rc = main(["render", "--warehouse", str(wh_dir), "--out", out])
    assert rc == 0
    captured = capsys.readouterr()
    report = json.loads(captured.out.strip().splitlines()[-1])
    assert report["Conciliacion_Transferencias"] == 0
    assert "transfers" in captured.err  # warned, not healed
    # the husk is untouched: no pointer written, no dir cleared
    assert sorted(os.listdir(husk)) == before
    assert not (wh_dir / "transfers" / "_CURRENT").exists()
    assert not (wh_dir / "_WRITER_LOCK").exists()  # lease lives at root
