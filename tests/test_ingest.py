"""CSV/JSONL ingestion: the reference's messy-cell parsing (F1-F3)
+ P4 quarantine split applied at the scan (SURVEY §2.1 S1/S8)."""

from __future__ import annotations

import datetime as dt

import pytest

from lavasmart_bank_sync_etl_spark.sources.ingest import (
    read_sales_csv,
    read_sales_jsonl,
    split_rejects,
)

CSV = """folio,fecha,cliente,servicio,monto,metodo_pago,banco
0-17850,1/11/2025,"ACME, SA",Lavado,"$1,200.50",Transferencia bancaria,SANTANDER
0-18052,15/11/2025,Juan,Secado,$550.00,tarjeta de credito,
0-18053,,Cliente X,Lavado,N/A,EFECTIVO,
,2/11/2025,SinFolio,Lavado,100,efectivo,
0-18054,31/2/2025,FechaMala,Lavado,10,otros metodos,
"""


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "sales.csv"
    p.write_text(CSV)
    return str(p)


def test_csv_ingest_parsing_and_quarantine(spark, csv_path):
    good, rejects = split_rejects(read_sales_csv(spark, csv_path))
    g = {r["folio"]: r for r in good.collect()}

    # F1: d/M/yyyy no-padding; F2: $ , stripped; F3: quotes+trim
    assert set(g) == {"0-17850", "0-18052"}
    assert g["0-17850"]["sale_date"] == dt.date(2025, 11, 1)
    assert g["0-17850"]["monto"] == pytest.approx(1200.50)
    assert g["0-17850"]["cliente"] == "ACME, SA"
    assert g["0-17850"]["metodo"] == "TRANSFERENCIA"
    assert g["0-18052"]["metodo"] == "TARJETA"

    # P4 quarantine: empty/missing date, empty folio, invalid date
    r = rejects.collect()
    assert len(r) == 3
    # F2 contract: unparseable money is 0.0, not null, even on rejects
    na_row = [x for x in r if x["folio"] == "0-18053"][0]
    assert na_row["monto"] == 0.0


def test_jsonl_ingest_matches_csv(spark, tmp_path, csv_path):
    import json

    rows = [
        {"folio": "0-17850", "fecha": "1/11/2025", "cliente": '"ACME, SA"',
         "servicio": "Lavado", "monto": "$1,200.50",
         "metodo_pago": "Transferencia bancaria", "banco": "SANTANDER"},
        {"folio": "0-18052", "fecha": "15/11/2025", "cliente": "Juan",
         "servicio": "Secado", "monto": "$550.00",
         "metodo_pago": "tarjeta de credito", "banco": None},
    ]
    p = tmp_path / "sales.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))

    good_j, _ = split_rejects(read_sales_jsonl(spark, str(p)))
    good_c, _ = split_rejects(read_sales_csv(spark, csv_path))
    jj = {r["folio"]: r for r in good_j.collect()}
    cc = {r["folio"]: r for r in good_c.collect()}
    for folio in jj:
        assert jj[folio]["sale_date"] == cc[folio]["sale_date"]
        assert jj[folio]["monto"] == cc[folio]["monto"]
        assert jj[folio]["metodo"] == cc[folio]["metodo"]


def test_csv_missing_column_fails_loudly(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("folio,fecha\n1,2/2/2025\n")
    with pytest.raises(ValueError, match="missing columns"):
        read_sales_csv(spark, str(p))
