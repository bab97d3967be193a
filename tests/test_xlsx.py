"""XLSX ingest/egress (sources/xlsx.py): golden assertions against the
SHIPPED reference workbook — the reference's acceptance data
(requerimientos.md:184) — plus writer↔reader roundtrip properties and
the v1→v2 audit-log widening migration."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lavasmart_bank_sync_etl_spark.sources.xlsx import (
    coerce_checkbox_py,
    extract_tables,
    read_workbook,
    serial_to_datetime,
    stage_workbook,
    widen_audit_v1,
    write_workbook,
)

WORKBOOK = "/root/reference/Hoja de conciliación de movimientos bancarios.xlsx"

needs_workbook = pytest.mark.skipif(
    not os.path.exists(WORKBOOK), reason="reference workbook not present"
)


# ---------------------------------------------------------------------------
# golden: the shipped workbook
# ---------------------------------------------------------------------------

@needs_workbook
def test_shipped_workbook_sheets_and_headers():
    book = read_workbook(WORKBOOK)
    assert set(book) == {
        "Conciliacion_Transferencias", "Banco", "cat", "Conciliacion_Tarjetas",
        "Cierres_Lotes", "📢 Bitácora_Hallazgos", "totales", "📝 Bitácora_Cambios",
    }
    assert book["Conciliacion_Transferencias"][0][:6] == [
        "Fecha", "Folio", "Cliente", "Servicio (s)", "Banco", "Monto",
    ]
    assert book["totales"][0] == ["Fecha", "Transferencia", "Banco"]
    # older 5-col audit v1 variant (SURVEY §1.3 note); the grid itself
    # is padded one column wider by a stray cell in a data row
    assert book["📝 Bitácora_Cambios"][0][:5] == [
        "Timestamp", "Folio", "Campo Modificado", "Valor Anterior", "Valor Nuevo",
    ]


@needs_workbook
def test_shipped_workbook_extracted_row_counts():
    """Non-empty data rows per staged table (blank styled rows in the
    sheet grid don't count — the reference reads data rows only,
    Code.gs:716 / requerimientos.md:73)."""
    t = extract_tables(WORKBOOK)
    assert len(t["transfers"]) == 129
    assert len(t["cards"]) == 40
    assert len(t["bank_statement"]) == 768
    assert len(t["daily_totals"]) == 396
    assert len(t["audit_log"]) == 48


@needs_workbook
def test_shipped_workbook_typed_values():
    t = extract_tables(WORKBOOK)
    first = t["transfers"][0]
    assert first["folio"] == "0-18592"
    assert first["fecha"] == dt.date(2025, 11, 16)
    assert first["monto"] == 900.0
    assert first["conciliado"] is True
    card = t["cards"][0]
    # 'SI'/1-style checkbox variants coerce to real booleans
    assert isinstance(card["recibo"], bool)
    # numeric lot cells read back as clean strings, not '14.0'
    assert card["lote"] == "14"
    bank = t["bank_statement"][0]
    assert bank["abono"] == 900.0 and bank["cargo"] is None
    assert t["daily_totals"][0]["fecha"] == dt.date(2025, 1, 1)


@needs_workbook
def test_shipped_workbook_audit_v1_widened():
    rows = extract_tables(WORKBOOK)["audit_log"]
    first = rows[0]
    assert set(first) == {
        "ts", "folio", "accion", "detalle",
        "valores_anteriores", "valores_nuevos", "run_id",
    }
    assert first["accion"] == "ACTUALIZACIÓN"
    assert isinstance(first["ts"], dt.datetime)
    assert first["run_id"] is None


@needs_workbook
def test_stage_workbook_lands_typed_parquet(spark, tmp_path):
    paths = stage_workbook(spark, WORKBOOK, str(tmp_path))
    assert set(paths) == {
        "transfers", "cards", "bank_statement", "daily_totals", "audit_log",
    }
    transfers = spark.read.parquet(paths["transfers"])
    assert transfers.count() == 129
    assert dict(transfers.dtypes)["fecha"] == "date"
    assert dict(transfers.dtypes)["conciliado"] == "boolean"
    audit = spark.read.parquet(paths["audit_log"])
    assert audit.count() == 48
    assert [f.name for f in audit.schema.fields] == [
        "ts", "folio", "accion", "detalle",
        "valores_anteriores", "valores_nuevos", "run_id",
    ]
    # staged daily_totals reproduces the totales sheet's per-day pairing
    totals = spark.read.parquet(paths["daily_totals"])
    assert totals.count() == 396


# ---------------------------------------------------------------------------
# writer ↔ reader roundtrip
# ---------------------------------------------------------------------------

def test_roundtrip_typed_cells(tmp_path):
    p = str(tmp_path / "rt.xlsx")
    rows = [
        ["s", "n", "d", "ts", "b", "neg"],
        ['a<&>" b ', 12.5, dt.date(2024, 2, 29),
         dt.datetime(2024, 1, 2, 3, 4, 5), True, -3],
        [" leading and trailing  ", 0, dt.date(1999, 12, 31),
         dt.datetime(2025, 11, 16, 1, 0, 0), False, -0.25],
        [None, None, None, None, None, None],
        ["last", 1, dt.date(2026, 1, 1), dt.datetime(2026, 1, 1), True, 7],
    ]
    write_workbook(p, {"Sheet One": rows, "Other": [["x"], [42]]})
    book = read_workbook(p)
    assert book["Sheet One"] == rows
    assert book["Other"] == [["x"], [42]]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(
                st.none(),
                st.booleans(),
                st.integers(min_value=-10**12, max_value=10**12),
                st.floats(allow_nan=False, allow_infinity=False, width=32),
                # XML 1.0 cannot carry C0 controls and parsers
                # normalize \r — printable-only strings roundtrip
                # exactly. Lone surrogates (category Cs) are not
                # Unicode scalar values: the writer STRIPS them (see
                # test_lone_surrogate_stripped), so they can't roundtrip.
                st.text(
                    alphabet=st.characters(
                        min_codepoint=0x20, exclude_categories=("Cs",)
                    ),
                    max_size=40,
                ),
                st.dates(min_value=dt.date(1901, 1, 1), max_value=dt.date(2200, 1, 1)),
            ),
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=8,
    )
)
def test_roundtrip_property(tmp_path_factory, rows):
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    # the reader trims trailing all-empty rows by contract
    while rows and not any(v is not None and v != "" for v in rows[-1]):
        rows.pop()
    p = str(tmp_path_factory.mktemp("xlsx") / "prop.xlsx")
    write_workbook(p, {"s": rows})
    back = read_workbook(p)["s"]
    assert len(back) == len(rows)
    for got, want in zip(back, rows):
        for g, w in zip(got, want):
            if isinstance(w, float):
                assert g == pytest.approx(w, rel=0, abs=0) or g == w
            else:
                assert g == w


def test_lone_surrogate_stripped(tmp_path):
    """A lone UTF-16 surrogate is not a Unicode scalar value — neither
    UTF-8 (the zip payload) nor XML 1.0 can carry it. The writer must
    strip it like the other XML-illegal characters, not crash while
    the archive is half-written."""
    p = str(tmp_path / "surrogate.xlsx")
    write_workbook(p, {"s": [["a\ud800b", "\ud800"], ["ok", 1]]})
    back = read_workbook(p)["s"]
    assert back == [["ab", ""], ["ok", 1]]


def test_serial_datetime_inverse():
    base = dt.datetime(2025, 11, 16, 1, 0, 0)
    serial = (base - dt.datetime(1899, 12, 30)).total_seconds() / 86400
    assert serial_to_datetime(serial) == base


# ---------------------------------------------------------------------------
# coercions + migration units
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "value,expected",
    [
        (True, True), (False, False), ("TRUE", True), ("true", True),
        ("SI", True), ("sí", True), (1, True), (1.0, True),
        (0, False), ("FALSE", False), ("no", False), ("", False), (None, False),
        (2, False),
    ],
)
def test_checkbox_coercion_py(value, expected):
    assert coerce_checkbox_py(value) is expected


def test_widen_audit_v1_fixture():
    v1 = [
        {
            "ts": dt.datetime(2025, 11, 23, 22, 34, 28),
            "folio": "0-18758",
            "campo_modificado": "Banco",
            "valor_anterior": "",
            "valor_nuevo": "SCOTIABANK",
        }
    ]
    (row,) = widen_audit_v1(v1)
    assert row == {
        "ts": dt.datetime(2025, 11, 23, 22, 34, 28),
        "folio": "0-18758",
        "accion": "ACTUALIZACIÓN",
        "detalle": "Banco",
        "valores_anteriores": "",
        "valores_nuevos": "SCOTIABANK",
        "run_id": None,
    }


@needs_workbook
def test_shipped_workbook_totales_cache_is_stale():
    """The design fact behind xlsx2_totales_render (queries_workbook):
    the shipped workbook is UNRECALCULATED — every cached `totales!B`
    SUMIFS value is 0 (and C entirely empty) even though the
    transfers sheet holds 18 sale days of matching rows. Asserting
    engine output against that cache would assert nothing, so xlsx2
    asserts against the formula's defined semantics instead. If a
    future workbook ships recalculated, this fails and the render
    should then compare against the cache directly."""
    book = read_workbook(WORKBOOK)
    tot = book["totales"][1:]
    assert len(tot) == 396
    assert all(r[1] in (0, None) and r[2] is None for r in tot)
    days = {
        r["fecha"] for r in extract_tables(WORKBOOK)["transfers"] if r["fecha"]
    }
    assert len(days) == 18            # the data the cache ignores
    assert days <= {r[0] for r in tot}  # every sale day is on the spine


def test_workbook_oracles_empty_tables_degrade_to_rows_only(monkeypatch):
    """A workbook revision with a blank data sheet must downgrade the
    affected oracle to None (rows-only), not emit a zero-tuple
    `VALUES ` clause that breaks every oracle run (r8 review
    finding). Cards blank → xlsx3 None; all blank → both None."""
    from lavasmart_bank_sync_etl_spark import queries_workbook as qw

    full = extract_tables(WORKBOOK) if os.path.exists(WORKBOOK) else {
        "transfers": [{"fecha": dt.date(2025, 11, 16), "monto": 1.0}],
        "daily_totals": [{"fecha": dt.date(2025, 11, 16)}],
        "cards": [],
    }

    def fake(path, **kw):
        t = dict(full)
        t["cards"] = []
        return t

    monkeypatch.setattr(qw, "extract_tables", fake)
    monkeypatch.setattr(qw.os.path, "exists", lambda p: True)
    x2, x3 = qw._workbook_oracles()
    assert x3 is None
    assert x2 is not None and "VALUES )" not in x2

    monkeypatch.setattr(
        qw, "extract_tables",
        lambda path, **kw: {"transfers": [], "daily_totals": [], "cards": []},
    )
    assert qw._workbook_oracles() == (None, None)


def test_workbook_oracles_unreadable_workbook_degrades_to_rows_only(monkeypatch, tmp_path):
    """A workbook that EXISTS but cannot be parsed (truncated copy,
    bad zip) must degrade to (None, None) — not raise out of
    oracle_sql() and take every other healthy oracle down with it
    (r8 review finding)."""
    from lavasmart_bank_sync_etl_spark import queries_workbook as qw

    bad = tmp_path / "corrupt.xlsx"
    bad.write_bytes(b"PK\x03\x04 this is not a real zip")
    monkeypatch.setattr(qw, "WORKBOOK", str(bad))
    assert qw._workbook_oracles() == (None, None)


def test_workbook_oracle_spine_dedupes_repeated_dates(monkeypatch):
    """The engine dedups its spine (.distinct()); a workbook revision
    repeating a Fecha row must not double-count the oracle's
    LEFT JOIN + SUM (r8 review finding): the generated spine VALUES
    must carry each date once."""
    from lavasmart_bank_sync_etl_spark import queries_workbook as qw

    d = dt.date(2025, 11, 16)
    monkeypatch.setattr(qw.os.path, "exists", lambda p: True)
    monkeypatch.setattr(
        qw, "extract_tables",
        lambda path, **kw: {
            "transfers": [{"fecha": d, "monto": 100.0}],
            "daily_totals": [{"fecha": d}, {"fecha": d}],  # duplicated row
            "cards": [],
        },
    )
    x2, x3 = qw._workbook_oracles()
    assert x3 is None
    spine_clause = x2.split("spine(fecha)")[1].split("SELECT")[0]
    assert spine_clause.count(f"DATE '{d.isoformat()}'") == 1  # deduped
    import duckdb
    rows = duckdb.connect().execute(x2).fetchall()
    assert rows == [("2025-11-16", 100.0, None)]  # summed once


def test_missing_workbook_degrades_clearly(monkeypatch):
    """ADVICE r8: the workbook path is env-overridable
    (SPARK_GRAFT_REFERENCE_WORKBOOK) and an absent workbook must (a)
    resolve the lazy oracles to None (rows-only degradation) and (b)
    make the query bodies raise a clear error naming the knob — never
    a raw FileNotFoundError from deep inside staging."""
    from lavasmart_bank_sync_etl_spark import queries_workbook as qw

    monkeypatch.setattr(qw, "WORKBOOK", "/nonexistent/wb.xlsx")
    monkeypatch.setattr(qw, "_ORACLE_CACHE", None)
    assert qw._workbook_oracles() == (None, None)
    assert qw._oracle(0)() is None and qw._oracle(1)() is None
    with pytest.raises(FileNotFoundError, match="SPARK_GRAFT_REFERENCE_WORKBOOK"):
        qw._staged_workbook(None, "/tmp")
