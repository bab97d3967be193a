"""XLSX ingest/egress (SURVEY.md §1.3): the reference's only real data
lives in a spreadsheet workbook (`Hoja de conciliación de movimientos
bancarios.xlsx` — sheet-per-table, header row 1, data from row 2,
checkbox truthiness {true,'TRUE','SI',1}: Code.gs:1505, 716;
requerimientos.md:73). A user migrating off the reference lands that
workbook on day one, so the engine reads it natively — with the
standard library only (zipfile + ElementTree; xlsx IS zipped XML), no
optional dependency to gate.

Scale design: one workbook is a small-dimension-grade artifact — a
non-splittable zip whose sheets are bounded by the spreadsheet row
limit, never a 100 TB fact source. The right architecture is therefore
EXTRACT ONCE ON THE DRIVER → land typed parquet staging → everything
downstream is a distributed scan of that staging. ``stage_workbook``
is that boundary; nothing else in the engine touches xlsx bytes.
Many-workbook corpora parallelize by file (one driver-side parse per
workbook fanned out over a file list), not by splitting a workbook.

The writer exists for the egress/roundtrip contract (reports back to
spreadsheet users) and writes inline strings + typed cells with the
two date styles — deliberately minimal, enough that this module's
reader and any mainstream spreadsheet app can read its output.
"""

from __future__ import annotations

import datetime as dt
import re
import zipfile
import xml.etree.ElementTree as ET
from collections.abc import Iterable, Sequence
from xml.sax.saxutils import escape

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)

#: Excel 1900-system epoch (serial 1 = 1899-12-31, with the phantom
#: 1900-02-29 at serial 60 — dates ≥ 1900-03-01 use this offset, and
#: every date this engine meets is modern).
_EPOCH = dt.datetime(1899, 12, 30)

#: built-in numFmtIds that render as dates/times (ECMA-376 §18.8.30):
#: 14-17 date-only, 18-22 carry a time component, 45-47 durations
_BUILTIN_DATE_ONLY = frozenset(range(14, 18))
_BUILTIN_DATETIME = frozenset(range(18, 23)) | frozenset(range(45, 48))

#: XML 1.0 cannot represent C0 controls (other than \t \n \r) at all —
#: not even as character references; the writer strips them (lossy,
#: like mainstream writers which raise instead)
# C0 controls are illegal in XML 1.0; lone UTF-16 surrogates
# (U+D800-DFFF) are not Unicode scalar values at all — neither UTF-8
# (the zip payload encoding) nor Arrow/parquet can represent them, so
# the writer strips both rather than crash mid-archive.
_XML_ILLEGAL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff]")

_TRUTHY_CHECKBOX = {"TRUE", "SI", "SÍ", "1"}


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------

def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 (cell ref like 'BC12')."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _is_date_format(code: str) -> bool:
    """Heuristic shared with mainstream readers: a format code is a
    date format iff it contains a day/month/year/hour/second token
    outside quoted literals, bracket sections, and backslash escapes."""
    bare = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)
    return bool(re.search(r"[dmyhsDMYHS]", bare))


def _has_time_tokens(code: str) -> bool:
    bare = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)
    return bool(re.search(r"[hsHS]", bare))


def _date_styles(z: zipfile.ZipFile) -> tuple[frozenset[int], frozenset[int]]:
    """(date-only, datetime) cellXfs index sets, classified by the
    style's number format: day/month/year tokens make it a date,
    hour/second tokens promote it to a datetime."""
    try:
        root = ET.fromstring(z.read("xl/styles.xml"))
    except KeyError:
        return frozenset(), frozenset()
    date_ids, dt_ids = set(_BUILTIN_DATE_ONLY), set(_BUILTIN_DATETIME)
    for nf in root.iter(f"{_MAIN_NS}numFmt"):
        code = nf.get("formatCode", "")
        if _is_date_format(code):
            target = dt_ids if _has_time_tokens(code) else date_ids
            target.add(int(nf.get("numFmtId", "-1")))
    cell_xfs = root.find(f"{_MAIN_NS}cellXfs")
    if cell_xfs is None:
        return frozenset(), frozenset()
    xf_fmt = [
        int(xf.get("numFmtId", "0"))
        for xf in cell_xfs.findall(f"{_MAIN_NS}xf")
    ]
    return (
        frozenset(i for i, f in enumerate(xf_fmt) if f in date_ids),
        frozenset(i for i, f in enumerate(xf_fmt) if f in dt_ids),
    )


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [
        "".join(t.text or "" for t in si.iter(f"{_MAIN_NS}t"))
        for si in root.findall(f"{_MAIN_NS}si")
    ]


def serial_to_datetime(serial: float) -> dt.datetime:
    """Excel 1900-system serial → datetime (sub-second rounded off:
    serial fractions carry float noise well below the second)."""
    return _EPOCH + dt.timedelta(seconds=round(serial * 86400))


def _cell_value(
    cell: ET.Element,
    shared: list[str],
    date_styles: frozenset[int],
    datetime_styles: frozenset[int],
) -> object:
    t = cell.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in cell.iter(f"{_MAIN_NS}t"))
    v = cell.find(f"{_MAIN_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text.strip() in ("1", "true")
    if t == "str":  # formula with a cached string result
        return v.text
    if t == "e":  # formula error — no usable value
        return None
    style = int(cell.get("s", "0"))
    num = float(v.text)
    # the STYLE decides date vs datetime (a midnight datetime stays a
    # datetime; a date-styled cell truncates any stray time fraction)
    if style in datetime_styles:
        return serial_to_datetime(num)
    if style in date_styles:
        return serial_to_datetime(num).date()
    # integral literal → int (openpyxl's contextual typing): keys and
    # counts survive a write→read roundtrip as the type they went in
    text = v.text.strip()
    if not re.search(r"[.eE]", text):
        return int(text)
    return num


def read_workbook(path: str) -> dict[str, list[list[object]]]:
    """Parse every sheet of an xlsx into ``{sheet_name: rows}`` where
    each row is a list of typed Python values (None for blank cells),
    padded to the sheet's widest row. Formula cells yield their cached
    value; date-styled numbers become date/datetime. Fully empty
    trailing rows are dropped, interior ones kept (row positions up to
    the last non-empty row are meaningful in the reference layout)."""
    out: dict[str, list[list[object]]] = {}
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        date_styles, datetime_styles = _date_styles(z)
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target_by_rid = {
            rel.get("Id"): rel.get("Target", "").lstrip("/")
            for rel in rels
        }
        for sheet in wb.iter(f"{_MAIN_NS}sheet"):
            name = sheet.get("name", "")
            target = target_by_rid.get(sheet.get(_REL_ATTR, ""), "")
            member = target if target.startswith("xl/") else f"xl/{target}"
            root = ET.fromstring(z.read(member))
            rows: list[list[object]] = []
            for row_el in root.iter(f"{_MAIN_NS}row"):
                r_idx = int(row_el.get("r", len(rows) + 1)) - 1
                while len(rows) <= r_idx:
                    rows.append([])
                row: list[object] = rows[r_idx]
                for cell in row_el.findall(f"{_MAIN_NS}c"):
                    c_idx = _col_index(cell.get("r", ""))
                    while len(row) <= c_idx:
                        row.append(None)
                    row[c_idx] = _cell_value(
                        cell, shared, date_styles, datetime_styles
                    )
            while rows and not any(v is not None and v != "" for v in rows[-1]):
                rows.pop()
            width = max((len(r) for r in rows), default=0)
            out[name] = [r + [None] * (width - len(r)) for r in rows]
    return out


# ---------------------------------------------------------------------------
# writing (egress / roundtrip)
# ---------------------------------------------------------------------------

_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    '<fonts count="1"><font/></fonts>'
    '<fills count="1"><fill/></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    # xf 0: general, xf 1: builtin date (14), xf 2: builtin datetime (22)
    '<cellXfs count="3"><xf numFmtId="0"/>'
    '<xf numFmtId="14" applyNumberFormat="1"/>'
    '<xf numFmtId="22" applyNumberFormat="1"/></cellXfs>'
    "</styleSheet>"
)


def _col_ref(idx: int) -> str:
    ref = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        ref = chr(65 + rem) + ref
    return ref


def _cell_xml(ref: str, v: object) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, dt.datetime):
        serial = (v - _EPOCH).total_seconds() / 86400
        return f'<c r="{ref}" s="2"><v>{serial!r}</v></c>'
    if isinstance(v, dt.date):
        serial = (dt.datetime.combine(v, dt.time()) - _EPOCH).days
        return f'<c r="{ref}" s="1"><v>{serial}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    text = escape(_XML_ILLEGAL.sub("", str(v)))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_workbook(
    path: str, sheets: dict[str, Iterable[Sequence[object]]]
) -> None:
    """Minimal xlsx writer: inline strings (no shared-string table),
    typed bool/number cells, date/datetime via the two built-in
    styles. Output reads back bit-equal through ``read_workbook``."""
    sheet_xml: list[str] = []
    for rows in sheets.values():
        body: list[str] = []
        for r, row in enumerate(rows, start=1):
            cells = "".join(
                _cell_xml(f"{_col_ref(c)}{r}", v) for c, v in enumerate(row)
            )
            body.append(f'<row r="{r}">{cells}</row>')
        sheet_xml.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(body)}</sheetData></worksheet>"
        )

    names = list(sheets)
    sheets_el = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheets_el}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/'
        '2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>'
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        f"{overrides}</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _STYLES_XML)
        for i, xml in enumerate(sheet_xml):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)


# ---------------------------------------------------------------------------
# typed coercion + reference-workbook staging
# ---------------------------------------------------------------------------

def coerce_checkbox_py(v: object) -> bool:
    """Driver-side twin of functions.parsing.coerce_checkbox (F8):
    true iff value ∈ {true,'TRUE','SI','SÍ',1} case-insensitively
    (Code.gs:1505 plus the xlsx-observed 'SI'/1 variants)."""
    if v is True:
        return True
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float)):
        return v == 1
    return str(v).strip().upper() in _TRUTHY_CHECKBOX if v is not None else False


def _as_str(v: object) -> str | None:
    """String coercion preserving spreadsheet identity: integral floats
    print without the '.0' a numeric cell would otherwise leak into a
    folio/lot key."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v).strip()


def _as_date(v: object) -> dt.date | None:
    if isinstance(v, dt.datetime):
        return v.date()
    if isinstance(v, dt.date):
        return v
    if isinstance(v, (int, float)):
        return serial_to_datetime(float(v)).date()
    if isinstance(v, str) and v.strip():
        m = re.fullmatch(r"(\d{1,2})/(\d{1,2})/(\d{4})", v.strip())
        if m:
            day, month, year = map(int, m.groups())
            try:
                return dt.date(year, month, day)
            except ValueError:
                return None
    return None


def _as_ts(v: object) -> dt.datetime | None:
    if isinstance(v, dt.datetime):
        return v
    if isinstance(v, dt.date):
        return dt.datetime.combine(v, dt.time())
    if isinstance(v, (int, float)):
        return serial_to_datetime(float(v))
    return None


def _as_double(v: object) -> float | None:
    if v is None or isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    s = re.sub(r'[$",\s]', "", str(v))
    try:
        return float(s)
    except ValueError:
        return None


_COERCE = {
    "str": _as_str,
    "date": _as_date,
    "ts": _as_ts,
    "double": _as_double,
    "bool": coerce_checkbox_py,
}

#: shipped-workbook sheet → (staged table, [(column, coercion), …]) in
#: sheet column order (SURVEY §1.3; headers verified against the xlsx).
REFERENCE_SHEETS: dict[str, tuple[str, list[tuple[str, str]]]] = {
    "Conciliacion_Transferencias": (
        "transfers",
        [("fecha", "date"), ("folio", "str"), ("cliente", "str"),
         ("servicio", "str"), ("banco", "str"), ("monto", "double"),
         ("conciliado", "bool"), ("concepto_banco", "str"),
         ("observaciones", "str")],
    ),
    "Conciliacion_Tarjetas": (
        "cards",
        [("fecha", "date"), ("folio", "str"), ("cliente", "str"),
         ("servicio", "str"), ("monto", "double"), ("recibo", "bool"),
         ("afiliacion", "str"), ("lote", "str"), ("observaciones", "str")],
    ),
    "Banco": (
        "bank_statement",
        [("dia", "date"), ("concepto", "str"), ("cargo", "double"),
         ("abono", "double"), ("saldo", "double"), ("folio", "str")],
    ),
    "totales": (
        "daily_totals",
        [("fecha", "date"), ("transferencia", "double"), ("banco", "double")],
    ),
    # older 5-col audit-log v1 variant — widened by widen_audit_v1
    "📝 Bitácora_Cambios": (
        "audit_log_v1",
        [("ts", "ts"), ("folio", "str"), ("campo_modificado", "str"),
         ("valor_anterior", "str"), ("valor_nuevo", "str")],
    ),
}

#: canonical audit columns (schemas.AUDIT_LOG order)
_AUDIT_V2_COLS = (
    "ts", "folio", "accion", "detalle",
    "valores_anteriores", "valores_nuevos", "run_id",
)


def widen_audit_v1(rows: list[dict]) -> list[dict]:
    """Legacy audit migration (S9's sibling): the xlsx ships the older
    5-col ``Bitácora_Cambios`` (Timestamp, Folio, Campo Modificado,
    Valor Anterior, Valor Nuevo — SURVEY §1.3 note). A v1 row records
    one field-level update, so it widens to the 6-col v2 shape as an
    ACTUALIZACIÓN whose ``detalle`` names the modified field; run_id
    is null (pre-engine history has no idempotence stamp)."""
    return [
        {
            "ts": r.get("ts"),
            "folio": r.get("folio"),
            "accion": "ACTUALIZACIÓN",
            "detalle": r.get("campo_modificado"),
            "valores_anteriores": r.get("valor_anterior"),
            "valores_nuevos": r.get("valor_nuevo"),
            "run_id": None,
        }
        for r in rows
    ]


def extract_tables(path: str) -> dict[str, list[dict]]:
    """Shipped-workbook extraction: header-row-1 sheets → typed row
    dicts per REFERENCE_SHEETS, blank rows dropped, the v1 audit sheet
    widened to the canonical audit schema. Pure driver-side Python —
    see the module docstring for why that is the right scale boundary."""
    book = read_workbook(path)
    out: dict[str, list[dict]] = {}
    for sheet, (table, cols) in REFERENCE_SHEETS.items():
        rows = book.get(sheet, [])
        data = []
        for raw in rows[1:]:  # header row 1, data from row 2
            if not any(v is not None and v != "" for v in raw):
                continue
            rec = {
                name: _COERCE[kind](raw[i]) if i < len(raw) else None
                for i, (name, kind) in enumerate(cols)
            }
            data.append(rec)
        out[table] = data
    out["audit_log"] = widen_audit_v1(out.pop("audit_log_v1"))
    return out


def stage_workbook(spark, path: str, out_dir: str) -> dict[str, str]:
    """Extract the reference workbook and land each table as typed
    parquet staging under ``out_dir`` — the xlsx→distributed boundary.
    Returns ``{table: parquet_path}``."""
    import os

    from pyspark.sql import types as T

    from ..schemas import AUDIT_LOG, CARDS, TRANSFERS

    schemas = {
        "transfers": TRANSFERS,
        "cards": CARDS,
        "audit_log": AUDIT_LOG,
        "bank_statement": T.StructType([
            T.StructField("dia", T.DateType()),
            T.StructField("concepto", T.StringType()),
            T.StructField("cargo", T.DoubleType()),
            T.StructField("abono", T.DoubleType()),
            T.StructField("saldo", T.DoubleType()),
            T.StructField("folio", T.StringType()),
        ]),
        "daily_totals": T.StructType([
            T.StructField("fecha", T.DateType()),
            T.StructField("transferencia", T.DoubleType()),
            T.StructField("banco", T.DoubleType()),
        ]),
    }
    paths: dict[str, str] = {}
    for table, rows in extract_tables(path).items():
        schema = schemas[table]
        df = spark.createDataFrame(
            [tuple(r.get(f.name) for f in schema.fields) for r in rows],
            schema,
        )
        dest = os.path.join(out_dir, table)
        df.write.mode("overwrite").parquet(dest)
        paths[table] = dest
    return paths
