"""Pure-stdlib xlsx reader/writer (zipfile + ElementTree).

xlsx is a zip of XML parts — nothing about reading it requires
openpyxl. This module parses the OOXML SpreadsheetML parts the
reference workbooks use (``/root/reference/importador.py:47`` reads
one sheet into a DataFrame):

- ``xl/workbook.xml`` + its rels: sheet names in workbook order and
  the worksheet part each name points at;
- ``xl/sharedStrings.xml``: the shared-string table (plain ``<t>``
  and rich-text ``<r><t>`` runs);
- ``xl/styles.xml``: cellXfs -> numFmtId, to recognize date-formatted
  numeric cells (builtin date format ids + custom formats containing
  date tokens);
- ``xl/worksheets/sheetN.xml``: rows/cells with ``t`` in
  {s, str, inlineStr, b, n/absent}, values typed to
  str/float/int/bool/datetime (Excel 1900 serial dates, including the
  1899-12-30 epoch offset that absorbs the Lotus leap-year bug).

The writer emits a minimal valid workbook (inline strings, one date
style) — used by the unit tests for openpyxl-free roundtrips and by
edge tooling that needs to produce small control workbooks.

Scale posture: xlsx stays a driver-side edge format — parse here,
cross into Spark with a declared schema, convert to parquet
immediately (``excel.convert_to_parquet``). This module removes the
library gate, not the single-reader nature of the container.
"""

from __future__ import annotations

import datetime as dt
import re
import xml.etree.ElementTree as ET
import zipfile

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_M = f"{{{_NS_MAIN}}}"

# Builtin numFmtIds Excel renders as dates/times (ECMA-376 §18.8.30).
_BUILTIN_DATE_FMT_IDS = frozenset(
    list(range(14, 23)) + list(range(27, 37)) + list(range(45, 48))
    + list(range(50, 59))
)
# Custom format heuristic: contains a date/time token outside quotes.
_DATE_TOKEN_RE = re.compile(r"[dmyhs]", re.IGNORECASE)

_EXCEL_EPOCH = dt.datetime(1899, 12, 30)


def _workbook_sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, worksheet_part_path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    target_by_id = {}
    for rel in rels.iter(f"{rel_ns}Relationship"):
        target = rel.get("Target", "")
        if target.startswith("/"):
            target = target.lstrip("/")
        elif not target.startswith("xl/"):
            target = "xl/" + target
        target_by_id[rel.get("Id")] = target
    out = []
    for sheet in wb.iter(f"{_M}sheet"):
        rid = sheet.get(_NS_REL_ATTR)
        out.append((sheet.get("name"), target_by_id[rid]))
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    strings = []
    for si in root.iter(f"{_M}si"):
        # plain <t> or rich-text <r><t> runs, concatenated
        strings.append("".join(t.text or "" for t in si.iter(f"{_M}t")))
    return strings


def _date_style_indices(zf: zipfile.ZipFile) -> frozenset[int]:
    """Indices into cellXfs whose number format renders as a date."""
    try:
        root = ET.fromstring(zf.read("xl/styles.xml"))
    except KeyError:
        return frozenset()
    custom_date_ids = set()
    for fmt in root.iter(f"{_M}numFmt"):
        code = re.sub(r'"[^"]*"', "", fmt.get("formatCode", ""))
        code = re.sub(r"\[[^\]]*\]", "", code)  # strip [$-409] / [Red]
        if _DATE_TOKEN_RE.search(code):
            custom_date_ids.add(int(fmt.get("numFmtId")))
    cell_xfs = root.find(f"{_M}cellXfs")
    if cell_xfs is None:
        return frozenset()
    date_idx = set()
    for i, xf in enumerate(cell_xfs.findall(f"{_M}xf")):
        fmt_id = int(xf.get("numFmtId", "0"))
        if fmt_id in _BUILTIN_DATE_FMT_IDS or fmt_id in custom_date_ids:
            date_idx.add(i)
    return frozenset(date_idx)


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'BC12' -> 54."""
    n = 0
    for ch in cell_ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def serial_to_datetime(serial: float) -> dt.datetime:
    """Excel 1900-system serial -> datetime (epoch 1899-12-30 absorbs
    Excel's inherited phantom 1900-02-29)."""
    return _EXCEL_EPOCH + dt.timedelta(days=serial)


def _cell_value(cell, shared: list[str], date_styles: frozenset[int]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_M}is")
        return "".join(tt.text or "" for tt in is_el.iter(f"{_M}t"))
    v = cell.find(f"{_M}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return shared[int(raw)]
    if t == "str":  # cached formula result, already a string
        return raw
    if t == "b":
        return raw == "1"
    if t == "e":
        return None  # error cell (#DIV/0! etc.)
    num = float(raw)
    if int(cell.get("s", "0")) in date_styles:
        return serial_to_datetime(num)
    return int(num) if num.is_integer() else num


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return [name for name, _ in _workbook_sheets(zf)]


def read_rows(
    path: str, sheet: str | int = 0
) -> tuple[list[str], list[list]]:
    """One sheet -> (headers, data_rows). Row 1 is the header (the
    reference's workbooks are header-first); data cells are typed
    str/int/float/bool/datetime/None, rows padded to header width."""
    with zipfile.ZipFile(path) as zf:
        sheets = _workbook_sheets(zf)
        if isinstance(sheet, int):
            name, part = sheets[sheet]
        else:
            match = [s for s in sheets if s[0] == sheet]
            if not match:
                raise KeyError(f"no sheet named {sheet!r} in {path}")
            name, part = match[0]
        shared = _shared_strings(zf)
        date_styles = _date_style_indices(zf)
        root = ET.fromstring(zf.read(part))
        raw_rows: list[list] = []
        for row in root.iter(f"{_M}row"):
            cells: list = []
            for cell in row.findall(f"{_M}c"):
                ref = cell.get("r")
                idx = _col_index(ref) if ref else len(cells)
                while len(cells) < idx:
                    cells.append(None)  # gaps = blank cells
                cells.append(_cell_value(cell, shared, date_styles))
            raw_rows.append(cells)
    if not raw_rows:
        return [], []
    headers = ["" if h is None else str(h) for h in raw_rows[0]]
    width = len(headers)
    data = [
        (r + [None] * (width - len(r)))[:width] for r in raw_rows[1:]
    ]
    return headers, data


def preview_rows(path: str, n: int = 5) -> dict[str, list[dict]]:
    """First n data rows of every sheet as header-keyed dicts."""
    out = {}
    for name in sheet_names(path):
        headers, rows = read_rows(path, name)
        out[name] = [dict(zip(headers, r)) for r in rows[:n]]
    return out


# ---------------------------------------------------------------- writer

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)
# style index 1 = builtin date format 14 (m/d/yyyy)
_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<styleSheet xmlns="{_NS_MAIN}">'
    '<fonts count="1"><font/></fonts>'
    '<fills count="1"><fill/></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs>'
    "</styleSheet>"
)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _cell_xml(value) -> str:
    if value is None:
        return "<c/>"
    if isinstance(value, bool):
        return f'<c t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (dt.datetime, dt.date)):
        if isinstance(value, dt.date) and not isinstance(value, dt.datetime):
            value = dt.datetime(value.year, value.month, value.day)
        serial = (value - _EXCEL_EPOCH).total_seconds() / 86400
        serial = int(serial) if float(serial).is_integer() else serial
        return f'<c s="1"><v>{serial}</v></c>'
    if isinstance(value, (int, float)):
        return f"<c><v>{value}</v></c>"
    return f'<c t="inlineStr"><is><t xml:space="preserve">{_xml_escape(str(value))}</t></is></c>'


def write_xlsx_stream(
    path: str, headers: list[str], row_batches,
    sheet_name: str = "Plan1",
) -> int:
    """Streaming workbook writer: ``row_batches`` is an iterable of
    row-lists; each batch is XML-encoded and flushed into the zip
    entry as it arrives, so peak memory is one batch, not the whole
    sheet (zipfile's ``open(name, "w")`` deflates incrementally).
    Returns the number of data rows written."""
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS_MAIN}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_xml_escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    n_rows = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", wb_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/styles.xml", _STYLES)
        with zf.open("xl/worksheets/sheet1.xml", "w") as sheet:
            sheet.write(
                (
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    f'<worksheet xmlns="{_NS_MAIN}"><sheetData>'
                    "<row>"
                    + "".join(_cell_xml(h) for h in headers)
                    + "</row>"
                ).encode()
            )
            for batch in row_batches:
                sheet.write(
                    "".join(
                        "<row>"
                        + "".join(_cell_xml(v) for v in row)
                        + "</row>"
                        for row in batch
                    ).encode()
                )
                n_rows += len(batch)
            sheet.write(b"</sheetData></worksheet>")
    return n_rows


def write_xlsx(
    path: str, headers: list[str], rows: list[list],
    sheet_name: str = "Plan1",
) -> str:
    """Minimal valid workbook: one sheet, inline strings, date cells
    styled with builtin format 14."""
    write_xlsx_stream(path, list(headers), [rows], sheet_name=sheet_name)
    return path
