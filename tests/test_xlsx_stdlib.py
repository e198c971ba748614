"""Pure-stdlib xlsx path: writer->reader roundtrip, shared-string and
date-style decoding, and the full xlsx -> Spark -> parquet edge
pipeline with no openpyxl in the environment."""

from __future__ import annotations

import datetime as dt
import sys
import zipfile

import pytest

sys.path.insert(0, "/root/repo")

from etl_xlsx_potgres_spark.sources import excel, xlsx_stdlib  # noqa: E402


def test_roundtrip_types(tmp_path):
    p = str(tmp_path / "t.xlsx")
    headers = ["Nome/Razão Social", "CPF/CNPJ", "Plano Valor", "Ativo", "Data Nasc."]
    rows = [
        ["Cliente & <1>", "123456789-01", 99.9, True, dt.datetime(1980, 1, 2)],
        ["Cliente 2", None, 50, False, dt.datetime(2020, 6, 15, 12, 0)],
    ]
    xlsx_stdlib.write_xlsx(p, headers, rows)
    got_headers, got_rows = xlsx_stdlib.read_rows(p)
    assert got_headers == headers
    assert got_rows[0][0] == "Cliente & <1>"          # xml-escape roundtrip
    assert got_rows[0][2] == 99.9
    assert got_rows[0][3] is True
    assert got_rows[0][4] == dt.datetime(1980, 1, 2)  # date style decoded
    assert got_rows[1][1] is None                     # blank cell gap
    assert got_rows[1][2] == 50 and isinstance(got_rows[1][2], int)
    assert got_rows[1][4] == dt.datetime(2020, 6, 15, 12, 0)
    assert xlsx_stdlib.sheet_names(p) == ["Plan1"]


def test_shared_strings_and_cell_gaps(tmp_path):
    """Hand-built workbook using the shared-string table (what real
    writers emit) plus sparse cell refs — both must decode."""
    p = str(tmp_path / "ss.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    shared = (
        f'<sst xmlns="{ns}" count="3" uniqueCount="3">'
        "<si><t>col_a</t></si><si><t>col_b</t></si>"
        "<si><r><t>rich</t></r><r><t xml:space=\"preserve\"> text</t></r></si></sst>"
    )
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row><c r="A2" t="s"><v>2</v></c></row>'
        '<row><c r="B3"><v>7.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    # reuse the writer's scaffolding parts, swap in sharedStrings + sheet
    xlsx_stdlib.write_xlsx(p, ["x"], [])
    import shutil

    tmp2 = str(tmp_path / "ss2.xlsx")
    with zipfile.ZipFile(p) as zin, zipfile.ZipFile(tmp2, "w") as zout:
        for item in zin.namelist():
            if item == "xl/worksheets/sheet1.xml":
                zout.writestr(item, sheet)
            else:
                zout.writestr(item, zin.read(item))
        zout.writestr("xl/sharedStrings.xml", shared)
    shutil.move(tmp2, p)

    headers, rows = xlsx_stdlib.read_rows(p)
    assert headers == ["col_a", "col_b"]
    assert rows[0] == ["rich text", None]   # rich-text runs concatenated
    assert rows[1] == [None, 7.5]           # A3 gap padded


def test_serial_date_epoch():
    # serial 1 = 1899-12-31; 60 would be the phantom 1900-02-29 which
    # the -30 epoch absorbs; 45000 = 2023-03-15
    assert xlsx_stdlib.serial_to_datetime(1) == dt.datetime(1899, 12, 31)
    assert xlsx_stdlib.serial_to_datetime(45000) == dt.datetime(2023, 3, 15)


def test_excel_source_end_to_end_without_openpyxl(spark, tmp_path):
    """The reference's whole intake path (importador.py): validate ->
    enumerate -> preview -> read -> convert to parquet, with no Excel
    library installed."""
    if excel._have_openpyxl():
        pytest.skip("openpyxl present; gated pandas path covers this")
    src = str(tmp_path / "clientes.xlsx")
    xlsx_stdlib.write_xlsx(
        src,
        ["Nome/Razão Social", "CPF/CNPJ", "Plano Valor"],
        [["Cliente 1", "123456789-01", 99.9], ["Cliente 2", "987654321-09", 49.9]],
    )
    landed = excel.validate_intake(src, str(tmp_path / "landing"))
    assert excel.sheet_names(landed) == ["Plan1"]
    prev = excel.preview(spark, landed, n=1)
    assert prev["Plan1"][0]["Nome/Razão Social"] == "Cliente 1"
    df = excel.read_workbook(spark, landed)
    assert df.count() == 2
    assert set(df.columns) == {"Nome/Razão Social", "CPF/CNPJ", "Plano Valor"}
    out = excel.convert_to_parquet(spark, landed, str(tmp_path / "pq"))
    assert spark.read.parquet(out).count() == 2


def test_unknown_sheet_raises(tmp_path):
    p = str(tmp_path / "t.xlsx")
    xlsx_stdlib.write_xlsx(p, ["a"], [[1]])
    with pytest.raises(KeyError, match="no sheet named"):
        xlsx_stdlib.read_rows(p, "Missing")
