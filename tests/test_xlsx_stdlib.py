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


def test_reference_pipeline_from_actual_xlsx_file(spark, tmp_path):
    """The reference's full journey from a genuine .xlsx FILE: write
    the 1200-row FIXTURES.md A1 workbook clone as real OOXML, ingest
    it through excel.read_workbook, run the transform, and get the
    same observable outcomes as the DataFrame-boundary tests
    (1198 rows after keyed dedup, matching key set)."""
    import datetime

    from etl_xlsx_potgres_spark.pipelines import transform

    # rebuild the clone rows (the fixture is module-scoped to its file)
    n = 1200
    headers = [
        "Nome/Razão Social", "Nome Fantasia", "CPF/CNPJ", "Data Nasc.",
        "Data Cadastro cliente", "Celulares", "Telefones", "Emails",
        "Endereço", "Número", "Complemento", "Bairro", "CEP", "Cidade",
        "UF", "Plano", "Plano Valor", "Vencimento", "Status", "Isento",
    ]
    rows = []
    for i in range(n):
        rows.append([
            f"Cliente {i}", None, f"{i:09d}-{i % 97:02d}",
            datetime.datetime(1980, 1, 1) + datetime.timedelta(days=i * 7)
            if i % 3 else None,
            datetime.datetime(2020, 1, 1) + datetime.timedelta(days=i),
            5581000000000.0 + i if i % 9 else None,
            8133330000.0 + i if i % 2 else None,
            f"c{i}@example.com" if i % 11 else None,
            f"Rua {i}", str(i), None if i % 5 else "fundos", "Centro",
            f"50000-{i % 1000:03d}", "Recife",
            None if i % 100 == 7 else "Pernambuco",
            None if i % 200 == 3 else f"PLANO_{i % 16}",
            99.9 + (i % 16), [5, 10, 15, 20, 25][i % 5],
            "Velocidade Reduzida" if i % 10 else "Ativo",
            "Sim" if i % 300 == 0 else None,
        ])
    rows[500][2] = rows[100][2]
    rows[900][2] = rows[200][2]

    src = str(tmp_path / "clientes_1200.xlsx")
    xlsx_stdlib.write_xlsx(src, headers, rows)
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField(h, t)
            for h, t in zip(
                headers,
                [T.StringType(), T.StringType(), T.StringType(),
                 T.TimestampType(), T.TimestampType(), T.DoubleType(),
                 T.DoubleType(), T.StringType(), T.StringType(),
                 T.StringType(), T.StringType(), T.StringType(),
                 T.StringType(), T.StringType(), T.StringType(),
                 T.StringType(), T.DoubleType(), T.LongType(),
                 T.StringType(), T.StringType()],
            )
        ]
    )
    df = excel.read_workbook(spark, src, schema=schema)
    assert df.count() == 1200
    cleaned = transform(df)
    assert cleaned.count() == 1198  # keyed dedup, BASELINE.md outcome
    keys = {r["cpf_cnpj"] for r in cleaned.select("cpf_cnpj").collect()}
    assert len(keys) == 1198


def test_unknown_sheet_raises(tmp_path):
    p = str(tmp_path / "t.xlsx")
    xlsx_stdlib.write_xlsx(p, ["a"], [[1]])
    with pytest.raises(KeyError, match="no sheet named"):
        xlsx_stdlib.read_rows(p, "Missing")


# ------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# xml 1.0 forbids control chars; Excel strings are also surrogate-free
_CELL_TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), max_codepoint=0xFFFF
    ),
    max_size=40,
)
_CELL = st.one_of(
    st.none(),
    _CELL_TEXT,
    st.integers(-10**12, 10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.datetimes(
        min_value=dt.datetime(1900, 3, 1),
        max_value=dt.datetime(2200, 1, 1),
    ).map(lambda d: d.replace(microsecond=0)),
)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_xlsx_roundtrip_property(tmp_path_factory, data):
    n_cols = data.draw(st.integers(1, 6))
    n_rows = data.draw(st.integers(0, 5))
    headers = [f"c{i}" for i in range(n_cols)]
    rows = [
        [data.draw(_CELL) for _ in range(n_cols)] for _ in range(n_rows)
    ]
    p = str(tmp_path_factory.mktemp("xl") / "prop.xlsx")
    xlsx_stdlib.write_xlsx(p, headers, rows)
    got_headers, got_rows = xlsx_stdlib.read_rows(p)
    assert got_headers == headers
    assert len(got_rows) == n_rows
    for want_row, got_row in zip(rows, got_rows):
        for want, got in zip(want_row, got_row):
            if isinstance(want, bool) or want is None:
                assert got is want or got == want
            elif isinstance(want, float):
                # float32 values survive exactly through repr round-trip
                assert got == want
            elif isinstance(want, dt.datetime):
                assert abs((got - want).total_seconds()) < 1e-4
            elif isinstance(want, str) and want == "":
                assert got in ("", None)  # empty inline string
            else:
                assert got == want
