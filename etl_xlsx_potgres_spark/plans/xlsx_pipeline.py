"""The workbook SOURCE under driver attestation: a deterministic
xlsx is written with the stdlib OOXML writer, read back through
``sources/excel.read_workbook`` (stdlib ElementTree parser in this
container; pandas/openpyxl when available), and every row is compared
against a ``generate_series`` oracle — covering SURVEY §2 rows 1/9
(Excel scan, pandas->Spark handoff) differentially, not just in
pytest.

The fixture exercises the parser's corners: XML-escaped characters in
inline strings (``&``/``<``), integer/float/date cells (dates go
through the 1900-epoch serial round-trip, style 14), and a NULL cell.

Scale note: one workbook is inherently single-reader — the scale path
is ``excel.convert_to_parquet`` at the landing edge (stream ingest
then scales with file count, see ``streaming/landing.py``); this
query attests the edge conversion's value fidelity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..registry import register

N_ROWS = 500


@register(
    "xlsx_roundtrip_ingest",
    oracle=f"""
    SELECT i AS k,
           CASE WHEN i % 25 = 0 THEN 'r&' || CAST(i AS VARCHAR) || '<x>'
                ELSE 'row ' || CAST(i AS VARCHAR) END AS name,
           CASE WHEN i % 11 = 0 THEN NULL ELSE (i * 7) % 1000 END AS amount,
           CAST(i AS DOUBLE) + 0.25 AS value,
           CAST(DATE '2021-01-01' + CAST(i % 60 AS INT) AS TIMESTAMP) AS "when"
    FROM generate_series(0, {N_ROWS - 1}) t(i)
    """,
)
def xlsx_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt
    import os
    import tempfile

    from ..sources import excel
    from ..sources.xlsx_stdlib import write_xlsx

    rows = []
    for i in range(N_ROWS):
        name = f"r&{i}<x>" if i % 25 == 0 else f"row {i}"
        amount = None if i % 11 == 0 else (i * 7) % 1000
        rows.append(
            [
                i,
                name,
                amount,
                i + 0.25,
                dt.datetime(2021, 1, 1) + dt.timedelta(days=i % 60),
            ]
        )
    work = tempfile.mkdtemp(prefix="spark_graft_xlsx_")
    path = os.path.join(work, "roundtrip.xlsx")
    write_xlsx(path, ["k", "name", "amount", "value", "when"], rows)

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("when", T.TimestampType()),
        ]
    )
    df = excel.read_workbook(spark, path, schema=schema)
    # the frame is materialized from pandas at createDataFrame time, so
    # the temp workbook is safe to drop
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return df
