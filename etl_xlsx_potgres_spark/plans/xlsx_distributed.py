"""Distributed multi-workbook ingestion under driver attestation.

``xlsx_roundtrip_ingest`` attests ONE workbook through the
driver-side reader (the reference's shape,
``/root/reference/importador.py:47``). This query attests the
*landing-directory* shape instead: 6 deterministic workbooks are
provisioned once, scanned through the ``xlsx`` Python Data Source
(``sources/xlsx_datasource.py`` — one executor task per file, Arrow
batches, schema inferred from typed OOXML cells), and aggregated with
the exact-decimal policy. The DuckDB oracle re-derives the same
aggregate from the generating formula, so a file dropped by the glob,
a sheet parsed with wrong types, or a batch boundary that loses rows
all flip counts and sums.

Scale posture: the scan parallelism is ``n_files`` (an xlsx zip is
not splittable), which is exactly the property that makes a 10k-file
intake a 10k-task scan instead of a driver loop; the aggregate on top
is an ordinary partial-agg shuffle on the 4-value category key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import msum, sql_msum
from ..registry import register

N_FILES = 6
ROWS_PER_FILE = 200
_ROOT = "/tmp/spark_graft_xlsxds"
_VERSION = "v1"  # bump when the fixture formula changes


def _provision() -> str:
    """Write the deterministic workbook set once (content is a pure
    function of (f, i), so an existing provision is always valid)."""
    from ..sources.xlsx_stdlib import write_xlsx

    out = os.path.join(_ROOT, _VERSION)
    marker = os.path.join(out, "_SUCCESS")
    token = f"{N_FILES}x{ROWS_PER_FILE}"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == token:
                return out
    os.makedirs(out, exist_ok=True)
    for f in range(N_FILES):
        rows = [
            [
                f * ROWS_PER_FILE + i,
                f"c{(f + i) % 4}",
                (i * 13 + f) % 100,
                i + 0.25 + f * 0.5,
            ]
            for i in range(ROWS_PER_FILE)
        ]
        write_xlsx(
            os.path.join(out, f"ledger_{f}.xlsx"),
            ["id", "cat", "qty", "price"],
            rows,
        )
    with open(marker, "w") as fh:
        fh.write(token)
    return out


@register(
    "xlsx_datasource_ingest",
    oracle=f"""
    SELECT 'c' || CAST((f + i) % 4 AS VARCHAR) AS cat,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM((i * 13 + f) % 100) AS BIGINT) AS qty_sum,
           {sql_msum("i + 0.25 + f * 0.5", "price_sum")}
    FROM generate_series(0, {N_FILES - 1}) t(f),
         generate_series(0, {ROWS_PER_FILE - 1}) s(i)
    GROUP BY cat
    """,
)
def xlsx_datasource_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.xlsx_datasource import register_xlsx_source

    register_xlsx_source(spark)
    scan = spark.read.format("xlsx").load(_provision())
    return scan.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("qty").cast("long").alias("qty_sum"),
        msum(F.col("price"), "price_sum"),
    )
