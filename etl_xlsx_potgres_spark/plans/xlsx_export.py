"""Distributed xlsx EXPORT under driver attestation — the write-side
twin of ``xlsx_datasource_ingest``.

The reference only ever reads workbooks (``importador.py:47``); a
production intake also has to hand curated slices BACK to
spreadsheet-speaking consumers. ``df.write.format("xlsx")`` routes
through the Python Data Source ArrowWriter
(``sources/xlsx_datasource.py::_XlsxWriter``): one workbook per
partition built executor-side from Arrow batches by the stdlib OOXML
layer, with a commit protocol (per-task commit messages -> driver
manifest; abort removes partial files).

The query round-trips: documents' (doc_id, lang, source) repartitioned
into ``N_FILES`` workbooks, overwritten each run (the writer IS the
operator under test), scanned back through the xlsx reader, and
aggregated. The DuckDB oracle computes the same aggregate straight
from the parquet table — a row lost at a partition boundary, a
mis-typed cell, a stale workbook surviving overwrite, or a file the
reader's glob misses all flip the counts/sums.

Scale posture: export parallelism is the partition count (one zip
container per task, the format's natural grain — same physics as the
scan side); the repartition is the one corpus shuffle, and each
task streams its Arrow batches into one workbook without a pandas
hop or a driver collect.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from ..sources.xlsx_datasource import register_xlsx_source

N_FILES = 4


@register(
    "xlsx_export_roundtrip",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY lang, source
    """,
)
def xlsx_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_xlsx_source(spark)
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(tempfile.gettempdir(), f"spark_graft_xlsx_export_{sf}")
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .repartition(N_FILES, "doc_id")
        .write.format("xlsx")
        .mode("overwrite")
        .save(out)
    )
    back = spark.read.format("xlsx").load(out)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )
