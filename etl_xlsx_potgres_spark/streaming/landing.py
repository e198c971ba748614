"""Continuous ingestion of a landing directory — the streaming twin
of the reference's upload-folder model (``importador.py`` copies each
workbook into a landing dir, then a batch job loads it; see
``sources/excel.validate_intake``).

Spark-first shape: a Structured Streaming *file source* watches the
directory; every new file becomes part of exactly one micro-batch,
the checkpoint records which files are done (exactly-once per file,
restart-safe), and ``Trigger.AvailableNow`` gives batch-style runs
over the same pipeline. At the edge the workbooks are converted to a
splittable format first (``excel.convert_to_parquet``) — the stream
then scales with file count, not with any single reader.

CSV rows that fail the declared schema are not dropped silently:
PERMISSIVE mode routes them to a corrupt-record column, and
``split_corrupt`` separates clean rows from quarantine rows — the
same validate-and-quarantine philosophy as the batch pipeline
(``operators/quality.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.files import CORRUPT_COL, _with_corrupt


def stream_landing_dir(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """File-source stream over a landing directory with a declared
    schema (file streams require one — no inference race on arrival).
    For csv, a corrupt-record column is appended for quarantine."""
    if fmt == "csv":
        # _with_corrupt is a no-op when the caller's schema already
        # declares the corrupt column (a blind append would raise a
        # duplicate-column AnalysisException).
        schema = _with_corrupt(schema)
        options.setdefault("header", "true")
        options.setdefault("mode", "PERMISSIVE")
        options.setdefault("columnNameOfCorruptRecord", CORRUPT_COL)
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.options(**options).load(landing_dir)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantine_rows) from a PERMISSIVE csv stream."""
    if CORRUPT_COL not in df.columns:
        return df, df.filter(F.lit(False))
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def ingest_available_now(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain everything currently in the landing dir into parquet and
    stop — batch-style semantics over the streaming pipeline, with the
    checkpoint guaranteeing each file is ingested exactly once across
    repeated runs."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
