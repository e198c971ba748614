"""Declared-schema readers/writers for the interchange formats the
engine supports beyond parquet (CSV/JSON/ORC). Inference is opt-in
only — at scale an inference pass is a full extra scan, and drifting
types between files silently corrupt downstream logic (the reference's
double-inference problem, SURVEY.md §1.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    return spark.read.options(header=str(header).lower(), **options).schema(schema).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    return spark.read.options(**options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


# --- validate-and-quarantine variants -------------------------------
# PERMISSIVE parsing with a corrupt-record column and an explicit
# split into (clean, quarantine) frames — the same philosophy as the
# batch pipeline (operators/quality.py) and the landing-dir stream
# (streaming/landing.py). The split is a scan-level predicate, not a
# second pass.

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV where schema-violating rows carry the raw line in the
    corrupt-record column instead of failing the scan or being
    silently nulled; pair with :func:`split_corrupt`."""
    options.setdefault("mode", "PERMISSIVE")
    options.setdefault("columnNameOfCorruptRecord", CORRUPT_COL)
    return read_csv(spark, path, _with_corrupt(schema), header, **options)


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    """Line-delimited JSON with the corrupt-record channel (malformed
    lines and type-mismatched documents)."""
    options.setdefault("mode", "PERMISSIVE")
    options.setdefault("columnNameOfCorruptRecord", CORRUPT_COL)
    return read_json(spark, path, _with_corrupt(schema), **options)


def split_corrupt(
    df: DataFrame, persist: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_marker_column, quarantine_rows).

    Persists the parsed frame by default: Spark refuses queries that
    reference ONLY the internal corrupt-record column on a raw
    text source ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN]), and both branches consume the same parse anyway — one
    scan serves clean and quarantine instead of re-reading the raw
    text per branch. Pass ``persist=False`` when the caller manages
    materialization itself (e.g. foreachBatch writes both sides)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from ..caching import scoped_persist

    if CORRUPT_COL not in df.columns:
        return df, df.filter(F.lit(False))
    if persist:
        # scoped: released by caching.release_persisted() after the
        # caller's action (harness does this between queries)
        df = scoped_persist(df, StorageLevel.MEMORY_AND_DISK)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    target_partitions: int,
    mode: str = "overwrite",
) -> None:
    """Compaction/layout writer: range-partition on the sort key and
    sort within partitions, so downstream range predicates skip whole
    files via min/max stats. The small-files fix: target_partitions
    sized to ~128MB-1GB per output file at scale."""
    (
        df.repartitionByRange(target_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )
