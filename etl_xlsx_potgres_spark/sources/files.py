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
