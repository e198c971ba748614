"""Exactly-once streaming sink via ``foreachBatch``.

Structured Streaming guarantees at-least-once delivery of each
micro-batch to ``foreachBatch``; exactly-once therefore requires the
writer to be idempotent per ``batch_id``. The pattern here writes each
batch to a ``batch_id=<n>``-partitioned parquet directory with dynamic
partition overwrite: a replayed batch overwrites its own partition
instead of duplicating rows. The same recipe carries to JDBC
(DELETE WHERE batch_id = n; INSERT) or Delta (MERGE on batch_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_writer(path: str):
    """Returns a foreachBatch function with per-batch-id overwrite
    semantics — replaying a batch after a failure cannot duplicate."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write
