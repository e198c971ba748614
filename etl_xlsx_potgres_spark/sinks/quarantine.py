"""Quarantine sink: rejected rows land in partitioned parquet with
their error reason and run id — the durable, queryable replacement for
the reference's in-memory reject lists printed to stdout
(``/root/reference/etl_process.py:81,129,178,227-235``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_quarantine(df: DataFrame, path: str, run_id: str, stage: str) -> None:
    """Append quarantine rows (must carry an ``erro`` column),
    partitioned by stage so audits prune by stage at the scan."""
    (
        df.withColumn("run_id", F.lit(run_id))
        .withColumn("stage", F.lit(stage))
        .write.mode("append")
        .partitionBy("stage")
        .parquet(path)
    )
