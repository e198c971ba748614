"""Versioned snapshots + as-of reads + snapshot diff — the lakehouse
time-travel pattern (Iceberg/Delta snapshots) in its simplest honest
form: each version is a COMPLETE snapshot under a ``version=N``
partition, an "as of" read is partition pruning on the version
column, and a snapshot diff is one equi-join of two pruned reads.
This is the operational complement of ``scd2_version_intervals``
(SCD2 models history IN the rows; snapshots model it in the LAYOUT —
at 100 TB the snapshot layout is what object stores and manifest
formats actually do, and old versions are pruned-away directories,
never scanned).

Reference lifecycle note: the reference overwrites its dimensions in
place per load (``etl_process.py:40-75``) — version history is
exactly what that design cannot answer; this operator is the repair.

The query provisions two deterministic versions of the customer
dimension (v2 = v1 with every 10th account re-balanced and a new
synthetic segment of 5 rows appended), reads each BACK through the
version-pruned path, and emits the per-change-type reconciliation.
The DuckDB oracle re-derives the same diff straight from the parquet
original — a pruning bug (reading both versions into one), a lost
append, or a partition-column restore bug all flip the counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_ROOT = "/tmp/spark_graft_snapshots"
N_NEW = 5  # synthetic appended rows in v2


def _provision(spark: SparkSession, sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_ROOT, f"customer_{sf}")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    v1 = c.withColumn("version", F.lit(1))
    updated = c.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")),
    )
    appended = spark.range(N_NEW).select(
        (F.col("id") + 90_000_000).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("SYNTH").alias("c_mktsegment"),
    )
    v2 = updated.unionByName(appended).withColumn("version", F.lit(2))
    (
        v1.unionByName(v2)
        .write.mode("overwrite")
        .partitionBy("version")
        .parquet(out)
    )
    return out


@register(
    "version_snapshot_diff",
    oracle=f"""
    WITH diff AS (
      SELECT CASE WHEN c_custkey % 10 = 0 THEN 'updated'
                  ELSE 'unchanged' END AS change_type,
             CASE WHEN c_custkey % 10 = 0
                  THEN (c_acctbal + 100.0) - c_acctbal
                  ELSE 0.0 END AS delta
      FROM customer
      UNION ALL
      SELECT 'added', 0.0 FROM generate_series(1, {N_NEW})
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(delta*10000) AS DECIMAL(38,0)))
                AS DOUBLE)/10000 AS sum_delta
    FROM diff
    GROUP BY change_type
    """,
)
def version_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: v2 left-joined to v1 on the key,
    classified added/updated/unchanged. IEEE note: the oracle's delta
    for updated rows is the same ``(x + 100.0) - x`` expression the
    engine evaluates — a literal ``100.0`` differs in the last ulp
    for most balances and would flip the floor grid."""
    path = _provision(spark, sf_dir)
    snaps = spark.read.parquet(path)
    # as-of reads: version is a partition column, so these filters are
    # directory pruning, not scans of the other snapshot
    # key-presence marker is a literal, never a value column: a v1
    # row whose c_acctbal happened to be NULL must still classify as
    # matched, not 'added' (value-as-key-proxy is the classic
    # left-join bug this query exists to exemplify)
    v1 = snaps.filter(F.col("version") == 1).select(
        "c_custkey",
        F.col("c_acctbal").alias("bal_v1"),
        F.lit(1).alias("in_v1"),
    )
    v2 = snaps.filter(F.col("version") == 2).select(
        "c_custkey", F.col("c_acctbal").alias("bal_v2")
    )
    joined = v2.join(v1, "c_custkey", "left")
    diff = joined.select(
        F.when(F.col("in_v1").isNull(), "added")
        .when(F.col("bal_v2") != F.col("bal_v1"), "updated")
        .otherwise("unchanged")
        .alias("change_type"),
        (F.col("bal_v2") - F.coalesce("bal_v1", F.col("bal_v2"))).alias(
            "delta"
        ),
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.floor(F.col("delta") * 10000).cast("decimal(38,0)"))
            .cast("double")
            / 10000
        ).alias("sum_delta"),
    )
