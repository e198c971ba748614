"""Write-layout attestation for the training-shard export: the
oracle gate proves row-level fidelity of the write->read round trip;
these tests pin the LAYOUT claims the docstring makes — one task's
files per shard directory, the maxRecordsPerFile cap actually
bounding file row counts, and partition-column restore on read-back.
"""

from __future__ import annotations

import glob
import math
import os

import pyarrow.parquet as pq

from etl_xlsx_potgres_spark.plans.shard_export import (
    MAX_RECORDS_PER_FILE,
    N_SHARDS,
    export_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def test_shard_layout_and_file_cap(spark):
    out = export_shards(spark, SF_DIR)
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == N_SHARDS, "every shard present (uniform md5 mod)"
    for d in dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        rows = [pq.ParquetFile(f).metadata.num_rows for f in files]
        assert all(r <= MAX_RECORDS_PER_FILE for r in rows), (
            f"{d}: file exceeds maxRecordsPerFile cap: {rows}"
        )
        # repartition(shard) routed the shard to ONE task, so the
        # file count is exactly ceil(rows/cap) — no task fan-out
        assert len(files) == math.ceil(sum(rows) / MAX_RECORDS_PER_FILE), (
            f"{d}: {len(files)} files for {sum(rows)} rows — writer fan-out"
        )


def test_readback_restores_shard_partition_column(spark):
    out = export_shards(spark, SF_DIR)
    back = spark.read.parquet(out)
    assert "shard" in back.columns
    # partition pruning: a one-shard read scans only that directory
    one = back.filter("shard = 3")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan
    assert one.count() == back.filter("shard = 3").count()
