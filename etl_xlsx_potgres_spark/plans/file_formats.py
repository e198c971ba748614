"""Columnar + semi-structured file-format connectors under driver
attestation: Spark 4's NATIVE XML source (``format("xml")``, merged
from spark-xml in 4.0) and the built-in ORC source, each exercised as
a write -> read-back roundtrip of REAL fixture data and differentially
checked against the parquet originals.

Why roundtrips: a connector bug (escaping, null handling, type
coercion, partition-column restore) corrupts VALUES while keeping
shapes plausible — only a value-level differential against an engine
that never saw the artifact (DuckDB over the parquet) catches it.
This follows the ``xlsx_roundtrip_ingest`` / ``mm_binaryfile_ingest``
precedent: deterministic artifact at a fixed per-SF path (idempotent
overwrite, no tmp-dir leak), oracle over the source-of-truth table.

Scale notes:
- XML is the landing-edge format (vendor feeds, sitemaps, Wikipedia
  dumps). The native source splits by FILE, so the 100 TB path is
  many files; ``rowTag`` streaming-parses each file without loading
  it whole. One file here is the fidelity probe, not the scale claim.
- ORC is a first-class columnar alternative to parquet (predicate
  pushdown, per-stripe stats, partitioned layout all apply). The
  roundtrip writes a PARTITIONED layout and the read-back restores
  the partition column from directory names — the exact mechanism
  partition pruning relies on at scale.

Reference lifecycle note: the reference ingests xlsx only
(``importador.py:7-28``); XML/ORC are north-star connector surface
for the Spark-native engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table

_ART_ROOT = "/tmp/spark_graft_formats"


def _artifact_dir(sf_dir: str, name: str) -> str:
    """Fixed, SF-keyed path: reruns overwrite instead of leaking, and
    concurrent sessions at different SFs never cross-read."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_ART_ROOT, f"{name}_{sf}")


# The probe columns exercise the XML writer/parser corners on top of
# the verbatim customer columns: `escape_probe` forces &/</> escaping
# through serialize->parse, `bal_probe` is NULL every 10th row (null =
# omitted element on write; the read schema must restore it).
@register(
    "xml_roundtrip_ingest",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           c_mktsegment || '&<x>"y"' AS escape_probe,
           CASE WHEN c_custkey % 10 = 0 THEN NULL
                ELSE c_acctbal END AS bal_probe
    FROM customer
    """,
)
def xml_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> XML (native writer) -> customer, row-for-row."""
    out = _artifact_dir(sf_dir, "xml_customer")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.concat(F.col("c_mktsegment"), F.lit('&<x>"y"')).alias(
            "escape_probe"
        ),
        F.when(F.col("c_custkey") % 10 != 0, F.col("c_acctbal")).alias(
            "bal_probe"
        ),
    )
    (
        c.coalesce(1)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "customers")
        .option("rowTag", "customer")
        .save(out)
    )
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("escape_probe", T.StringType()),
            T.StructField("bal_probe", T.DoubleType()),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "customer")
        .schema(schema)
        .load(out)
    )


# Partitioned ORC roundtrip: orders written partitioned by status,
# read back through partition-column restore, then aggregated with
# the exact-decimal sum policy. A wrong stripe decode, a dropped
# partition directory, or a mis-restored partition value all flip the
# counts/sums vs the parquet-side oracle.
@register(
    "orc_roundtrip_ingest",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_totalprice,
           MIN(o_orderkey) AS min_orderkey,
           MAX(o_orderkey) AS max_orderkey
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def orc_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _artifact_dir(sf_dir, "orc_orders")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    (
        o.write.mode("overwrite")
        .format("orc")
        .partitionBy("o_orderstatus")
        .save(out)
    )
    back = spark.read.format("orc").load(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(T.DecimalType(18, 2)))
        .cast("double")
        .alias("sum_totalprice"),
        F.min("o_orderkey").alias("min_orderkey"),
        F.max("o_orderkey").alias("max_orderkey"),
    )
