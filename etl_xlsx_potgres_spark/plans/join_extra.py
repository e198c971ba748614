"""Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM) — the
join semantics data pipelines need when the key itself can be NULL
(SCD2 surrogate keys mid-backfill, optional FK columns): plain ``=``
silently drops every NULL-keyed row (NULL = NULL is NULL), while the
null-safe comparator matches NULL to NULL exactly once per side.

Reference lifecycle note: the reference's FK resolution drops
NULL-keyed rows implicitly (``etl_process.py:40-75`` merges on the
key); the null-safe variant is the explicit opt-in that keeps them.

The probe derives a nullable bucket key on both sides (NULL for one
deterministic slice), joins with ``eqNullSafe``, and aggregates per
bucket — the NULL bucket's row count is the attested difference from
a plain equi-join. Spark plans ``<=>`` as a hash join on the
null-safe key (NULL hashes to one partition — a documented hot-key
hazard at scale if the NULL share is large; the mitigation is the
``skew_*`` salting pattern, noted here deliberately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def _bucket(col: str, mod: int):
    # NULL for the %7==0 slice, else a small bucket id
    c = F.col(col)
    return F.when(c % 7 != 0, (c % mod).cast("int"))


@register(
    "join_null_safe_eq",
    oracle="""
    WITH c AS (
      SELECT CASE WHEN c_custkey % 7 <> 0
                  THEN CAST(c_custkey % 5 AS INT) END AS bucket,
             c_acctbal
      FROM customer
    ),
    o AS (
      SELECT CASE WHEN o_custkey % 7 <> 0
                  THEN CAST(o_custkey % 5 AS INT) END AS bucket,
             o_totalprice
      FROM orders
    )
    SELECT c.bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(FLOOR(c.c_acctbal*10000) AS DECIMAL(38,0)))
                AS DOUBLE)/10000 AS sum_bal
    FROM c JOIN o ON c.bucket IS NOT DISTINCT FROM o.bucket
    GROUP BY c.bucket
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        _bucket("c_custkey", 5).alias("bucket"), "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders").select(
        _bucket("o_custkey", 5).alias("bucket_o"), "o_totalprice"
    )
    joined = c.join(o, c.bucket.eqNullSafe(o.bucket_o))
    return joined.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (
            F.sum(
                F.floor(F.col("c_acctbal") * 10000).cast("decimal(38,0)")
            ).cast("double")
            / 10000
        ).alias("sum_bal"),
    )
