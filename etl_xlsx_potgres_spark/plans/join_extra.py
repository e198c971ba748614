"""Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM) — the
join semantics data pipelines need when the key itself can be NULL
(SCD2 surrogate keys mid-backfill, optional FK columns): plain ``=``
silently drops every NULL-keyed row (NULL = NULL is NULL), while the
null-safe comparator matches NULL to NULL.

Reference lifecycle note: the reference's FK resolution drops
NULL-keyed rows implicitly (``etl_process.py:40-75`` merges on the
key); the null-safe variant is the explicit opt-in that keeps them.

SCALE SHAPE — learned the hard way: the first version null-safe
joined the ROW-grain frames on a 6-value bucket key, which is a
near-cross-join (every NULL row pairs with every NULL row; sf0.1
measured 62 s for ~10^8 pairs, quadratic in SF). A low-cardinality
null-safe join must AGGREGATE EACH SIDE FIRST — the row-grain work
is two ordinary grouped aggregates (linear, skew-spread by partial
aggregation), and the null-safe comparator then joins two
|buckets|-row frames. That is also how the semantics are used in
practice (dimension-grain reconciliation). The NULL bucket carries
through both aggregates and matches exactly once — the attested
difference from a plain equi-join, which would drop it.
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
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(FLOOR(c_acctbal*10000) AS DECIMAL(38,0)))
                  AS DOUBLE)/10000 AS sum_bal
      FROM customer GROUP BY 1
    ),
    o AS (
      SELECT CASE WHEN o_custkey % 7 <> 0
                  THEN CAST(o_custkey % 5 AS INT) END AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(FLOOR(o_totalprice*10000) AS DECIMAL(38,0)))
                  AS DOUBLE)/10000 AS sum_price
      FROM orders GROUP BY 1
    )
    SELECT c.bucket, c.n_cust, c.sum_bal, o.n_orders, o.sum_price
    FROM c JOIN o ON c.bucket IS NOT DISTINCT FROM o.bucket
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    def msum(col):
        return (
            F.sum(F.floor(F.col(col) * 10000).cast("decimal(38,0)")).cast(
                "double"
            )
            / 10000
        )

    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(_bucket("c_custkey", 5).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            msum("c_acctbal").alias("sum_bal"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(_bucket("o_custkey", 5).alias("bucket_o"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            msum("o_totalprice").alias("sum_price"),
        )
    )
    return c.join(o, c.bucket.eqNullSafe(o.bucket_o)).select(
        "bucket", "n_cust", "sum_bal", "n_orders", "sum_price"
    )
