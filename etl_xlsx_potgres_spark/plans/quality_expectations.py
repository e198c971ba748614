"""Declarative data-quality expectation suite — the dbt-test /
Great-Expectations surface: a fixed battery of expectations
(uniqueness, not-null, referential integrity, accepted ranges,
accepted sets) evaluated in one pass each, emitting one row per
expectation with its violation count. This is the reference's
validate-and-quarantine idea (``etl_process.py`` drops rows pandas
failed to coerce) generalized into the audit report a pipeline
publishes per run.

Reference lifecycle note: the reference validates implicitly through
coercion (``etl_process.py:7-23``); the expectation suite makes every
rule explicit, countable, and cheap to extend.

Plan shape: scalar expectations over orders collapse into ONE
aggregate scan (each check is a conditional count in the same
projection); uniqueness is one groupBy; referential integrity is one
anti join. No per-rule scans — adding a scalar rule widens the
projection, never adds a pass. All counts are exact integers, so the
oracle is bit-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "quality_expectations_suite",
    oracle="""
    WITH scalar AS (
      SELECT
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS v_custkey_not_null,
        CAST(SUM(CASE WHEN o_totalprice <= 0 OR o_totalprice >= 1000000
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_price_range,
        CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_status_set,
        CAST(SUM(CASE WHEN o_orderdate IS NULL
                      OR o_orderdate > TIMESTAMP '2030-01-01'
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_date_sane
      FROM orders
    ),
    uniq AS (
      SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS v
      FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders
            GROUP BY o_orderkey HAVING COUNT(*) > 1)
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT 'orderkey_unique' AS expectation, uniq.v AS n_violations,
           uniq.v = 0 AS passed FROM uniq
    UNION ALL
    SELECT 'custkey_not_null', v_custkey_not_null,
           v_custkey_not_null = 0 FROM scalar
    UNION ALL
    SELECT 'price_in_range', v_price_range, v_price_range = 0 FROM scalar
    UNION ALL
    SELECT 'status_in_set', v_status_set, v_status_set = 0 FROM scalar
    UNION ALL
    SELECT 'orderdate_sane', v_date_sane, v_date_sane = 0 FROM scalar
    UNION ALL
    SELECT 'lineitem_fk_orders', fk.v, fk.v = 0 FROM fk
    """,
)
def quality_expectations_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def viol(cond, name):
        return F.sum(cond.cast("long")).cast("long").alias(name)

    scalar = o.agg(
        viol(F.col("o_custkey").isNull(), "v_custkey_not_null"),
        viol(
            (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") >= 1000000),
            "v_price_range",
        ),
        viol(~F.col("o_orderstatus").isin("F", "O", "P"), "v_status_set"),
        viol(
            F.col("o_orderdate").isNull()
            | (F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp")),
            "v_date_sane",
        ),
    )
    uniq = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
            .cast("long")
            .alias("v")
        )
    )
    fk = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey,
                "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )

    # one aggregate -> 4 expectation rows via stack (re-selecting the
    # aggregate per rule would re-scan orders once per rule)
    scalar_rows = scalar.selectExpr(
        """stack(4,
             'custkey_not_null', v_custkey_not_null,
             'price_in_range',  v_price_range,
             'status_in_set',   v_status_set,
             'orderdate_sane',  v_date_sane)
           AS (expectation, n_violations)"""
    )

    def row(name, frame, col):
        return frame.select(
            F.lit(name).alias("expectation"),
            F.col(col).alias("n_violations"),
        )

    return (
        row("orderkey_unique", uniq, "v")
        .unionAll(scalar_rows)
        .unionAll(row("lineitem_fk_orders", fk, "v"))
        .withColumn("passed", F.col("n_violations") == 0)
    )
