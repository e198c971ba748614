"""Relational query library over the TPC-H-ish test tables.

The reference has no joins, windows, or aggregations beyond one keyed
dedup (SURVEY.md §2 "absent categories") — this module supplies the
full relational surface the engine must offer, expressed with the
declarative DataFrame API so Catalyst handles pushdown, pruning, join
strategy, and AQE does runtime re-planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import mavg, msum, sql_mavg, sql_msum
from ..registry import register
from ..sources import load_table


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1 pricing summary — scan → filter → groupBy → 8 aggs.
# Shape notes for 100 TB: the shipdate filter and 7-column projection push
# into the parquet scan; partial (map-side) aggregation shrinks the shuffle
# to |groups| x partitions rows; only 4 tiny groups survive.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_msum("l_quantity", "sum_qty")},
      {sql_msum("l_extendedprice", "sum_base_price")},
      {sql_msum("l_extendedprice*(1-l_discount)", "sum_disc_price")},
      {sql_msum("l_extendedprice*(1-l_discount)*(1+l_tax)", "sum_charge")},
      {sql_mavg("l_quantity", "avg_qty")},
      {sql_mavg("l_extendedprice", "avg_price")},
      {sql_mavg("l_discount", "avg_disc")},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            msum("l_quantity", "sum_qty"),
            msum("l_extendedprice", "sum_base_price"),
            msum(disc_price, "sum_disc_price"),
            msum(charge, "sum_charge"),
            mavg("l_quantity", "avg_qty"),
            mavg("l_extendedprice", "avg_price"),
            mavg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
