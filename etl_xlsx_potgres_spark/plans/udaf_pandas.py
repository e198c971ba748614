"""Custom UDAF via Arrow grouped-map (``applyInPandas``): per-customer
OLS slope of order price over time — an aggregate Spark's builtin set
doesn't provide (regr_slope exists in SQL, but the point here is the
template for arbitrary Python UDAFs).

Determinism contract for Python aggregates: rows reach the Python
worker in arbitrary order, so the implementation must be
order-independent. Sums are computed over exact int64-scaled values
(never float accumulation), and the final slope is one float
expression over those exact moments — bit-identical to the oracle's
SQL formulation of the same moments."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_OUT_SCHEMA = "o_custkey long, n long, slope double"


def _ols_slope(pdf: pd.DataFrame) -> pd.DataFrame:
    # exact integer moments (order-independent); x = days, y = cents
    x = pdf["x"].astype("int64")
    y = pdf["y"].astype("int64")
    n = len(pdf)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    denom = n * sxx - sx * sx
    slope = float("nan") if denom == 0 else (n * sxy - sx * sy) / denom / 100.0
    return pd.DataFrame(
        {"o_custkey": [pdf["o_custkey"].iloc[0]], "n": [n], "slope": [slope]}
    )


@register(
    "udaf_price_trend_per_customer",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n,
           CASE WHEN COUNT(*)*SUM(x*x) - SUM(x)*SUM(x) = 0 THEN CAST('nan' AS DOUBLE)
                ELSE CAST(COUNT(*)*SUM(x*y) - SUM(x)*SUM(y) AS DOUBLE)
                     / (COUNT(*)*SUM(x*x) - SUM(x)*SUM(x)) / 100.0
           END AS slope
    FROM (
      SELECT o_custkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS x,
             CAST(FLOOR(o_totalprice*100) AS BIGINT) AS y
      FROM orders WHERE o_custkey < 200
    )
    GROUP BY o_custkey
    """,
)
def udaf_price_trend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cohort-scoped: Arrow grouped-map pays a per-group overhead, so a
    # tiny-group x huge-cardinality UDAF is the wrong tool past ~1e3
    # groups — use builtin aggregates or mapInPandas over co-grouped
    # partitions instead (documented trade-off, kept here as the
    # grouped-map template)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200).select(
        "o_custkey",
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("x"),
        # FLOOR, not cast: bigint cast truncates in Spark but rounds in
        # other engines — floor of identical doubles is portable
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    return o.groupBy("o_custkey").applyInPandas(_ols_slope, _OUT_SCHEMA)
