"""Column profiling — the data-quality pass a pipeline runs on intake
(null rates, exact cardinalities, value ranges per column). The
reference's closest analogue is its ad-hoc row counting
(``/root/reference/etl_process.py:216-224``); this is the generalized
per-column form a 100 TB intake needs before committing to a load.

Scale shape: ONE single-column aggregate per profiled column, unioned
— not one wide aggregate with N countDistinct (that plans as an
N-way Expand of the whole table, the blow-up removed from
``agg_approx_sketches`` in r7). Each branch's parquet scan prunes to
its own column (columnar read), the partial agg combines map-side,
and the N branches parallelize independently. Exact distincts here
are the small-N posture; the sketch-based profile at unbounded N is
``agg_approx_sketches``.

Values are surfaced as strings under explicit canonical formats
(decimal-cast numerics, yyyy-MM-dd dates) so the profile schema is
uniform across column types and engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def _s(c: Column) -> Column:
    return c.cast("string")


def _profile_one(df: DataFrame, col: str, fmt) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_nulls"),
        F.countDistinct(col).alias("n_distinct"),
        fmt(F.min(col)).alias("min_value"),
        fmt(F.max(col)).alias("max_value"),
    ).select(
        F.lit(col).alias("col_name"),
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
    )


_ORDERS_COLS = [
    # (name, spark formatter, duckdb formatter expression)
    ("o_orderkey", _s, "CAST({m} AS VARCHAR)"),
    ("o_custkey", _s, "CAST({m} AS VARCHAR)"),
    ("o_orderstatus", _s, "CAST({m} AS VARCHAR)"),
    (
        "o_totalprice",
        lambda c: _s(c.cast("decimal(18,2)")),
        "CAST(CAST({m} AS DECIMAL(18,2)) AS VARCHAR)",
    ),
    (
        "o_orderdate",
        lambda c: F.date_format(c, "yyyy-MM-dd"),
        "strftime({m}, '%Y-%m-%d')",
    ),
    ("o_orderpriority", _s, "CAST({m} AS VARCHAR)"),
]


def _orders_profile_oracle() -> str:
    parts = []
    for name, _, dfmt in _ORDERS_COLS:
        parts.append(
            f"""
    SELECT '{name}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
           {dfmt.format(m=f"MIN({name})")} AS min_value,
           {dfmt.format(m=f"MAX({name})")} AS max_value
    FROM orders"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register("quality_profile_orders", oracle=_orders_profile_oracle())
def quality_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = None
    for name, fmt, _ in _ORDERS_COLS:
        branch = _profile_one(o, name, fmt)
        out = branch if out is None else out.unionAll(branch)
    return out.orderBy("col_name")
