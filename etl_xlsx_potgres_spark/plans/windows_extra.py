"""Window distribution functions — percent_rank / cume_dist /
nth_value / dense_rank, the remaining ANSI window surface not covered
by the ``win_*`` pack (rank, lag/lead, frames, ntile, first/last are
in ``windows_aggs``). These are the normalization primitives feature
pipelines use for rank-based scaling (percent_rank is the ECDF
transform; cume_dist the inclusive variant).

Reference lifecycle note: no window surface exists in the reference
(row-at-a-time pandas, ``etl_process.py:1-235``); this completes the
ANSI window family alongside ``windows_aggs``.

Determinism: the window's ORDER BY is a TOTAL order
((o_totalprice, o_orderkey)), so every rank-family output is unique
and engine-independent; percent_rank/cume_dist are then exact ratios
of integers — bit-identical without rounding (both engines compute
(rank-1)/(n-1) and rank/n in doubles from the same exact integers).

Scale: one hash partition by priority + in-partition sort; no global
window, no single-partition funnel. Partition-count per key is the
orders-per-priority share — balanced by construction here, and a
skewed key would take the salted path documented in ``skew_*``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "win_distribution_pack",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           dense_rank() OVER w AS drank,
           nth_value(o_orderkey, 3) OVER
             (PARTITION BY o_orderpriority
              ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS third_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_distribution_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    # nth_value needs an explicit running frame to match the ANSI
    # default (value visible only once 3 rows have arrived)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
    )
