"""Sequential funnel analysis over the events stream: signup ->
first click strictly after signup -> first purchase strictly after
that click, per user. The product-analytics primitive (conversion
funnels) expressed as three chained min-aggregations — each step is
one aggregate + one join on user_id, no window over the full event
history and no per-user collect.

Determinism: timestamps compare exactly; every step is a MIN lattice,
so the funnel is engine- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "events_funnel_signup_purchase",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t0
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t1
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS users_signup,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS users_click_after,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS users_purchase_after
    """,
)
def events_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("users_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("users_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("users_purchase_after")))
    )
