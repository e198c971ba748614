"""Last-touch marketing attribution — the standard event-analytics
join every product warehouse runs (GA/Amplitude semantics: each
conversion is credited to the user's most recent marketing touch
inside a lookback window, else 'direct').  Completes the events
family next to funnel conversion, cohort retention, sessionization,
and type transitions: those aggregate; attribution needs the
AS-OF-style "latest preceding event of another kind" lookup.

Semantics: for every ``purchase``, the latest preceding ``click`` or
``view`` by the same user (strictly earlier rows; ordered by
``(ts, event_id)`` so equal timestamps break deterministically)
within a 7-day lookback; outside the window or with no touch at all
the purchase is ``direct``.

Plan shape: ONE user-partitioned window computes the running
last-touch timestamp (``MAX(CASE marketing THEN ts END)`` over the
unbounded-preceding frame — NULLs ignored on both engines), then the
purchase slice joins back on ``(user_id, ts)`` to recover the touch's
identity, with a ``MAX(struct)``-free dedup (max event_id per
purchase) guarding the theoretical equal-timestamp collision.  Two
corpus shuffles (the user window + the touch-recovery join); the
rollup rides the join partitioning.  At 100 TB this is the same
sessionize-shaped shuffle every event pipeline already pays —
per-user data, never all-pairs.

Determinism: lag is exact microsecond bigint arithmetic
(``unix_micros``/``epoch_us``); no float enters any verdict; the raw
``value`` column passes through unaggregated.

Reference lifecycle note: the reference ETL (etl_process.py:1-235)
has no event surface; attribution is north-star analytics machinery
over the driver's events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

LOOKBACK_DAYS = 7
_MKT = "('click', 'view')"


@register(
    "events_attribution_last_touch",
    oracle=f"""
    WITH touched AS (
      SELECT event_id, user_id, ts, event_type, value,
             MAX(CASE WHEN event_type IN {_MKT} THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_mkt_ts
      FROM events
    ),
    purchases AS (
      SELECT event_id, user_id, ts, value, last_mkt_ts
      FROM touched WHERE event_type = 'purchase'
    ),
    recovered AS (
      SELECT p.event_id, p.user_id, p.ts, p.value, p.last_mkt_ts,
             MAX(m.event_id) AS touch_event_id
      FROM purchases p
      LEFT JOIN events m
        ON m.user_id = p.user_id AND m.ts = p.last_mkt_ts
       AND m.event_type IN {_MKT}
       AND p.last_mkt_ts >= p.ts - INTERVAL {LOOKBACK_DAYS} DAY
      GROUP BY p.event_id, p.user_id, p.ts, p.value, p.last_mkt_ts
    )
    SELECT r.event_id, r.user_id, r.value,
           COALESCE(m2.event_type, 'direct') AS attributed_type,
           r.touch_event_id,
           CASE WHEN r.touch_event_id IS NOT NULL
                THEN epoch_us(r.ts) - epoch_us(r.last_mkt_ts)
           END AS lag_us
    FROM recovered r
    LEFT JOIN events m2 ON m2.event_id = r.touch_event_id
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = ev.withColumn(
        "last_mkt_ts",
        F.max(
            F.when(F.col("event_type").isin("click", "view"), F.col("ts"))
        ).over(w),
    )
    purchases = touched.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value", "last_mkt_ts"
    )
    mkt = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("m_user"),
        F.col("ts").alias("m_ts"),
        F.col("event_id").alias("m_event_id"),
        F.col("event_type").alias("m_type"),
    )
    recovered = (
        purchases.join(
            mkt,
            (F.col("m_user") == F.col("user_id"))
            & (F.col("m_ts") == F.col("last_mkt_ts"))
            & (
                F.col("last_mkt_ts")
                >= F.col("ts") - F.expr(f"INTERVAL {LOOKBACK_DAYS} DAY")
            ),
            "left",
        )
        .groupBy("event_id", "user_id", "ts", "value", "last_mkt_ts")
        .agg(F.max("m_event_id").alias("touch_event_id"))
    )
    types = ev.select(
        F.col("event_id").alias("touch_event_id"),
        F.col("event_type").alias("t_type"),
    )
    return recovered.join(types, "touch_event_id", "left").select(
        "event_id",
        "user_id",
        "value",
        F.coalesce("t_type", F.lit("direct")).alias("attributed_type"),
        "touch_event_id",
        F.when(
            F.col("touch_event_id").isNotNull(),
            F.expr("unix_micros(ts) - unix_micros(last_mkt_ts)"),
        ).alias("lag_us"),
    )
