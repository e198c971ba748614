"""Time-series operators over the events table: tumbling/sliding
windows, sessionization, daily rollups. The batch forms here share
semantics with the Structured Streaming forms in ``streaming/`` (same
window() calls), so results are comparable across both execution
modes — see ``streaming_tumbling_agg`` for the streaming twin run
through an actual streaming query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import fixed, msum, sql_fixed, sql_msum
from ..registry import register
from ..sources import load_table


@register(
    "ts_tumbling_agg",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n, {sql_msum("value", "total_value")}
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), msum("value", "total_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )


@register(
    "ts_sliding_agg",
    oracle=f"""
    SELECT bucket, COUNT(*) AS n, {sql_msum("value", "total_value")}
    FROM (
      SELECT CAST(to_timestamp(CAST(floor(epoch(ts)/1800) AS BIGINT)*1800) AS TIMESTAMP) AS bucket, value
      FROM events
      UNION ALL
      SELECT CAST(to_timestamp((CAST(floor(epoch(ts)/1800) AS BIGINT)-1)*1800) AS TIMESTAMP) AS bucket, value
      FROM events
    )
    GROUP BY bucket
    """,
)
def ts_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 1-hour windows sliding every 30 min: each event lands in exactly
    # two windows; window.start identifies the window.
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), msum("value", "total_value"))
        .select(F.col("w.start").alias("bucket"), "n", "total_value")
    )


@register(
    "ts_sessionize",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, {sql_msum("value", "session_value")}
    FROM sess GROUP BY user_id, session_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch sessionization: 30-min inactivity gap. One shuffle on
    # user_id; both window passes reuse the same partitioning (no
    # second exchange). Streaming twin: session_window() in
    # streaming/events_stream.py.
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > 1800),
        1,
    ).otherwise(0)
    sess = e.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(cum)
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        msum("value", "session_value"),
    )


@register(
    "ts_daily_type_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           {sql_msum("CASE WHEN event_type = 'purchase' THEN value END", "purchase_value")},
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS errors,
           COUNT(DISTINCT user_id) AS active_users
    FROM events GROUP BY 1
    """,
)
def ts_daily_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        (F.sum(fixed(purchase_val)).cast("double") / 10000).alias("purchase_value"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("errors"),
        F.countDistinct("user_id").alias("active_users"),
    )
