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


# Resample + gap-fill: the hypertable-style "one row per (entity,
# bucket) even when no data arrived" operator — per-user daily grid
# between the user's first and last activity, missing days carry
# n_events = 0 and a forward-filled value. The grid is generated
# plan-side (sequence + explode = DuckDB generate_series + unnest) and
# the fill is last_value(IGNORE NULLS) over an unbounded-preceding
# frame — both engines compute the identical frame because the daily
# sums are decimal-exact (msum) and the (user, day) order is total.
# At 100 TB: the grid scales with entities x buckets (not events),
# the window partitions by entity — no single-partition sort.
@register(
    "ts_resample_ffill",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             COUNT(*) AS n_events,
             {sql_msum("value", "day_value")}
      FROM events WHERE user_id < 30
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM spans
    )
    SELECT g.user_id, g.day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           d.n_events IS NULL AS is_gap,
           last_value(d.day_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
    FROM grid g LEFT JOIN daily d USING (user_id, day)
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"), msum("value", "day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
        F.last("day_value", ignorenulls=True).over(w).alias("ffill_value"),
    )
